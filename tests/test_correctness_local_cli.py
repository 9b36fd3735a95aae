"""Pin the correctness_local.py CLI contract.

Round 6 lost the committed full sf0.01 sweep record because a
``--only`` gating run wrote its one-query subset over
``CORRECTNESS_LOCAL.json``.  The fix routes subset runs to a scratch
side file unless the caller names a path explicitly; this test pins
that routing (the same way tests/test_bench_output.py pins the bench
stdout format).
"""

import correctness_local


def test_full_sweep_default_path():
    assert (correctness_local.resolve_out_path(None, only=False)
            == "CORRECTNESS_LOCAL.json")


def test_only_run_never_touches_full_sweep_artifact_by_default():
    out = correctness_local.resolve_out_path(None, only=True)
    assert out != "CORRECTNESS_LOCAL.json"
    assert out == "CORRECTNESS_ONLY.json"


def test_explicit_out_is_respected():
    assert (correctness_local.resolve_out_path("x.json", only=True)
            == "x.json")
    assert (correctness_local.resolve_out_path("y.json", only=False)
            == "y.json")
