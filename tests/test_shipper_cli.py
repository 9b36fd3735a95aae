"""End-to-end test of the shipper CLI (the reference's operational
surface): write raw fixture files to a landing dir, run batch mode with
tracking, verify parsed events + incremental skip on re-run, then the
streaming variant with a checkpoint.
"""

from __future__ import annotations

import json
import os

import pytest

from kinesis_s3_data_shipper_spark.ingest.fixture import fixture_files
from kinesis_s3_data_shipper_spark.shipper import main, redacted


@pytest.fixture()
def landing(tmp_path):
    d = tmp_path / "landing"
    d.mkdir()
    for key, blob in fixture_files():
        path = d / key.replace("/", "__")
        path.write_bytes(blob)
    return str(d)


def test_redaction():
    got = redacted({"token": "s3cret", "input": "/x", "api_key": "k",
                    "empty_token": None})
    assert got == {"token": "****", "input": "/x", "api_key": "****",
                   "empty_token": None}


def test_batch_run_and_incremental_skip(spark, landing, tmp_path, capsys):
    out = str(tmp_path / "events_out")
    processed = str(tmp_path / "processed")

    assert main(["--input", landing, "--output", out,
                 "--processed-dir", processed, "--token", "hush"]) == 0
    n_first = spark.read.parquet(out).count()
    assert n_first > 0
    # Token never echoed in clear.
    assert "hush" not in capsys.readouterr().err

    # Re-run: every file already tracked → short-circuit, no new rows.
    assert main(["--input", landing, "--output", out,
                 "--processed-dir", processed]) == 0
    assert spark.read.parquet(out).count() == n_first
    err = capsys.readouterr().err
    assert "nothing to do" in err


def test_batch_payloads_written(spark, landing, tmp_path):
    out = str(tmp_path / "ev")
    assert main(["--input", landing, "--output", out, "--payloads",
                 "--batch-size", "40"]) == 0
    payloads = spark.read.parquet(out + "_payloads")
    rows = payloads.collect()
    assert all(r.n_events <= 40 for r in rows)
    assert sum(r.n_events for r in rows) == spark.read.parquet(out).count()
    body = json.loads(rows[0].payload)
    assert set(body) == {"tags", "events"}


def test_stream_requires_checkpoint(landing, tmp_path):
    assert main(["--input", landing, "--output", str(tmp_path / "o"),
                 "--stream"]) == 2


def test_stream_run(spark, landing, tmp_path):
    out = str(tmp_path / "stream_out")
    ckpt = str(tmp_path / "ckpt")
    assert main(["--input", landing, "--output", out,
                 "--stream", "--checkpoint", ckpt]) == 0
    n = spark.read.parquet(out).count()
    assert n > 0
    # Re-run with the same checkpoint: no files re-processed.
    assert main(["--input", landing, "--output", out,
                 "--stream", "--checkpoint", ckpt]) == 0
    assert spark.read.parquet(out).count() == n
