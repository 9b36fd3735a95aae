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
    err = capsys.readouterr().err
    # Token never echoed in clear.
    assert "hush" not in err
    # Per-file zero-block warning (reference parity, K:114-115): the
    # fixture's empty.dat has no DATA_MESSAGE blocks.
    assert "warning: 0 message blocks in" in err
    assert "empty.dat" in err

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


def test_batch_post_http_e2e(spark, landing, tmp_path):
    """--payloads --post-url against a real local HTTP server: executor
    workers POST through the pooled transport; the server (driver
    process) must see every payload with auth + idempotency headers."""
    import http.server
    import threading

    received = []

    class Handler(http.server.BaseHTTPRequestHandler):
        def do_POST(self):
            body = self.rfile.read(int(self.headers["Content-Length"]))
            received.append((self.path, dict(self.headers), body))
            self.send_response(200)
            self.end_headers()

        def log_message(self, *args):
            pass

    srv = http.server.ThreadingHTTPServer(("127.0.0.1", 0), Handler)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        url = f"http://127.0.0.1:{srv.server_address[1]}"
        out = str(tmp_path / "ev")
        assert main(["--input", landing, "--output", out, "--payloads",
                     "--post-url", url, "--token", "tkn",
                     "--batch-size", "40"]) == 0
        n_payloads = spark.read.parquet(out + "_payloads").count()
        assert len(received) == n_payloads > 0
        path, headers, body = received[0]
        assert path == "/api/v1/ingest/humio-structured"
        assert headers["Authorization"] == "Bearer tkn"
        assert headers["X-Idempotency-Key"]
        assert set(json.loads(body)) == {"tags", "events"}
    finally:
        srv.shutdown()


def test_processed_dir_read_errors_are_fatal(spark, landing, tmp_path):
    """A corrupt processed-dir must FAIL the run, not silently disable
    tracking (which would re-append every previously-shipped file)."""
    processed = tmp_path / "processed"
    processed.mkdir()
    (processed / "part-00000.parquet").write_bytes(b"this is not parquet")
    with pytest.raises(Exception):
        main(["--input", landing, "--output", str(tmp_path / "o"),
              "--processed-dir", str(processed)])


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


def test_batch_declarative_matches_imperative(spark, landing, tmp_path,
                                              capsys):
    """--declarative (custom DataSource scan) must produce the exact
    event set of the default binaryFile+splitter path, and keep the
    tracking/zero-block-warning behavior."""
    out_imp = str(tmp_path / "ev_imp")
    out_dec = str(tmp_path / "ev_dec")
    processed = str(tmp_path / "processed_dec")

    assert main(["--input", landing, "--output", out_imp]) == 0
    assert main(["--input", landing, "--output", out_dec, "--declarative",
                 "--processed-dir", processed]) == 0
    err = capsys.readouterr().err
    assert "warning: 0 message blocks in" in err and "empty.dat" in err

    key = ["file", "block_index", "event_id"]

    def canon(path):
        return {tuple(os.path.basename(r.file).split("__")[-1:] +
                      [r.block_index, r.event_id])
                for r in spark.read.parquet(path).select(*key).collect()}

    got_imp, got_dec = canon(out_imp), canon(out_dec)
    assert got_dec == got_imp and len(got_dec) > 0

    # Incremental skip works on OS-path tracking keys too.
    assert main(["--input", landing, "--output", out_dec, "--declarative",
                 "--processed-dir", processed]) == 0
    assert "nothing to do" in capsys.readouterr().err
