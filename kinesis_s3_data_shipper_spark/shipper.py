"""The shipper job as a thin CLI — the reference's operational surface
(kinesis-to-humio.py:249-295) re-expressed over this engine.

Flag parity (reference → here):
- ``--bucket``/``--prefix`` (K:256-258)   → ``--input`` dir/glob +
  ``--prefix`` filter (an s3a:// URI works unchanged on a cluster with
  the S3A connector; the listing prefix pushdown is the S3A file index)
- ``--humio-batch`` (K:265)               → ``--batch-size``
- ``--track`` (SQLite seen-files, K:48-68) → ``--processed-dir``
  (batch anti-join) or the streaming checkpoint (``--stream``)
- ``--tmpdir`` (K:269)                    → not needed (no staging;
  binaryFile streams content)
- ``--debug`` (K:268)                     → ``--debug``

Secrets passed via ``--token`` are redacted when the config is echoed,
like the reference's pp_args (K:236-245).
"""

from __future__ import annotations

import argparse
import json
import sys

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .ingest.pipeline import build_payloads, flatten_events, parse_blocks
from .ingest.splitter import split_blocks
from .ingest.tracking import filter_unprocessed, record_processed
from .session import get_session

REDACT_KEYS = ("token", "secret", "password", "key")


def redacted(args: dict) -> dict:
    """Echo-safe config: mask any value whose flag name looks secret
    (reference parity: pp_args masks aws_access_secret / humio-token)."""
    out = {}
    for k, v in args.items():
        out[k] = "****" if any(s in k.lower() for s in REDACT_KEYS) and v else v
    return out


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="python -m kinesis_s3_data_shipper_spark",
        description="Run the shipper ingest pipeline on Spark.")
    p.add_argument("--input", required=True,
                   help="landing directory / glob of raw shipper files "
                        "(local path or s3a:// URI)")
    p.add_argument("--output", required=True,
                   help="directory for parsed-event parquet output")
    p.add_argument("--prefix", default=None,
                   help="only process files whose path starts with this")
    p.add_argument("--batch-size", type=int, default=5000,
                   help="max events per assembled payload (default 5000, "
                        "the reference's --humio-batch default)")
    p.add_argument("--processed-dir", default=None,
                   help="batch mode: parquet dir of already-processed file "
                        "keys; matching inputs are skipped and new keys "
                        "recorded (the reference's SQLite tracking)")
    p.add_argument("--stream", action="store_true",
                   help="run as a Structured Streaming job (checkpoint "
                        "replaces --processed-dir)")
    p.add_argument("--checkpoint", default=None,
                   help="checkpoint dir (required with --stream)")
    p.add_argument("--token", default=None,
                   help="ingest-API token (redacted in logs; unused by "
                        "the parquet sink)")
    p.add_argument("--payloads", action="store_true",
                   help="also write assembled payload JSON (tags+events "
                        "batches) under <output>_payloads")
    p.add_argument("--debug", action="store_true")
    return p


def run_batch(spark, ns) -> int:
    raw = (spark.read.format("binaryFile")
           .option("recursiveFileLookup", "true")
           .load(ns.input)
           .select("path", "content"))
    if ns.prefix:
        raw = raw.filter(F.col("path").startswith(ns.prefix))
    if ns.processed_dir:
        try:
            processed = spark.read.parquet(ns.processed_dir)
            raw = filter_unprocessed(raw, processed, key_col="path")
        except Exception:
            pass  # first run: nothing recorded yet
    # Empty-input short-circuit (reference parity, K:284-286).
    paths = raw.select("path")
    if paths.limit(1).count() == 0:
        print("no unprocessed input files matched; nothing to do",
              file=sys.stderr)
        return 0

    # Observability (reference logs block/event counts, K:114-117, 133,
    # 170): df.observe attaches the metric to the job itself — no
    # second scan, readable after the action.
    from pyspark.sql import Observation
    obs = Observation("shipper")
    events = (flatten_events(parse_blocks(split_blocks(raw)))
              .observe(obs, F.count(F.lit(1)).alias("n_events"),
                       F.approx_count_distinct("file").alias("n_files")))
    events.write.mode("append").parquet(ns.output)
    print(json.dumps({"metrics": obs.get}), file=sys.stderr)
    if ns.payloads:
        build_payloads(events, ns.batch_size).write.mode("append").parquet(
            ns.output + "_payloads")
    if ns.processed_dir:
        record_processed(ns.processed_dir, paths, key_col="path")
    return 0


def run_stream(spark, ns) -> int:
    from .streaming.jobs import streaming_ingest
    if not ns.checkpoint:
        print("--stream requires --checkpoint", file=sys.stderr)
        return 2
    streaming_ingest(spark, ns.input, checkpoint=ns.checkpoint,
                     out_dir=ns.output)
    return 0


def main(argv: list[str] | None = None) -> int:
    ns = build_parser().parse_args(argv)
    print(json.dumps(redacted(vars(ns))), file=sys.stderr)
    spark = get_session("ksds-shipper")
    if ns.debug:
        spark.sparkContext.setLogLevel("INFO")
    return run_stream(spark, ns) if ns.stream else run_batch(spark, ns)


if __name__ == "__main__":
    raise SystemExit(main())
