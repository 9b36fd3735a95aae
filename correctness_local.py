#!/usr/bin/env python
"""Local full-registry correctness sweep.

The external driver verifies a bounded prefix of the query registry
(the first 50 in registration order).  This script runs the SAME
spark-vs-DuckDB comparison over EVERY registered query and writes
``CORRECTNESS_LOCAL.json`` in the driver's record format, so the
out-of-window queries carry committed correctness evidence too.

Usage::

    python correctness_local.py [--sf-dir /root/testdata/sf0.01]

One SparkSession for the whole sweep (startup is ~10 s); streaming
queries run their bounded micro-batch drains inside it.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
import traceback

from pyspark.sql import SparkSession


def _default_driver_mem_gb() -> int:
    """Quarter of host MemTotal, clamped to [8, 48] GiB (r11 advice:
    the sweep needs a real heap for sf0.1's wide-row sorts, but a
    flat 48g on a small host is an OS-OOM-kill waiting to happen)."""
    try:
        with open("/proc/meminfo") as fh:
            for line in fh:
                if line.startswith("MemTotal:"):
                    host_gb = int(line.split()[1]) // (1024 * 1024)
                    break
            else:
                return 8
    except (OSError, ValueError, IndexError):
        # ValueError/IndexError: a malformed MemTotal line must fall
        # back to the floor, not crash the sweep before Spark starts
        # (r12 advice).
        return 8
    return max(8, min(48, host_gb // 4))


def resolve_out_path(out_arg: str | None, only: bool) -> str:
    """Pick the record path. A ``--only`` subset run must NEVER land on
    the full-sweep artifact by default — round 6 lost the committed
    178-query sf0.01 record to exactly that overwrite — so subsets go
    to a scratch side file unless the caller names a path explicitly.
    Pinned by tests/test_correctness_local_cli.py."""
    if out_arg is not None:
        return out_arg
    return "CORRECTNESS_ONLY.json" if only else "CORRECTNESS_LOCAL.json"


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("--out", default=None,
                    help="record path; defaults to CORRECTNESS_LOCAL.json "
                         "for a full sweep and CORRECTNESS_ONLY.json (a "
                         "scratch side file) when --only is given")
    ap.add_argument("--cpus", default="32")
    ap.add_argument("--only", default=None,
                    help="comma-separated query names: run just these "
                         "(iteration aid; results go to the side file so "
                         "the committed full-sweep artifact survives)")
    args = ap.parse_args()
    args.out = resolve_out_path(args.out, bool(args.only))

    # Confs stay PLAIN (no repo tuning — the driver-contract mirror;
    # ensure_runtime_confs must cope) except driver memory: local-mode
    # default is 1g shared by 32 concurrent tasks (~30 MB each), and
    # at sf0.1 the wide-row sort buffers of the heavier verify joins
    # OOM outright at that budget (r11: dedup_ngram_jaccard's
    # rep-text SMJ killed the JVM and failed the whole sweep) — a
    # budget no real deployment runs.  The DRIVER's gate executes at
    # sf0.01, where the stock 1g heap still passes all 263 (the r11
    # sf0.01 sweep ran before this line existed).  The heap is sized
    # from HOST RAM (quarter of MemTotal, clamped to [8g, 48g] — r11
    # advice: a flat 48g default either diverges from the external
    # gate silently or gets the JVM OS-OOM-killed on small hosts) and
    # the EFFECTIVE value is recorded in the artifact's _meta so the
    # protocol divergence from the stock-1g external gate is
    # machine-visible, not comment-only.
    driver_mem = os.environ.get("SPARK_GRAFT_DRIVER_MEM",
                                f"{_default_driver_mem_gb()}g")
    spark = (SparkSession.builder.master(f"local[{args.cpus}]")
             .config("spark.sql.shuffle.partitions", args.cpus)
             .config("spark.driver.memory", driver_mem)
             .config("spark.ui.enabled", "false")
             .appName("correctness-local").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    from kinesis_s3_data_shipper_spark.plans import REGISTRY, all_queries
    from tests.oracle_harness import duckdb_connection, run_pair

    all_queries()
    # Session ramp (r12, the bench.py warmup rationale): absorb the
    # one-time costs — JVM/codegen spin-up and, separately, the
    # streaming machinery (Python worker pool, state-store init,
    # micro-batch scheduler) — BEFORE the timed loop, so they aren't
    # charged to whichever queries sit first in the verify window
    # (streaming_hourly was carrying ~6 s of startup as its own cost).
    import shutil
    import tempfile
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    warm = tempfile.mkdtemp(prefix="ksds_sweep_warm_")
    try:
        spark.range(10).selectExpr("id", "id AS v").write.mode(
            "overwrite").parquet(os.path.join(warm, "in"))
        (spark.readStream.schema("id long, v long")
         .parquet(os.path.join(warm, "in"))
         .groupBy("id").count()
         .writeStream.outputMode("complete").format("memory")
         .queryName("sweep_warmup_drain")
         .option("checkpointLocation", os.path.join(warm, "ckpt"))
         .trigger(availableNow=True).start().awaitTermination())
    finally:
        shutil.rmtree(warm, ignore_errors=True)
    only = set(args.only.split(",")) if args.only else None
    if only:
        unknown = only - set(REGISTRY)
        if unknown:
            print(f"unknown queries: {sorted(unknown)}", file=sys.stderr)
            return 2
    t0 = time.time()
    # Steal stamp around the timed loop (the bench.py r11 health
    # stamp, extended to the sweep in r13 after a noise episode
    # inflated ~18 unrelated queries' single-shot timings by +1-5 s
    # each and the artifact carried no evidence to attribute it —
    # min-of-3 re-measurement showed the code unchanged).
    from bench import read_steal_ticks
    steal0, ticks0 = read_steal_ticks()
    out: dict[str, dict] = {}
    n_pass = n_fail = 0
    # One read-only connection for the whole sweep: re-registering 10
    # views per query is waste, and the oracles are plain SELECTs.
    shared_con = duckdb_connection(args.sf_dir)
    for name, spec in REGISTRY.items():
        if only and name not in only:
            continue
        rec: dict = {"rows_match": None, "schema_match": None,
                     "hash_match": None, "spark_rows": None,
                     "oracle_rows": None, "err": None}
        try:
            # COLD catalog cache per query (r12): an earlier query's
            # persisted intermediate otherwise SUBSTITUTES into a
            # later query's plan (the audit-gate lesson), which both
            # disables AQE inside the substituted subtree and makes
            # every timing depend on REGISTRY ORDER — the r12 window
            # rotation alone moved dedup_ngram_jaccard_groups 77 s ->
            # 160 s and ann_lsh_multiprobe 0.7 s -> 22.5 s with zero
            # code change (a fresh session runs them in 19 s / 2 s).
            # Each query's own internal persists (member maps,
            # signatures) still build and reuse normally WITHIN its
            # execution; localCheckpoint blocks are untouched.
            spark.catalog.clearCache()
            # spark_sec: build + full result fetch of the Spark side —
            # the registry-WIDE timing record (r09 verdict ask #3: the
            # 63-query headline bench can't see a regression in the
            # other ~200 queries; this sweep runs them all anyway, so
            # record per-query wall for round-over-round comparison).
            # Single-shot, warm session — noisier than bench.py's
            # min-of-4, so compare trends, not single deltas.
            # r11: counts/timings come FROM run_pair's one execution —
            # the sweep previously re-executed every Spark plan and
            # every oracle a second time just for these fields, which
            # doubled the sf0.1 sweep wall (and ran each streaming
            # twin's drain twice).  spark_sec therefore now measures
            # build+toPandas instead of build+count: a one-time
            # protocol discontinuity vs r10 records, noted here so
            # cross-round trend readers don't mistake it for a change.
            # compute_sec (r11 verdict ask #3): build + persist +
            # full-value aggregate — the FETCH-FREE scale signal, so
            # row-heavy outputs stop reading ~10x across sf steps just
            # because toPandas ships 10x the rows.  The hash compare's
            # toPandas then reads the persisted partitions: one plan
            # execution total, same cost as the r11 protocol.
            if spec.oracle is None:
                ts = time.perf_counter()
                rec["spark_rows"] = spec.spark(spark, args.sf_dir).count()
                rec["spark_sec"] = round(time.perf_counter() - ts, 3)
                # count() ships no rows: already fetch-free.
                rec["compute_sec"] = rec["spark_sec"]
                rec["rows_only"] = True
            else:
                stats = run_pair(spark, args.sf_dir, name, spec.spark,
                                 spec.oracle, con=shared_con,
                                 compute_timing=True)
                rec["spark_rows"] = stats["spark_rows"]
                rec["spark_sec"] = round(stats["spark_sec"], 3)
                rec["compute_sec"] = round(stats["compute_sec"], 3)
                rec["oracle_rows"] = stats["oracle_rows"]
                rec["oracle_sec"] = round(stats["oracle_sec"], 3)
                rec.update(rows_match=True, schema_match=True,
                           hash_match=True)
            n_pass += 1
        except Exception:
            rec["err"] = traceback.format_exc(limit=3).splitlines()[-1][:400]
            rec.update(rows_match=False, schema_match=False,
                       hash_match=False)
            n_fail += 1
        out[name] = rec
        status = "ok" if rec["err"] is None else "FAIL"
        print(f"  {name}: {status}", file=sys.stderr)

    meta = {"_meta": {"sf_dir": args.sf_dir, "n_queries": len(out),
                      "n_pass": n_pass, "n_fail": n_fail,
                      "wall_sec": round(time.time() - t0, 1),
                      "driver_memory": driver_mem,
                      "timing_protocol": (
                          "session ramp (incl. one streaming drain) "
                          "before the loop; catalog cache cleared per "
                          "query (order-independent plans); spark_sec "
                          "= build + persist + full-value agg + "
                          "cached toPandas (single execution); "
                          "compute_sec = the fetch-free prefix of "
                          "that — the cross-sf scale signal")}}
    steal1, ticks1 = read_steal_ticks()
    if steal0 is not None and steal1 is not None and ticks1 > ticks0:
        meta["_meta"]["steal"] = {
            "ticks": steal1 - steal0,
            "pct_of_host": round(100.0 * (steal1 - steal0)
                                 / (ticks1 - ticks0), 3)}
    with open(args.out, "w") as f:
        json.dump({**meta, **out}, f, indent=1, sort_keys=False)
    print(json.dumps(meta))
    spark.stop()
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
