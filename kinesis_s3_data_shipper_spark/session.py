"""SparkSession construction and runtime-conf hygiene.

Two entry points:

- :func:`get_session` — build a tuned local session (tests, bench).
- :func:`ensure_runtime_confs` — idempotently apply the runtime-settable
  confs this engine needs to a session *someone else* built (the
  correctness driver passes us its own session).

Scale posture: the static confs below are sized for ``local[N]`` but the
same knobs are the ones that matter on a 1000-executor cluster — AQE for
runtime re-planning / skew-join splitting, shuffle partitions ~ cores,
Arrow for the (rare) pandas-UDF path.
"""

from __future__ import annotations

import atexit
import os
import shutil
import tempfile

from pyspark.sql import SparkSession

#: Staging dirs created by :func:`staging_dir`, reaped at interpreter
#: exit.  Module-level so every plan module shares one registration.
_STAGING_DIRS: list[str] = []


def _reap_staging() -> None:
    for d in _STAGING_DIRS:
        shutil.rmtree(d, ignore_errors=True)


atexit.register(_reap_staging)


def staging_dir(prefix: str) -> str:
    """``tempfile.mkdtemp`` with process-exit cleanup.

    Plans that write intermediate files (bucketed table versions,
    compaction targets, streaming checkpoints, BM25 query staging) use
    a fresh mkdtemp per invocation so concurrent sessions never share
    staging — but a returned DataFrame may lazily read the staged
    files, so the dir cannot be removed inside the plan call.  The
    atexit reaper bounds the leak at process lifetime instead of
    leaving it solely to OS tmp reaping (r08 advice: a long sweep
    invoking warehouse_time_travel repeatedly accumulated version
    trees in /tmp for the machine lifetime)."""
    d = tempfile.mkdtemp(prefix=prefix)
    _STAGING_DIRS.append(d)
    return d

#: Confs that are runtime-settable (spark.sql.*) and required for
#: correctness on the driver's tables. Applied defensively by every
#: query entry point, because the driver owns the session it hands us.
RUNTIME_CONFS: dict[str, str] = {
    # The driver's events table stores TIMESTAMP(NANOS) parquet, which
    # Spark cannot map to TimestampType; read as epoch-nanos LongType.
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    # DuckDB timestamps are UTC-naive; pin the session so timestamp ↔
    # string conversions agree with the oracle.
    "spark.sql.session.timeZone": "UTC",
    # Arrow transfer for pandas UDFs / toPandas.
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # AQE: runtime partition coalescing + skew-join handling.
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    # Streaming state (dedup keys, session windows) in RocksDB: state
    # size bounded by local disk instead of executor heap — the only
    # viable store when watermark-retained state reaches 100 TB-scale
    # cardinalities. No-op for batch queries.
    "spark.sql.streaming.stateStore.providerClass":
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider",
}


def ensure_runtime_confs(spark: SparkSession) -> SparkSession:
    """Apply :data:`RUNTIME_CONFS` to an existing session (idempotent)."""
    for key, value in RUNTIME_CONFS.items():
        try:
            if spark.conf.get(key, None) != value:
                spark.conf.set(key, value)
        except Exception:
            # A conf may be non-settable in exotic deployments; queries
            # that depend on it will raise a clearer error themselves.
            pass
    return spark


def default_parallelism() -> int:
    """Worker-thread count: $SPARK_GRAFT_CPUS, else the machine's CPUs."""
    env = os.environ.get("SPARK_GRAFT_CPUS")
    if env and env.isdigit() and int(env) > 0:
        return int(env)
    return os.cpu_count() or 4


def get_session(app_name: str = "kinesis_s3_data_shipper_spark", *,
                cpus: int | None = None,
                extra_confs: dict[str, str] | None = None) -> SparkSession:
    """Build (or fetch) a tuned local SparkSession."""
    n = cpus or default_parallelism()
    builder = (
        SparkSession.builder.master(f"local[{n}]")
        .appName(app_name)
        # Shuffle partitions ≈ cores for local mode; on a real cluster
        # AQE coalesces from a higher initial number instead.
        .config("spark.sql.shuffle.partitions", str(n))
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # Generated-class cache (static conf, default 100 entries): the
        # vector queries carry wide codegen'd expressions (unrolled
        # 64-dim dots, 512-term LSH sign folds) whose janino compiles
        # cost seconds. A mixed workload of ~40 queries × several
        # stages overflows 100 entries, and every eviction re-pays the
        # compile — measured 2× on the whole bench (67.8s → 34.1s at
        # sf0.1). Any long-lived session serving many distinct queries
        # wants this raised; memory cost is just class metadata.
        .config("spark.sql.codegen.cache.maxEntries", "10000")
    )
    for key, value in RUNTIME_CONFS.items():
        builder = builder.config(key, value)
    for key, value in (extra_confs or {}).items():
        builder = builder.config(key, value)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return ensure_runtime_confs(spark)
