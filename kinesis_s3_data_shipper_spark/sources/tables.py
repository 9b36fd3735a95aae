"""Parquet table loaders for the driver's TPC-H-ish + LLM-pipeline tables.

The tables (see /root/repo/TESTDATA.md) live as one parquet file each
under an sf directory. ``events.ts`` is parquet TIMESTAMP(NANOS) —
loaded as epoch-nanos LongType via the ``nanosAsLong`` conf (applied
defensively here), because Spark has no nanosecond TimestampType.

At 100 TB these would be multi-file partitioned datasets; everything
downstream reads through ``spark.read.parquet`` so partition pruning,
predicate pushdown, and column pruning apply unchanged.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from ..session import ensure_runtime_confs

TABLE_NAMES: tuple[str, ...] = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one named table from an sf directory."""
    if name not in TABLE_NAMES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLE_NAMES}")
    ensure_runtime_confs(spark)
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def register_views(spark: SparkSession, sf_dir: str,
                   names: tuple[str, ...] = TABLE_NAMES) -> None:
    """Register each table as a temp view (for the SQL-API queries)."""
    for name in names:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
