"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-
insensitive value-hash). The real surface lives in
``kinesis_s3_data_shipper_spark.plans`` — one registered
(spark_fn, oracle_sql) pair per operator from SURVEY.md §2.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kinesis_s3_data_shipper_spark.plans import all_oracles, all_queries
from kinesis_s3_data_shipper_spark.session import ensure_runtime_confs
from kinesis_s3_data_shipper_spark.sources.tables import load_table

SF_SMOKE_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on sf0.001: event-time tumbling 1-hour window over
    the events stream table — the shipper's semantic core (epoch-millis
    event time, per-window per-type counts) in idiomatic Spark."""
    ensure_runtime_confs(spark)
    ev = load_table(spark, SF_SMOKE_DIR, "events")
    return (
        ev.withColumn("event_time", F.timestamp_micros(F.expr("ts div 1000")))
        .groupBy(F.window("event_time", "1 hour"), "event_type")
        .agg(F.count("*").alias("n"),
             F.sum(F.col("value").cast("decimal(18,6)")).cast("double")
              .alias("sum_value"))
        .select(F.unix_millis(F.col("window.start")).alias("hour_ms"),
                "event_type", "n", "sum_value")
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return all_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent ANSI SQL per query (omitted for the non-SQL-
    expressible ops: the ingest splitter pipeline)."""
    return all_oracles()
