"""Streaming jobs: the ingest pipeline and event-time analytics as
Structured Streaming queries.

The reference emulates a stream by re-running a batch program against
an S3 prefix with a hand-rolled seen-files log (SQLite, K:48-68,
210-216) and gets at-least-once with silent batch loss (SURVEY §3).
Structured Streaming's file source + checkpoint subsumes that state
machine natively: the checkpoint's seen-files log IS the reference's
`files` table, exactly-once per micro-batch epoch, `latestFirst=false`
preserving its oldest-first ordering (K:292), `maxFilesPerTrigger`
bounding a trigger the way `--humio-batch` bounded a POST.

All jobs run to completion under ``trigger(availableNow=True)`` for
tests, and identically as continuous micro-batch jobs in production.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..ingest.pipeline import flatten_events, parse_blocks
from ..ingest.splitter import split_blocks
from ..session import ensure_runtime_confs

EVENTS_DDL = ("event_id LONG, ts LONG, user_id LONG, event_type STRING,"
              " value DOUBLE, props STRING")

NS_PER_HOUR = 3_600_000_000_000


def _events_stream(spark: SparkSession, events_dir: str,
                   max_files: int | None = None) -> DataFrame:
    ensure_runtime_confs(spark)
    reader = (spark.readStream.schema(EVENTS_DDL)
              .option("latestFirst", "false"))
    if max_files:
        reader = reader.option("maxFilesPerTrigger", str(max_files))
    return reader.parquet(events_dir)


def streaming_hourly_counts(spark: SparkSession, events_dir: str, *,
                            checkpoint: str, query_name: str,
                            watermark: str = "1 hour") -> DataFrame:
    """Event-time tumbling 1-hour aggregate with a watermark; complete
    mode into an in-memory table; returns the result when drained.

    Produces exactly the batch `events_hourly` buckets: F.window on a
    micros-truncated timestamp starts at the same integer hour bounds
    as the batch query's `ts div NS_PER_HOUR` arithmetic.
    """
    events = _events_stream(spark, events_dir)
    ts = F.timestamp_micros(F.expr("ts div 1000"))
    agg = (
        events.withColumn("event_time", ts)
        .withWatermark("event_time", watermark)
        .groupBy(F.window("event_time", "1 hour"), "event_type")
        .agg(F.count("*").alias("n"),
             F.sum(F.col("value").cast("decimal(18,6)")).cast("double")
              .alias("sum_value")))
    out = agg.select(
        F.unix_millis(F.col("window.start")).alias("hour_ms"),
        "event_type", "n", "sum_value")
    query = (out.writeStream.outputMode("complete")
             .format("memory").queryName(query_name)
             .option("checkpointLocation", checkpoint)
             .trigger(availableNow=True).start())
    query.awaitTermination()
    return spark.table(query_name)


def streaming_dedup(spark: SparkSession, events_dir: str, *,
                    checkpoint: str, query_name: str,
                    watermark: str = "2 hours") -> DataFrame:
    """Streaming exact dedup on event_id within the watermark — the
    streaming twin of dedup_exact (dropDuplicatesWithinWatermark bounds
    state; RocksDB state store at scale)."""
    events = _events_stream(spark, events_dir)
    deduped = (
        events.withColumn("event_time", F.timestamp_micros(F.expr("ts div 1000")))
        .withWatermark("event_time", watermark)
        .dropDuplicatesWithinWatermark(["event_id"])
        .groupBy("event_type").agg(F.count("*").alias("n")))
    query = (deduped.writeStream.outputMode("complete")
             .format("memory").queryName(query_name)
             .option("checkpointLocation", checkpoint)
             .trigger(availableNow=True).start())
    query.awaitTermination()
    return spark.table(query_name)


def streaming_ingest(spark: SparkSession, landing_dir: str, *,
                     checkpoint: str, out_dir: str,
                     max_files_per_trigger: int = 64) -> None:
    """The reference's whole job as a streaming query: binaryFile
    landing dir → gunzip+split (foreachBatch reuses the exact batch
    operators) → parsed/enriched events appended as parquet. The
    checkpoint replaces the SQLite seen-files table (O4/O19); task
    retries + idempotent event_ids give at-least-once without the
    reference's lost-batch flaw."""
    ensure_runtime_confs(spark)
    raw = (spark.readStream.format("binaryFile")
           .option("maxFilesPerTrigger", str(max_files_per_trigger))
           .option("latestFirst", "false")
           .load(landing_dir))

    def process(batch_df: DataFrame, epoch_id: int) -> None:
        events = flatten_events(parse_blocks(split_blocks(
            batch_df.select("path", "content"))))
        (events.write.mode("append").parquet(out_dir))

    query = (raw.writeStream.foreachBatch(process)
             .option("checkpointLocation", checkpoint)
             .trigger(availableNow=True).start())
    query.awaitTermination()
