"""The declarative half of the ingest pipeline: parse → flatten →
enrich → tag → batch-assemble. Everything here is built-in DataFrame
ops (from_json / explode / struct / collect_list / to_json), so
Catalyst prunes the JSON parse to the fields used and the whole chain
stays narrow — zero shuffles until batch assembly, which groups only
within (file, block), preserving the reference's per-block payload
granularity (kinesis-to-humio.py:136-164).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.strings import stream_prefix
from .fixture import BLOCK_SCHEMA_DDL

#: PERMISSIVE parse with quarantine: malformed blocks (e.g. the marker-
#: inside-message mis-split hazard) land in _corrupt instead of killing
#: the job — strictly better than the reference, which raises at K:131.
PARSE_SCHEMA = BLOCK_SCHEMA_DDL + ", _corrupt STRING"


def parse_blocks(split_df: DataFrame) -> DataFrame:
    """Block JSON strings → typed columns (+ _corrupt quarantine)."""
    parsed = split_df.withColumn(
        "msg", F.from_json(
            "block", PARSE_SCHEMA,
            {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": "_corrupt"}))
    return parsed.select(
        "path", "block_index", "msg.*")


def flatten_events(parsed: DataFrame) -> DataFrame:
    """Valid blocks → one row per log event, enriched like the
    reference (K:136-148): provenance `file`, copied-down `logStream`,
    tags `logStreamPrefix` + `logGroup`, epoch-ms → TimestampType."""
    valid = parsed.filter(F.col("_corrupt").isNull()
                          & F.col("logEvents").isNotNull())
    return (
        valid.select(
            "path", "block_index", "logGroup", "logStream", "owner",
            F.explode("logEvents").alias("event"))
        .select(
            F.col("path").alias("file"),
            "block_index",
            F.col("logGroup").alias("logGroup"),
            F.col("logStream").alias("logStream"),
            stream_prefix("logStream").alias("logStreamPrefix"),
            F.col("event.id").alias("event_id"),
            F.col("event.timestamp").alias("timestamp_ms"),
            F.timestamp_millis(F.col("event.timestamp")).alias("ts"),
            F.col("event.message").alias("message"))
    )


def build_payloads(events: DataFrame, batch_size: int = 5000) -> DataFrame:
    """Assemble Humio-structured-API payloads declaratively.

    Events are chunked to ≤batch_size within each (file, block) — the
    reference's flush-every-N semantics (K:150, default 5000 at K:265)
    — then each chunk becomes one JSON payload row:
    {tags: {...}, events: [{timestamp, attributes}, ...]}.
    """
    from pyspark.sql import Window as W

    w = W.partitionBy("file", "block_index").orderBy("event_id")
    chunked = events.withColumn(
        "batch_id", ((F.row_number().over(w) - F.lit(1)) / batch_size)
        .cast("int"))
    return (
        chunked.groupBy("file", "block_index", "batch_id",
                        "logStreamPrefix", "logGroup")
        .agg(F.sort_array(F.collect_list(F.struct(
            F.col("timestamp_ms").alias("timestamp"),
            F.struct(
                F.col("event_id").alias("id"),
                F.col("message").alias("message"),
                F.col("file").alias("file"),
                F.col("logStream").alias("logStream"),
            ).alias("attributes")))).alias("events"))
        .select(
            "file", "block_index", "batch_id",
            F.to_json(F.struct(
                F.struct(
                    F.col("logStreamPrefix").alias("logStreamPrefix"),
                    F.col("logGroup").alias("logGroup")).alias("tags"),
                F.col("events"))).alias("payload"),
            F.size("events").alias("n_events"))
    )
