"""Ingest-pipeline plans.

`ingest_pipeline` runs the full reference pipeline (recursive gunzip →
marker split → from_json → explode → enrich) on the deterministic
fixture matrix — rows-only check (DuckDB can't oracle the splitter;
the pytest round-trip suite is its oracle instead).

`tag_prefix_derivation` isolates the reference's one string derivation
(logStreamPrefix = first two '/'-segments, K:137) on relational data
so it IS oracle-checkable, edge cases included.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions.strings import stream_prefix, sql_stream_prefix
from ..ingest.fixture import fixture_files
from ..ingest.pipeline import flatten_events, parse_blocks
from ..ingest.splitter import split_blocks
from ..session import ensure_runtime_confs
from ..sources.tables import load_table
from .base import register

_BINARY_SCHEMA = T.StructType([
    T.StructField("path", T.StringType(), False),
    T.StructField("content", T.BinaryType(), False),
])


def raw_fixture_df(spark: SparkSession) -> DataFrame:
    """The fixture matrix as (path, content) binary rows — the same
    shape ``spark.read.format('binaryFile')`` yields from S3.

    Coalesced to 8 partitions: the matrix is ~75 tiny files, and each
    mapInPandas partition pays a Python-worker startup — 32 near-empty
    partitions is pure overhead. (With real S3 input the file count
    itself sets the parallelism; this only tunes the fixture.)"""
    ensure_runtime_confs(spark)
    return (spark.createDataFrame(fixture_files(), schema=_BINARY_SCHEMA)
            .coalesce(8))


@register("ingest_pipeline", oracle=None,
          doc="Full reference pipeline on the fixture matrix: recursive "
              "gunzip (O7-O8) → concatenated-DATA_MESSAGE split (O10) → "
              "from_json with corrupt-record quarantine (O11) → explode "
              "(O12) → enrichment + tags (O13-O15). Deterministic rows; "
              "verified by the pytest round-trip suite.")
def ingest_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    raw = raw_fixture_df(spark)
    events = flatten_events(parse_blocks(split_blocks(raw)))
    return events.select(
        "file", "block_index", "logGroup", "logStream", "logStreamPrefix",
        "event_id", "timestamp_ms", "message")


@register("tag_prefix_derivation", oracle=f"""
SELECT o_orderkey,
       o_orderstatus || '/' || o_orderpriority || '/'
         || CAST(o_orderkey AS VARCHAR) AS synth_stream,
       {sql_stream_prefix("o_orderstatus || '/' || o_orderpriority || '/' || CAST(o_orderkey AS VARCHAR)")}
         AS stream_prefix
FROM orders
""", doc="The reference's logStreamPrefix derivation (first two '/'-"
         "segments, K:137) applied to synthesized paths — oracle-checked "
         "against the equivalent list-slice SQL.")
def tag_prefix_derivation(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    synth = F.concat_ws(
        "/", "o_orderstatus", "o_orderpriority",
        F.col("o_orderkey").cast("string"))
    return orders.select(
        "o_orderkey",
        synth.alias("synth_stream"),
        stream_prefix(synth).alias("stream_prefix"))
