"""Streaming plans. `streaming_hourly` runs a real Structured Streaming
query (file source → watermark → tumbling window → memory sink, drained
with availableNow) and is oracle-checked against the SAME SQL as the
batch `events_hourly` — streaming/batch parity is itself the assertion.
"""

from __future__ import annotations

import os
import shutil
import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession

from ..functions.decimal_safe import sql_dsum
from ..streaming.jobs import streaming_hourly_counts
from .base import register

NS_PER_HOUR = 3_600_000_000_000


@register("streaming_hourly", oracle=f"""
SELECT (epoch_ns(ts) // {NS_PER_HOUR}) * 3600000 AS hour_ms,
       event_type,
       COUNT(*) AS n,
       {sql_dsum('value', 'sum_value')}
FROM events GROUP BY 1, 2
""", doc="Structured Streaming tumbling-window aggregate over the events "
         "table (file source + watermark + availableNow), checked against "
         "the batch-SQL oracle — exact streaming/batch parity.")
def streaming_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    events_path = os.path.join(sf_dir, "events.parquet")
    work = tempfile.mkdtemp(prefix="ksds_stream_")
    checkpoint = os.path.join(work, "ckpt")
    # The file source wants a directory; stage the single parquet file.
    landing = os.path.join(work, "landing")
    os.makedirs(landing)
    shutil.copy(events_path, os.path.join(landing, "events.parquet"))
    name = f"hourly_{uuid.uuid4().hex[:8]}"
    return streaming_hourly_counts(spark, landing, checkpoint=checkpoint,
                                   query_name=name)
