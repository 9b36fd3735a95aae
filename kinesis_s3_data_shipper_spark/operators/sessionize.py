"""Batch sessionization: inactivity-gap sessions from built-in windows.

lag → gap flag → running sum = session id → per-session aggregate.
Two window passes over the SAME (key, order) partitioning, so Spark
performs one shuffle + one sort and reuses them for both windows; the
final groupBy re-uses the key partitioning as well (Exchange reuse).
The streaming twin is ``session_window``/``applyInPandasWithState``
in the streaming package.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F


def sessionize(events: DataFrame, *, user_col: str, ts_col: str,
               tiebreak_col: str, gap_ns: int) -> DataFrame:
    """Assign gap-based session ids and aggregate per session.

    ``ts_col`` must be an integer (epoch-nanos) column; all arithmetic
    stays exact. Output: user, session_id (1-based per user), n_events,
    start_ms, end_ms.
    """
    w = W.partitionBy(user_col).orderBy(ts_col, tiebreak_col)
    gap = F.col(ts_col) - F.lag(ts_col).over(w)
    flagged = events.select(
        user_col, F.col(ts_col).alias("_ts"),
        F.when(gap > gap_ns, 1).when(gap.isNull(), 1).otherwise(0)
         .alias("_is_new"))

    w_run = (W.partitionBy(user_col).orderBy("_ts")
             .rowsBetween(W.unboundedPreceding, W.currentRow))
    with_ids = flagged.select(
        user_col, "_ts",
        F.sum("_is_new").over(w_run).alias("session_id"))

    return (with_ids.groupBy(user_col, "session_id")
            .agg(F.count("*").alias("n_events"),
                 F.expr("(min(_ts) div 1000000)").alias("start_ms"),
                 F.expr("(max(_ts) div 1000000)").alias("end_ms")))
