"""Small driver-side row lists as JVM VALUES relations.

``spark.createDataFrame(rows, schema)`` over Python rows builds a
defaultParallelism-partition Python RDD: EVERY materialization of the
frame (each broadcast build, each reuse across jobs) boots Python
worker processes per partition — measured ~2 s for a 19-row frame on
local[32], and a ``coalesce(1)`` write over it evaluates the parent
partitions serially in one task (~5 s). For the tiny bounded frames
the engine broadcasts (split targets, probe tokens, query workloads),
that is pure overhead: a SQL ``VALUES`` relation is a Catalyst
LocalRelation — constant-folded, no Python workers, free to broadcast.

Only for int/float/str/bool/None cells (rendered as SQL literals);
anything richer should stay on createDataFrame.
"""

from __future__ import annotations

from collections.abc import Iterable, Sequence

from pyspark.sql import DataFrame, SparkSession


def _lit(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "TRUE" if v else "FALSE"
    if isinstance(v, int):
        return str(v)
    if isinstance(v, float):
        return repr(v)  # round-trips exactly (shortest repr)
    if isinstance(v, str):
        return "'" + v.replace("'", "''") + "'"
    raise TypeError(f"values_df: unsupported literal type {type(v)!r}")


def values_df(spark: SparkSession, rows: Iterable[Sequence],
              schema: str) -> DataFrame:
    """A DataFrame over ``rows`` with the given ``'name type, ...'``
    schema, built as a pure-JVM VALUES relation (see module doc).
    ``rows`` must be non-empty (VALUES cannot be empty)."""
    cols = [c.strip().split(None, 1) for c in schema.split(",")]
    vals = ", ".join(
        "(" + ", ".join(_lit(v) for v in row) + ")" for row in rows)
    if not vals:
        raise ValueError("values_df: rows must be non-empty")
    proj = ", ".join(f"CAST(col{i + 1} AS {typ}) AS {name}"
                     for i, (name, typ) in enumerate(cols))
    return spark.sql(f"SELECT {proj} FROM VALUES {vals}")
