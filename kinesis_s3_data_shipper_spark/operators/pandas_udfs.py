"""Pandas-UDF operator surface (SURVEY §2.2 'UDF / UDAF / UDTF'):
Arrow-batched Python where JVM expressions can't express the logic.

Determinism discipline — a pandas UDF receives its group's rows in
ARBITRARY order (partition arrival), so anything order-dependent
(float summation!) would be nondeterministic across runs and engines.
These operators only use order-independent computations:

- median: sorts inside the UDF, then one exact (a+b)/2 — identical
  IEEE result for any input order;
- min-max scale: min/max are order-independent, the scale division is
  one exact IEEE op per row.

The rule of thumb stays: built-ins first (10-100× faster); a pandas
UDF earns its place only for logic like exact interpolated median that
has no distributable built-in with identical semantics.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf


@pandas_udf("double")
def median_udf(v: pd.Series) -> float:
    """Grouped-agg pandas UDF: exact interpolated median.

    pandas sorts internally; for even n the result is (a+b)/2 — one
    IEEE op on the two middle elements, order-independent."""
    return float(v.median())


def grouped_median(df: DataFrame, *, group_col: str, value_col: str,
                   alias: str = "median") -> DataFrame:
    """groupBy(group).agg(median(value)) via an Arrow grouped-agg UDF."""
    return (df.groupBy(group_col)
            .agg(median_udf(F.col(value_col)).alias(alias)))


def grouped_minmax_scale(df: DataFrame, *, group_col: str, id_col: str,
                         value_col: str, group_type: str = "string") -> DataFrame:
    """applyInPandas grouped-map: per-group min-max scaling.

    Output: (group, id, value, scaled) where scaled = (x-min)/(max-min)
    (NULL for degenerate single-value groups). min/max are order-
    independent, so the result is deterministic under any partitioning.

    Scale note: applyInPandas materializes each group as ONE pandas
    DataFrame in ONE Python worker — the group key must be high-
    cardinality / bounded-size (e.g. a key-range bucket), never a
    handful-of-values enum, or the biggest group OOMs at 100 TB.
    """
    schema = (f"{group_col} {group_type}, {id_col} long, {value_col} double,"
              f" scaled double")

    def scale(pdf: pd.DataFrame) -> pd.DataFrame:
        lo, hi = pdf[value_col].min(), pdf[value_col].max()
        out = pdf[[group_col, id_col, value_col]].copy()
        out["scaled"] = (pdf[value_col] - lo) / (hi - lo) if hi > lo else None
        return out

    return (df.select(group_col, id_col, value_col)
            .groupBy(group_col).applyInPandas(scale, schema))
