"""r13 optimization: recursive_ewma_monthly's Spark side runs the
recursion as a single-task array fold (plans/analytics.py::_ewma_fold)
instead of the WITH RECURSIVE executor (~80 scheduled steps, a
data-independent ~5 s floor).  The oracle text is UNCHANGED — these
tests pin the fold bit-exactly against Spark's own recursive-CTE
executor on the same rollup, so any divergence in the IEEE chain
(op order, base case, sort order) fails here before it can reach the
hash gate."""
from __future__ import annotations

import math

from pyspark.sql import functions as F

from kinesis_s3_data_shipper_spark.plans.analytics import (
    _EWMA_MONTHLY, _ewma_fold, _ewma_sql)
from kinesis_s3_data_shipper_spark.sources.tables import load_table


def _bits(series):
    return [math.nan if v is None else v for v in series]


def _assert_bit_equal(got, want):
    """Row-set equality with float columns compared BITWISE (struct
    pack round-trip), not by tolerance — the hash gate is exact."""
    import struct

    def key(row):
        out = []
        for v in row:
            if isinstance(v, float):
                out.append(struct.pack("<d", v).hex())
            else:
                out.append(str(v))
        return tuple(out)

    g = sorted(key(r) for r in got)
    w = sorted(key(r) for r in want)
    assert g == w, f"bit mismatch:\n got={g[:4]}...\nwant={w[:4]}..."


def test_fold_matches_recursive_cte_on_synthetic(spark):
    """Synthetic rollup with awkward doubles (values whose EWMA chain
    is rounding-sensitive): fold == recursive CTE bit for bit."""
    rows = [(i + 1, f"2030-{i + 1:02d}-01", v) for i, v in enumerate(
        [0.1, 0.2, 0.3, 1e15, -7.7, 1234.5678, 1e-12, 3.0, 0.0, 99.99])]
    monthly = (spark.createDataFrame(
        rows, "idx long, month string, rev double")
        .select("idx", F.col("month").cast("date").alias("month"), "rev"))
    monthly.createOrReplaceTempView("ewma_fold_test_m")
    want = spark.sql(_ewma_sql(
        "SELECT idx, month, rev FROM ewma_fold_test_m")).collect()
    got = _ewma_fold(monthly).collect()
    _assert_bit_equal(got, want)


def test_fold_matches_recursive_cte_on_orders(spark, sf_small):
    """The registered query's own rollup at sf0.001: fold == the
    pre-r13 implementation (recursive CTE over the materialized
    rollup) bit for bit."""
    load_table(spark, sf_small, "orders").createOrReplaceTempView(
        "ewma_fold_test_orders")
    monthly_sql = _EWMA_MONTHLY.replace("FROM orders",
                                        "FROM ewma_fold_test_orders")
    monthly = spark.sql(monthly_sql)
    monthly.createOrReplaceTempView("ewma_fold_test_monthly")
    want = spark.sql(_ewma_sql(
        "SELECT idx, month, rev FROM ewma_fold_test_monthly")).collect()
    got = _ewma_fold(monthly).collect()
    assert len(got) > 0
    _assert_bit_equal(got, want)


def test_fold_single_month(spark):
    """Base case only: one month, s == rev exactly."""
    monthly = (spark.createDataFrame(
        [(1, "2030-01-01", 42.5)], "idx long, month string, rev double")
        .select("idx", F.col("month").cast("date").alias("month"), "rev"))
    out = _ewma_fold(monthly).collect()
    assert len(out) == 1
    assert out[0]["ewma_rev"] == 42.5 and out[0]["rev"] == 42.5
