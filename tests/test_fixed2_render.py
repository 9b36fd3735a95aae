"""Cross-engine parity of the shared fixed-2-decimal renderer.

diff_snapshots / profile_table_stats used to render doubles with a
bare double→string cast, which agrees between Spark (Java) and DuckDB
only for |x| < 1e7 — Java flips to scientific notation above that
(the round-5 advisor item). They now render through
functions.decimal_safe.fixed2_str / sql_fixed2_str; this test drives
the pair over magnitudes from 1e-2 to 1e15 (well past the old
precondition), negatives, ties at the hundredths digit, and values
needing round-up carries, asserting the two engines emit the
identical string for every case.
"""

import duckdb
import pytest

from kinesis_s3_data_shipper_spark.functions.decimal_safe import (
    fixed2_str, sql_fixed2_str)

CASES = [
    0.0,
    0.004,           # rounds down to 0.00
    0.005,           # tie at the hundredths digit
    0.625,           # dyadic tie: exactly representable .5 remainder
    -0.625,
    1.999,           # round-up carry
    123456.78,       # below the old 1e7 cliff
    9999999.99,
    10000000.0,      # the cliff itself
    12345678.905,    # above it — old rendering: 1.2345678905E7
    -98765432.1,
    1.23456789e12,
    9.87654321e15,
]


@pytest.mark.parametrize("x", CASES)
def test_spark_and_duckdb_render_identically(spark, x):
    got_spark = (spark.range(1)
                 .selectExpr(f"CAST({x!r} AS DOUBLE) AS v")
                 .select(fixed2_str("v").alias("s"))
                 .collect()[0]["s"])
    got_duck = duckdb.sql(
        "SELECT " + sql_fixed2_str(f"CAST({x!r} AS DOUBLE)") + " AS s"
    ).fetchone()[0]
    assert got_spark == got_duck, (x, got_spark, got_duck)
    assert "E" not in got_spark.upper(), (x, got_spark)
    assert got_spark.split(".")[-1].__len__() == 2, (x, got_spark)
