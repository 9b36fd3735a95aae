"""Local mirror of the driver's correctness gate: run a registered
query in Spark and its oracle SQL in DuckDB on the same parquet
tables, then compare row count, column names, and order-insensitively
the values (exact for ints/strings/bools, tight approx for floats).
"""

from __future__ import annotations

import math
import os

import duckdb
import pandas as pd

from kinesis_s3_data_shipper_spark.sources.tables import (TABLE_NAMES,
                                                          table_path)

REL_TOL = 1e-12


def duckdb_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for name in TABLE_NAMES:
        path = table_path(sf_dir, name)
        if os.path.isdir(path):  # multi-file layout: glob the parts
            path = os.path.join(path, "*.parquet")
        con.sql(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{path}')")
    return con


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if str(df[c].dtype).startswith(("int", "uint", "Int")):
            df[c] = df[c].astype("int64")
        elif str(df[c].dtype).startswith("float"):
            df[c] = df[c].astype("float64")
        elif df[c].dtype == object:
            df[c] = df[c].astype(str)
    sort_cols = list(df.columns)
    return df.sort_values(sort_cols, kind="mergesort").reset_index(drop=True)


def compare(spark_df, oracle_pdf: pd.DataFrame, name: str = "") -> None:
    compare_pdfs(spark_df.toPandas(), oracle_pdf, name)


def compare_pdfs(got_pdf: pd.DataFrame, oracle_pdf: pd.DataFrame,
                 name: str = "") -> None:
    got = _normalize(got_pdf)
    want = _normalize(oracle_pdf)
    assert list(got.columns) == list(want.columns), (
        f"{name}: columns {list(got.columns)} != {list(want.columns)}")
    assert len(got) == len(want), f"{name}: rows {len(got)} != {len(want)}"
    for c in got.columns:
        if got[c].dtype == "float64":
            a, b = got[c].to_numpy(), want[c].to_numpy()
            for i, (x, y) in enumerate(zip(a, b)):
                ok = (math.isnan(x) and math.isnan(y)) or x == y or (
                    abs(x - y) <= REL_TOL * max(abs(x), abs(y)))
                assert ok, f"{name}.{c}[{i}]: {x!r} != {y!r}"
        else:
            pd.testing.assert_series_equal(
                got[c], want[c], check_names=False,
                obj=f"{name}.{c}")


def full_value_agg(sdf) -> None:
    """Force EVERY value of ``sdf`` to be computed while fetching one
    row: sum(xxhash64(all columns)).  The SCALE.md timing methodology
    — a bare count() lets Catalyst eliminate joins/projections whose
    outputs nothing reads (measured: the ngram groups form "ran" in
    1.1 s under count() because both left joins were ELIMINATED),
    while hashing every column keeps the whole plan live and ships no
    rows to the driver.  Map-typed columns are routed through to_json
    (hash expressions reject MapType's undefined ordering)."""
    from pyspark.sql import functions as F
    cols = [F.to_json(F.col(c)) if "map<" in t else F.col(c)
            for c, t in sdf.dtypes]
    # bit_xor, not sum: summing int64 hashes overflows under ANSI mode.
    sdf.select(F.bit_xor(F.xxhash64(*cols)).alias("h")).collect()


def run_pair(spark, sf_dir: str, name: str, spark_fn, oracle: str,
             con: duckdb.DuckDBPyConnection | None = None,
             compute_timing: bool = False) -> dict:
    """Run one (Spark, oracle) pair and compare.  Returns execution
    stats so sweep callers don't re-execute either side just to record
    counts/timings (r11: the sf0.1 sweep ran every Spark plan AND
    every oracle TWICE — once here, once for the stats — which is why
    its wall sat at 2x the actual work).  ``spark_sec`` covers plan
    build + full result fetch (toPandas); ``con`` may be a shared
    per-sf connection (the views are read-only).

    ``compute_timing=True`` (r11 verdict ask #3) additionally records
    ``compute_sec``: build + persist + full-value aggregate — a
    FETCH-FREE scale signal, so row-heavy outputs (scalar_*/window_*)
    stop reading ~10x across sf steps merely because toPandas ships
    10x the rows.  The result df is persisted first, so the follow-up
    toPandas for the hash compare reads cached partitions instead of
    re-executing the plan — one plan execution total, same as the
    plain protocol — and unpersisted before return so the cache can
    never substitute into a LATER query's plan (the audit-gate
    cache-substitution lesson)."""
    import time
    t0 = time.perf_counter()
    sdf = spark_fn(spark, sf_dir)
    compute_sec = None
    if compute_timing:
        sdf = sdf.persist()
        try:
            full_value_agg(sdf)
            compute_sec = time.perf_counter() - t0
            got = sdf.toPandas()
            spark_sec = time.perf_counter() - t0
        finally:
            sdf.unpersist()
    else:
        got = sdf.toPandas()
        spark_sec = time.perf_counter() - t0
    if con is None:
        con = duckdb_connection(sf_dir)
    t1 = time.perf_counter()
    want = con.sql(oracle).df()
    oracle_sec = time.perf_counter() - t1
    compare_pdfs(got, want, name)
    stats = {"spark_rows": len(got), "oracle_rows": len(want),
             "spark_sec": spark_sec, "oracle_sec": oracle_sec}
    if compute_sec is not None:
        stats["compute_sec"] = compute_sec
    return stats
