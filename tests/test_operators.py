"""Unit tests for the custom operators (as-of join, sessionize,
stream-prefix derivation) on tiny hand-built frames where the expected
output is computable by eye — complementing the DuckDB oracle gate,
which exercises them only on the synthetic tables.
"""

from __future__ import annotations

from kinesis_s3_data_shipper_spark.functions.strings import stream_prefix
from kinesis_s3_data_shipper_spark.operators.asof import asof_join
from kinesis_s3_data_shipper_spark.operators.sessionize import sessionize

import pyspark.sql.functions as F


def test_stream_prefix_reference_parity(spark):
    """Must equal Python's '/'.join(s.split('/')[0:2]) exactly
    (kinesis-to-humio.py:137), including edge shapes."""
    cases = ["2020/04/01/[$LATEST]abc", "a/b", "a", "a/b/", "", "/",
             "//x", "a//b"]
    df = spark.createDataFrame([(c,) for c in cases], "s STRING")
    got = {r.s: r.p for r in
           df.select("s", stream_prefix("s").alias("p")).collect()}
    for c in cases:
        assert got[c] == "/".join(c.split("/")[0:2]), c


def test_stream_prefix_property(spark):
    """Hypothesis sweep: for ANY printable string (slashes anywhere),
    the JVM expression equals Python's '/'.join(s.split('/')[0:2]) —
    the reference's exact tag derivation (kinesis-to-humio.py:137)."""
    from hypothesis import given, settings, strategies as st

    cases: list[str] = []

    @settings(max_examples=200, deadline=None)
    @given(st.text(alphabet=st.characters(codec="utf-8",
                                          exclude_characters="\x00"),
                   max_size=30))
    def collect(s):
        cases.append(s)

    collect()
    df = spark.createDataFrame([(c,) for c in set(cases) if c], "s STRING")
    got = {r.s: r.p for r in
           df.select("s", stream_prefix("s").alias("p")).collect()}
    for s, p in got.items():
        assert p == "/".join(s.split("/")[0:2]), repr(s)


def test_asof_join_strict_and_inclusive(spark):
    left = spark.createDataFrame(
        [(1, 100, "p1"), (1, 200, "p2"), (2, 50, "p3")],
        "user_id LONG, ts LONG, name STRING")
    right = spark.createDataFrame(
        [(1, 100, "s1"), (1, 150, "s2"), (3, 10, "s3")],
        "user_id LONG, ts LONG, tag STRING")

    strict = asof_join(left, right, on="user_id", ts_col="ts", strict=True,
                       right_value_cols=("tag",), right_alias="r")
    got = {r.name: r.r_tag for r in strict.collect()}
    # p1@100: strictly-before 100 → none. p2@200: latest of s1,s2 → s2.
    assert got == {"p1": None, "p2": "s2", "p3": None}

    inclusive = asof_join(left, right, on="user_id", ts_col="ts",
                          strict=False, right_value_cols=("tag",),
                          right_alias="r")
    got = {r.name: r.r_tag for r in inclusive.collect()}
    # p1@100: at-or-before 100 → s1.
    assert got == {"p1": "s1", "p2": "s2", "p3": None}


def test_sessionize_gap_boundaries(spark):
    gap = 10
    ev = spark.createDataFrame(
        [(1, 0, "a"), (1, 10, "b"),   # gap == 10 → same session
         (1, 21, "c"),                # gap 11 > 10 → new session
         (2, 5, "d")],
        "user_id LONG, ts LONG, event_id STRING")
    out = sessionize(ev, user_col="user_id", ts_col="ts",
                     tiebreak_col="event_id", gap_ns=gap)
    got = {(r.user_id, r.session_id): r.n_events for r in out.collect()}
    assert got == {(1, 1): 2, (1, 2): 1, (2, 1): 1}


def test_asof_join_plan_single_shuffle(spark):
    """The as-of join must cost ONE shuffle on the key (union + window),
    never a cross product."""
    left = spark.range(10).select(
        F.col("id").alias("k"), (F.col("id") * 10).alias("ts"))
    right = spark.range(10).select(
        F.col("id").alias("k"), (F.col("id") * 7).alias("ts"),
        F.lit("x").alias("v"))
    plan = asof_join(left, right, on="k", ts_col="ts",
                     right_value_cols=("v",))._jdf.queryExecution() \
        .executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "SortMergeJoin" not in plan  # composed, not a pairwise join


def test_lsh_index_parquet_roundtrip_incremental(spark, tmp_path, sf_small):
    """The LSH index table round-trips through parquet and supports
    append-only maintenance: sign the base ONCE, store it, then pair a
    delta against the STORED index — results must equal the batch
    rebuild filtered to delta-involving pairs (no misses, no
    phantoms), without re-signing the base."""
    from pyspark.sql import functions as F

    from kinesis_s3_data_shipper_spark.operators.dedup import (
        minhash_lsh_index, minhash_lsh_pairs, minhash_lsh_pairs_incremental)
    from kinesis_s3_data_shipper_spark.sources.tables import load_table

    docs = load_table(spark, sf_small, "documents")
    base_docs = docs.filter(F.col("doc_id") % 5 != 0)
    delta_docs = docs.filter(F.col("doc_id") % 5 == 0)

    idx_dir = str(tmp_path / "lsh_index")
    minhash_lsh_index(base_docs, id_col="doc_id",
                      text_col="text").write.parquet(idx_dir)
    stored = spark.read.parquet(idx_dir)

    delta_idx = minhash_lsh_index(delta_docs, id_col="doc_id",
                                  text_col="text")
    inc = {(r.doc_a, r.doc_b): r.jaccard
           for r in minhash_lsh_pairs_incremental(
               stored, delta_idx, threshold=0.5).collect()}

    batch = {(r.doc_a, r.doc_b): r.jaccard
             for r in minhash_lsh_pairs(
                 docs, id_col="doc_id", text_col="text",
                 shingle_k=3, num_hashes=16, num_bands=4,
                 threshold=0.5).collect()
             if r.doc_a % 5 == 0 or r.doc_b % 5 == 0}
    assert inc == batch

    # Maintenance completes the epoch by appending the delta's rows.
    delta_idx.write.mode("append").parquet(idx_dir)
    assert spark.read.parquet(idx_dir).count() == docs.count()
