"""The Arrow-vectorized IVF kernels must be BIT-IDENTICAL to the HOF
SQL folds they replace: numpy cumsum is the same left-sequential add
chain as `aggregate`'s acc + v, elementwise multiply is the same IEEE
double op, and np.argmax's first-max matches array_position's
first-match tiebreak. Exact equality (no tolerance) on every vector —
this is what licenses swapping the HOF for the UDF under the hash-
comparing oracle gate.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from kinesis_s3_data_shipper_spark.operators.similarity import (
    fold_norm, ivf_cluster, ivf_cluster_arrow, ivf_cosines,
    ivf_cosines_arrow)
from kinesis_s3_data_shipper_spark.sources.tables import load_table


def _cents(emb, k):
    return [list(map(float, r.embedding)) for r in
            emb.filter(F.col("vec_id") < k).orderBy("vec_id").collect()]


def test_arrow_cluster_assignment_bitwise_equals_hof(spark, sf_small):
    emb = load_table(spark, sf_small, "embeddings")
    cents = _cents(emb, 23)  # odd K, exercises ties/argmax path
    hof = emb.select("vec_id", ivf_cluster("embedding", cents).alias("h"))
    arw = emb.select("vec_id",
                     ivf_cluster_arrow("embedding", cents).alias("a"))
    assert hof.join(arw, "vec_id").filter("h <> a").count() == 0


def test_arrow_cosine_arrays_bitwise_equal_hof(spark, sf_small):
    emb = load_table(spark, sf_small, "embeddings")
    cents = _cents(emb, 17)
    hof = emb.select("vec_id", ivf_cosines("embedding", cents).alias("h"))
    arw = emb.select("vec_id",
                     ivf_cosines_arrow("embedding", cents).alias("a"))
    # Array inequality on array<double> is exact per-element comparison
    # — any ulp of drift in any coordinate of any vector fails.
    assert hof.join(arw, "vec_id").filter("h <> a").count() == 0


def test_arrow_pq_codes_bitwise_equal_hof(spark, sf_small):
    from kinesis_s3_data_shipper_spark.operators.similarity import (
        pq_codebook, pq_codes, pq_codes_arrow)
    emb = load_table(spark, sf_small, "embeddings")
    train = [list(map(float, r.embedding)) for r in
             emb.filter(F.col("vec_id") < 16).orderBy("vec_id").collect()]
    cb = pq_codebook(train, 8)
    hof = emb.select("vec_id", pq_codes("embedding", cb).alias("h"))
    arw = emb.select("vec_id", pq_codes_arrow("embedding", cb).alias("a"))
    assert hof.join(arw, "vec_id").filter("h <> a").count() == 0


def test_fold_norm_matches_sql_fold(spark):
    # The Python replica of the fold norm (used for centroid-norm plan
    # literals) against the engine's own aggregate fold, on the same
    # float32-rounded values the engine reads from parquet.
    import numpy as np
    raw = [0.1, 0.2, 0.30000001, 123.456, -7.5e-3]
    df = spark.createDataFrame([(raw,)], "v array<float>")
    got = df.select(F.expr(
        "sqrt(aggregate(v, CAST(0 AS DOUBLE),"
        " (acc, x) -> acc + CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))"
    ).alias("n")).collect()[0].n
    want = fold_norm([float(x) for x in np.asarray(raw, dtype=np.float32)])
    assert got == want


def test_broadcast_assign_bitwise_equals_arrow_kernel(spark, sf_small):
    """The past-the-closure-cap path (broadcast centroid table +
    argmax agg) must pick the identical cluster for every vector —
    same fold arithmetic, same lowest-cid tiebreak."""
    from kinesis_s3_data_shipper_spark.operators.similarity import (
        ivf_assign_broadcast)
    emb = load_table(spark, sf_small, "embeddings")
    cents = _cents(emb, 23)
    cent_df = (emb.filter(F.col("vec_id") < 23)
               .select(F.col("vec_id").alias("cid"),
                       F.col("embedding").alias("cvec")))
    arw = emb.select("vec_id",
                     ivf_cluster_arrow("embedding", cents).alias("a"))
    bc = ivf_assign_broadcast(emb, cent_df, id_col="vec_id",
                              vec_col="embedding", out_col="b")
    assert arw.join(bc, "vec_id").filter("a <> b").count() == 0
    assert bc.count() == emb.count()


def test_ivf_probe_broadcast_path_passes_oracle(spark, sf_small,
                                                monkeypatch):
    """Force K above the closure cap (cap -> 4) so ann_ivf_probe takes
    the broadcast-table branch, then run the FULL oracle comparison —
    the graduation must be invisible to the hash gate."""
    from kinesis_s3_data_shipper_spark.plans import REGISTRY, all_queries
    from kinesis_s3_data_shipper_spark.plans import similarity as sim

    from .oracle_harness import run_pair
    all_queries()
    monkeypatch.setattr(sim, "_IVF_CLOSURE_CAP", 4)
    spec = REGISTRY["ann_ivf_probe"]
    run_pair(spark, sf_small, spec.name, spec.spark, spec.oracle)


def _top3_sets(spark, name, sf_dir):
    from kinesis_s3_data_shipper_spark.plans import all_queries
    df = all_queries()[name](spark, sf_dir)
    out: dict = {}
    for r in df.filter("rank <= 3").select("query_id",
                                           "neighbor_id").collect():
        out.setdefault(r.query_id, set()).add(r.neighbor_id)
    return out


def _recall3(approx, exact):
    hits = sum(len(ex & approx.get(qid, set()))
               for qid, ex in exact.items())
    return hits / max(1, sum(len(ex) for ex in exact.values()))


def test_ann_recall_regression_gate(spark):
    """Recall@3 floors for every probe path at sf0.01 (verdict r4 #5):
    bit-width / K / probe-count changes can no longer silently sink
    recall. Floors sit well under the measured values (SCALE.md —
    granularity is 1/18 with the bounded query sample), and the
    recall LEVERS must actually lever: multiprobe >= its single-probe
    sibling, on the same candidates-only-cheaper dataflow."""
    sf = "/root/testdata/sf0.01"
    exact = _top3_sets(spark, "ann_bruteforce_topk", sf)
    r = {name: _recall3(_top3_sets(spark, name, sf), exact)
         for name in ["ann_lsh_probe", "ann_lsh_multiprobe",
                      "ann_ivf_probe", "ann_ivf_multiprobe",
                      "ann_ivfpq_adc"]}
    # measured r5: lsh .056, lsh_multi .111, ivf .222, ivf_multi .500,
    # ivfpq .111 — floors leave >= one granularity step of margin.
    floors = {"ann_lsh_probe": 0.02, "ann_lsh_multiprobe": 0.05,
              "ann_ivf_probe": 0.10, "ann_ivf_multiprobe": 0.25,
              "ann_ivfpq_adc": 0.05}
    for name, floor in floors.items():
        assert r[name] >= floor, (name, r[name], floor)
    assert r["ann_lsh_multiprobe"] >= r["ann_lsh_probe"]
    assert r["ann_ivf_multiprobe"] >= r["ann_ivf_probe"]
