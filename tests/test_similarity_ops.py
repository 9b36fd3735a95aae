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
