"""The unrolled (codegen) vector arithmetic must be BIT-IDENTICAL to
the higher-order-fold form — same left-associated IEEE op sequence —
because the DuckDB oracles reproduce the fold and scores are compared
by value hash. This pins the claim dot()/norm()/cosine() make when
`dim` is passed (see functions/vectors.py and SCALE.md).
"""

from __future__ import annotations

import numpy as np
import pytest

from pyspark.sql import functions as F

from kinesis_s3_data_shipper_spark.functions.vectors import (cosine, dot,
                                                             norm)


@pytest.mark.parametrize("dim", [1, 2, 7, 64])
def test_unrolled_matches_fold_bitwise(spark, dim):
    rng = np.random.default_rng(20260813 + dim)
    rows = [(i,
             [float(x) for x in rng.normal(size=dim).astype(np.float32)],
             [float(x) for x in rng.normal(size=dim).astype(np.float32)])
            for i in range(300)]
    df = spark.createDataFrame(
        rows, "id long, a array<float>, b array<float>")
    cmp = df.select(
        (dot("a", "b", dim) == dot("a", "b")).alias("dot_eq"),
        (norm("a", dim) == norm("a")).alias("norm_eq"),
        (cosine("a", "b", dim) == cosine("a", "b")).alias("cos_eq"))
    agg = cmp.agg(
        F.sum(F.expr("IF(dot_eq, 0, 1)")).alias("dot_bad"),
        F.sum(F.expr("IF(norm_eq, 0, 1)")).alias("norm_bad"),
        F.sum(F.expr("IF(cos_eq, 0, 1)")).alias("cos_bad")).first()
    assert (agg.dot_bad, agg.norm_bad, agg.cos_bad) == (0, 0, 0)
