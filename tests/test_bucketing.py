"""Bucketed co-located join: write lineitem and orders bucketed by the
join key, then verify the join plan has NO shuffle on either side —
the storage-layout lever that removes the biggest cost of repeated
fact-to-fact joins at 100 TB (SURVEY §2.2 joins: 'bucketing for
co-located joins').
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

N_BUCKETS = 8


@pytest.fixture(scope="module")
def bucketed_tables(spark, tmp_path_factory, sf_small):
    warehouse = tmp_path_factory.mktemp("warehouse")
    li = spark.read.parquet(f"{sf_small}/lineitem.parquet")
    orders = spark.read.parquet(f"{sf_small}/orders.parquet")
    # warehouse.dir is a static conf; place the table data explicitly.
    (li.write.mode("overwrite").bucketBy(N_BUCKETS, "l_orderkey")
       .sortBy("l_orderkey").option("path", str(warehouse / "li"))
       .saveAsTable("li_bucketed"))
    (orders.write.mode("overwrite").bucketBy(N_BUCKETS, "o_orderkey")
       .sortBy("o_orderkey").option("path", str(warehouse / "orders"))
       .saveAsTable("orders_bucketed"))
    yield "li_bucketed", "orders_bucketed"
    spark.sql("DROP TABLE IF EXISTS li_bucketed")
    spark.sql("DROP TABLE IF EXISTS orders_bucketed")


def test_bucketed_join_has_no_shuffle(spark, bucketed_tables):
    li_t, o_t = bucketed_tables
    # Disable broadcast so the join would otherwise need a shuffle.
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = (spark.table(li_t)
                  .join(spark.table(o_t),
                        F.col("l_orderkey") == F.col("o_orderkey"))
                  .groupBy("o_orderpriority").count())
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        # Bucket layout replaces both join exchanges; the only shuffle
        # allowed is the one for the final small groupBy.
        assert plan.count("Exchange hashpartitioning") <= 1
        assert "Bucketed: true" in plan
        # And it computes the right thing.
        got = {r.o_orderpriority: r["count"] for r in joined.collect()}
        want = (spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
                .join(spark.read.parquet(
                    "/root/testdata/sf0.001/orders.parquet"),
                    F.col("l_orderkey") == F.col("o_orderkey"))
                .groupBy("o_orderpriority").count().collect())
        assert got == {r.o_orderpriority: r["count"] for r in want}
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold",
                       str(64 * 1024 * 1024))
