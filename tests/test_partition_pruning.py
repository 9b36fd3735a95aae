"""Partitioned-layout scan pruning: static partition pruning (a
literal filter on the partition column prunes the file listing at
plan time) and DYNAMIC partition pruning (a join against a filtered
dim inserts a runtime subquery filter into the fact scan). At 100 TB
these are the difference between scanning one date's worth of data
and scanning the table; both are free once the layout partitions on
the pruning key, but only if the plan actually shows them — which is
what these tests pin.
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def partitioned_orders(spark, tmp_path_factory, sf_small):
    """orders written partitioned by o_orderpriority (5 partitions)."""
    out = str(tmp_path_factory.mktemp("part") / "orders_by_priority")
    (spark.read.parquet(f"{sf_small}/orders.parquet")
     .write.mode("overwrite").partitionBy("o_orderpriority")
     .parquet(out))
    return out


def _formatted_plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_static_partition_pruning(spark, partitioned_orders):
    df = (spark.read.parquet(partitioned_orders)
          .filter(F.col("o_orderpriority") == "1-URGENT")
          .select("o_orderkey"))
    plan = _formatted_plan(df)
    # The literal predicate must land in PartitionFilters, not as a
    # post-scan Filter over all partitions' rows.
    assert "PartitionFilters" in plan
    assert "1-URGENT" in plan.split("PartitionFilters", 1)[1].split("\n")[0]
    n_all = spark.read.parquet(partitioned_orders).count()
    assert 0 < df.count() < n_all


def test_dynamic_partition_pruning(spark, partitioned_orders, sf_small):
    """Join fact (partitioned on o_orderpriority) to a filtered dim on
    the partition key: DPP must inject the dim's build-side values as
    a runtime partition filter on the fact scan."""
    fact = spark.read.parquet(partitioned_orders)
    dim = (spark.read.parquet(f"{sf_small}/orders.parquet")
           .select("o_orderpriority").distinct()
           .filter(F.col("o_orderpriority").startswith("1")))
    joined = fact.join(dim, "o_orderpriority").select("o_orderkey")
    plan = _formatted_plan(joined)
    assert "dynamicpruning" in plan.lower(), plan[:2000]
    assert joined.count() > 0
