"""Warehouse-maintenance plans: MERGE upsert and SCD2 history.

Two operators every warehouse feeding a training pipeline runs daily,
expressed as pure DataFrame plans (no table-format dependency — the
same dataflow a Delta/Iceberg MERGE compiles to):

- MERGE (upsert): full-outer join of target and source on the key,
  then a per-row action (update / insert / keep). One shuffle on the
  merge key; at scale the small-delta side broadcast-joins instead.
- SCD2 (slowly-changing dimension, type 2): change events become
  validity intervals [valid_from, valid_to) via lead() over the
  per-key event sequence. One shuffle on the dimension key; the
  window sort is within-partition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.decimal_safe import dsum, sql_dsum
from ..sources.tables import load_table
from .base import register


@register("merge_upsert_customers", oracle=f"""
WITH tgt AS (
  SELECT c_custkey AS custkey, c_acctbal FROM customer
  WHERE c_nationkey < 20
), src AS (
  SELECT o_custkey, {sql_dsum("o_totalprice", "delta")}
  FROM orders
  WHERE o_orderdate >= TIMESTAMP '1995-01-01'
    AND o_orderdate < TIMESTAMP '1996-01-01'
  GROUP BY o_custkey
)
SELECT COALESCE(custkey, o_custkey) AS custkey,
       CASE WHEN custkey IS NULL THEN 'insert'
            WHEN o_custkey IS NULL THEN 'keep'
            ELSE 'update' END AS merge_action,
       CASE WHEN custkey IS NULL THEN delta
            WHEN o_custkey IS NULL THEN c_acctbal
            ELSE c_acctbal + delta END AS new_acctbal
FROM tgt FULL JOIN src ON custkey = o_custkey
""", doc="MERGE semantics (the dataflow a Delta/Iceberg MERGE INTO "
         "compiles to): target = customers of nations 0-19, source = "
         "1995 order-revenue deltas per customer. Matched rows update "
         "the balance, source-only rows insert, target-only rows keep. "
         "Full-outer join on the key is the general plan; when the "
         "delta side is small (the daily case) it broadcast-joins. "
         "Delta sums are decimal-exact so both engines agree bit-wise.")
def merge_upsert_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    tgt = (cust.filter(F.col("c_nationkey") < 20)
           .select(F.col("c_custkey").alias("custkey"), "c_acctbal"))
    src = (orders
           .filter((F.col("o_orderdate")
                    >= F.lit("1995-01-01").cast("timestamp"))
                   & (F.col("o_orderdate")
                      < F.lit("1996-01-01").cast("timestamp")))
           .groupBy("o_custkey")
           .agg(dsum("o_totalprice", "delta")))
    m = tgt.join(src, tgt["custkey"] == src["o_custkey"], "full_outer")
    action = (F.when(F.col("custkey").isNull(), "insert")
              .when(F.col("o_custkey").isNull(), "keep")
              .otherwise("update"))
    new_bal = (F.when(F.col("custkey").isNull(), F.col("delta"))
               .when(F.col("o_custkey").isNull(), F.col("c_acctbal"))
               .otherwise(F.col("c_acctbal") + F.col("delta")))
    return m.select(
        F.coalesce("custkey", "o_custkey").alias("custkey"),
        action.alias("merge_action"),
        new_bal.alias("new_acctbal"))


@register("scd2_priority_history", oracle="""
SELECT o_custkey AS custkey, o_orderpriority AS priority,
       strftime(o_orderdate, '%Y-%m-%d') AS valid_from,
       COALESCE(strftime(lead(o_orderdate) OVER w, '%Y-%m-%d'),
                '9999-12-31') AS valid_to,
       lead(o_orderdate) OVER w IS NULL AS is_current
FROM orders
WINDOW w AS (PARTITION BY o_custkey
             ORDER BY o_orderdate, o_orderkey)
""", doc="SCD2 dimension history: each customer's order-priority "
         "stream becomes versioned rows with [valid_from, valid_to) "
         "validity and an is_current flag — lead() over the per-key "
         "event sequence, the standard type-2 slowly-changing-"
         "dimension build. One shuffle on the dimension key; ordering "
         "is tiebroken by the unique order key so same-day changes "
         "version deterministically.")
def scd2_priority_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    nxt = F.lead("o_orderdate").over(w)
    return orders.select(
        F.col("o_custkey").alias("custkey"),
        F.col("o_orderpriority").alias("priority"),
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("valid_from"),
        F.coalesce(F.date_format(nxt, "yyyy-MM-dd"),
                   F.lit("9999-12-31")).alias("valid_to"),
        nxt.isNull().alias("is_current"))
