"""Lineage-truncating materialization for ITERATIVE dataflows.

Two primitives every checkpoint-per-round loop in this repo needs
(k-core / PageRank / Louvain fixpoints, min-label connected
components):

- :func:`truncated_checkpoint` — eager ``localCheckpoint`` plus a
  STATS FIREWALL.  ``Dataset.localCheckpoint`` copies the origin
  plan's estimated statistics into the new LogicalRDD
  (``rewriteStatsAndConstraints``), and size-only join estimation
  MULTIPLIES children's ``sizeInBytes`` — so when a loop builds round
  N's checkpoints from round N-1's checkpoints, the BigInt estimate
  compounds exponentially in the round count.  By Louvain level 5 the
  driver spent ~70 s per level multiplying megabyte-long BigIntegers
  inside ``SizeInBytesOnlyStatsPlanVisitor`` (jstack-verified) while
  executors idled; the 6-level loop dropped 98 s -> 10 s after the
  firewall.  The fix re-wraps the SAME persisted RDD without origin
  stats.  Join strategy is unaffected: the inherited products were
  already far above every broadcast threshold, exactly like the
  default leaf estimate that replaces them, and explicit
  ``broadcast()`` hints still apply.

- :func:`release_checkpoint` — free a checkpointed frame's blocks
  once the loop has superseded it, so live storage stays O(1) rounds
  instead of O(rounds) (an 8-round peel otherwise parks ~17
  edge-scale block sets for the session lifetime).

Both reach through private APIs (``internalCreateDataFrame`` is
``private[sql]``, which compiles to a public JVM method) and degrade
gracefully: a Spark release that moves the internals falls back to
the plain checkpoint / skips the release — correctness is never
affected, only deep-loop driver time and disk residency.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def truncated_checkpoint(df: DataFrame, storage_level=None) -> DataFrame:
    """Eager localCheckpoint with the stats firewall (module doc)."""
    if storage_level is None:
        ckpt = df.localCheckpoint(eager=True)
    else:
        ckpt = df.localCheckpoint(eager=True, storageLevel=storage_level)
    try:
        spark = ckpt.sparkSession
        jrdd = ckpt._jdf.queryExecution().analyzed().rdd()
        jdf = spark._jsparkSession.internalCreateDataFrame(
            jrdd, ckpt._jdf.schema(), False)
        return DataFrame(jdf, spark)
    except Exception:
        return ckpt


def release_checkpoint(df: DataFrame) -> None:
    """Free a :func:`truncated_checkpoint` frame's blocks (module doc).
    Only call on frames no live result depends on: the checkpoint has
    no lineage, so its data is unrecoverable after release."""
    try:
        df._jdf.queryExecution().analyzed().rdd().unpersist(False)
    except Exception:
        pass
