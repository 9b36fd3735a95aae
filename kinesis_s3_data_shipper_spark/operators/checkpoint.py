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
``tests/test_truncated_checkpoint.py`` carries a canary that fails
the suite (instead of silently restoring the 98 s stall) if the wrap
ever degrades to the fallback on the running Spark version.

TRADEOFF the stats firewall accepts: ``internalCreateDataFrame``
re-wraps with UNKNOWN outputPartitioning/outputOrdering, while
``localCheckpoint``'s own LogicalRDD preserves both.  A loop whose
per-round join could have REUSED the checkpoint's partitioning
(checkpoint keyed on the join key, joined on it next round) will
re-shuffle the wrapped frame where the plain checkpoint would not.
Every current fixpoint loop re-keys between rounds anyway (the bench
numbers are a net win), but a future shape that relies on checkpoint
partitioning reuse should pass the frame through plain
``localCheckpoint`` and cap its loop depth instead.
"""

from __future__ import annotations

import logging

from pyspark.sql import DataFrame

log = logging.getLogger(__name__)


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


def _logical_rdd_leaf(plan):
    """Descend through UNARY nodes (Project/Filter/...) to the
    LogicalRDD leaf, or None if the plan isn't a unary chain over one
    (a multi-child plan derives from several frames; releasing any one
    of them here would be a guess)."""
    while plan.getClass().getSimpleName() != "LogicalRDD":
        children = plan.children()
        if children.size() != 1:
            return None
        plan = children.apply(0)
    return plan


def release_checkpoint(df: DataFrame) -> bool:
    """Free a :func:`truncated_checkpoint` frame's blocks (module doc).
    Only call on frames no live result depends on: the checkpoint has
    no lineage, so its data is unrecoverable after release.

    Accepts the checkpoint frame itself OR a unary derivation of it
    (``ckpt.drop(col)`` is a Project over the LogicalRDD — the shape
    every loop that tags a convergence column produces).  Returns True
    iff blocks were actually released; a skipped release is WARN-logged
    so an O(rounds) block leak is visible, never silent.
    """
    try:
        leaf = _logical_rdd_leaf(df._jdf.queryExecution().analyzed())
        if leaf is None:
            log.warning(
                "release_checkpoint skipped: plan is not a unary chain "
                "over a LogicalRDD — blocks were NOT released")
            return False
        leaf.rdd().unpersist(False)
        return True
    except Exception as exc:  # private-API drift: skip, but say so
        log.warning("release_checkpoint skipped (%s) — blocks were "
                    "NOT released", exc)
        return False
