"""The iterative-checkpoint stats firewall (operators/checkpoint.py).

``Dataset.localCheckpoint`` copies the origin plan's estimated
statistics into the new LogicalRDD, and join estimation MULTIPLIES
children's sizeInBytes — so a loop that checkpoints each round's
output (built from the previous round's checkpoints) compounds the
BigInt estimate exponentially in the round count, and the driver ends
up burning seconds-per-round on BigInteger arithmetic inside the stats
visitor (the round-9 Louvain finding: 98 s -> 10 s for 6 levels).
These tests pin the firewall: a chained truncated_checkpoint keeps a
BOUNDED size estimate where the plain localCheckpoint chain provably
explodes, and the wrapped frame still reads the same persisted blocks.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from kinesis_s3_data_shipper_spark.operators.checkpoint import (
    release_checkpoint, truncated_checkpoint)

ROUNDS = 4


def _one_round(cur):
    # Two self-joins per round — the louvain/cund shape whose size
    # estimate is the PRODUCT of three children.
    a = cur.select(F.col("k"), F.col("v").alias("va"))
    b = cur.select(F.col("k"), F.col("v").alias("vb"))
    return (cur.join(a, "k").join(b, "k")
            .select("k", (F.col("v") + F.col("va") + F.col("vb"))
                    .alias("v")))


def _size_bits(df) -> int:
    # py4j converts the scala BigInt to a Python int directly.
    return int(df._jdf.queryExecution().optimizedPlan().stats()
               .sizeInBytes()).bit_length()


def test_chained_truncated_checkpoints_keep_bounded_stats(spark):
    base = spark.range(50).selectExpr("id as k", "id as v")
    cur = truncated_checkpoint(base)
    for _ in range(ROUNDS):
        cur = truncated_checkpoint(_one_round(cur))
    # Long.MaxValue-scale default estimate: well under 128 bits.  The
    # unfirewalled chain triples-or-worse its bit-length per round
    # (asserted below), so a lapsed firewall fails this loudly.
    assert _size_bits(cur) < 128


def test_plain_localcheckpoint_chain_explodes_without_firewall(spark):
    """The hazard is real in THIS Spark version: the raw chain's
    estimate grows superlinearly per round.  If a Spark upgrade fixes
    stat inheritance, this test starts failing — then the firewall
    (and this pair of tests) can be retired."""
    base = spark.range(50).selectExpr("id as k", "id as v")
    cur = base.localCheckpoint(eager=True)
    bits = []
    for _ in range(3):
        cur = _one_round(cur).localCheckpoint(eager=True)
        bits.append(_size_bits(cur))
    assert bits[-1] > 2 * bits[0] and bits[-1] > 200, bits


def test_wrapped_frame_reads_the_same_blocks(spark):
    base = spark.range(100).selectExpr("id as k", "id as v")
    w = truncated_checkpoint(base)
    assert w.count() == 100
    assert sorted(r.k for r in w.collect()) == list(range(100))
    release_checkpoint(w)


def test_firewall_canary_wrap_is_live_not_fallback(spark):
    """r09 verdict ask #2: truncated_checkpoint rides the private
    ``internalCreateDataFrame``; if a Spark upgrade moves it, the
    except-fallback silently returns the PLAIN checkpoint (correct but
    re-exposing the 98 s deep-loop driver stall).  This canary fails
    the suite the moment that happens: a single wrap of a join-product
    frame must report the default leaf estimate, strictly below the
    inherited product the plain checkpoint carries."""
    base = spark.range(50).selectExpr("id as k", "id as v")
    joined = _one_round(base)
    plain_bits = _size_bits(joined.localCheckpoint(eager=True))
    wrapped = truncated_checkpoint(joined)
    wrapped_bits = _size_bits(wrapped)
    # A LIVE wrap reports the default leaf estimate (Long.MaxValue,
    # 63 bits) because internalCreateDataFrame attaches no stats; the
    # FALLBACK (plain localCheckpoint) inherits the origin's computed
    # estimate instead.  plain_bits < 63 proves inheritance really
    # happens on this Spark version, so the equality isn't vacuous.
    assert plain_bits < 63, plain_bits
    assert wrapped_bits == 63, (wrapped_bits, plain_bits)
    # and the wrap really is a bare LogicalRDD leaf
    assert (wrapped._jdf.queryExecution().analyzed().getClass()
            .getSimpleName()) == "LogicalRDD"
    release_checkpoint(wrapped)


def test_release_unwraps_unary_derivations(spark):
    """r09 advice (medium): every checkpoint-per-round loop tags a
    convergence column and releases ``ckpt.drop(tag)`` — a Project
    over the LogicalRDD.  The release must unwrap to the leaf and
    actually free the blocks (returns True), not silently no-op."""
    jsc = spark.sparkContext._jsc.sc()
    before = jsc.getPersistentRDDs().size()
    ckpt = truncated_checkpoint(
        spark.range(40).selectExpr("id as k", "id as v",
                                   "id % 2 as _changed"))
    derived = ckpt.drop("_changed").select("k", "v")
    assert release_checkpoint(derived) is True
    assert jsc.getPersistentRDDs().size() == before


def test_release_refuses_multi_child_plans(spark):
    """A join of two checkpoints is not a unary chain over ONE leaf;
    releasing either would be a guess.  Must return False (and warn),
    never raise, never release."""
    jsc = spark.sparkContext._jsc.sc()
    a = truncated_checkpoint(spark.range(10).selectExpr("id as k"))
    b = truncated_checkpoint(spark.range(10).selectExpr("id as k"))
    live = jsc.getPersistentRDDs().size()
    assert release_checkpoint(a.join(b, "k")) is False
    assert jsc.getPersistentRDDs().size() == live
    release_checkpoint(a)
    release_checkpoint(b)


def test_observe_metric_fires_during_checkpoint_materialization(spark):
    """r13 optimization pin: the graph fixpoint loops fuse their
    convergence aggregate into the per-round checkpoint via
    ``observe()`` — one job per round instead of two.  That relies on
    ``localCheckpoint(eager=True)`` counting as the action that
    populates the Observation (for the plain AND the DISK_ONLY
    storage-level path).  A Spark upgrade that stops delivering
    metrics for the checkpoint action must fail HERE, not stall a
    fixpoint loop waiting on ``obs.get``."""
    from pyspark.sql import Observation
    from pyspark.storagelevel import StorageLevel

    for level in (None, StorageLevel.DISK_ONLY):
        obs = Observation()
        df = (spark.range(100)
              .selectExpr("id as k", "id % 7 as gain")
              .observe(obs, F.sum("gain").alias("total_gain"),
                       F.count(F.when(F.col("k") % 2 == 0, 1))
                       .alias("n_changed")))
        ckpt = (truncated_checkpoint(df) if level is None
                else truncated_checkpoint(df, level))
        got = obs.get
        assert got["total_gain"] == sum(i % 7 for i in range(100))
        assert got["n_changed"] == 50
        # The checkpointed frame is intact and readable afterwards.
        assert ckpt.count() == 100
        release_checkpoint(ckpt)
