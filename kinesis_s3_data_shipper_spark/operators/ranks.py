"""Distributed exact order statistics — global ranks with NO
unpartitioned window.

An unpartitioned ``Window.orderBy(...)`` funnels the whole input
through ONE task: the classic 100 TB scale-killer. This module
computes exact global ranks the way a distributed engine must:

1. **Sample** the order columns with a deterministic hash gate
   (one scan, filter pushed to the scan side, no shuffle);
2. pick **range boundaries** from the sample on the driver (bounded:
   ``~n/sample_mod`` rows — exactly Spark's own RangePartitioner
   sketch, which also collects its sample to the driver);
3. assign each row a **range-partition id** with a pure row-local
   expression (composite lexicographic compares against the boundary
   literals — deterministic, retry/recompute-safe: no dependence on
   physical partitioning, unlike ``repartitionByRange`` whose sampled
   boundaries can shift between executions);
4. **count** rows per range (one scan + a ≤num_parts-row agg) and
   cumsum the counts into per-range rank offsets on the driver;
5. final rank = offset[pid] + ``row_number()`` over a window
   **partitioned by pid** — a within-range sort of ~n/num_parts rows
   per task, never a global one.

Cost: two prep jobs (sample, counts) + one ranked plan. Callers that
rank an expensive derived frame should materialize it first
(``localCheckpoint``) so the prep jobs don't recompute it.

Order columns must be non-null (all callers rank keys / aggregates).
Reference parity: the reference engine has no distributed ranker (it
is a serial script); this is the Spark-native machinery behind
compute_range_splits and customer_rfm_segments.
"""

from __future__ import annotations

import math
from functools import reduce

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

#: (column, direction) — direction is "asc" or "desc".
OrderSpec = tuple[str, str]


def _order_columns(specs: list[OrderSpec]) -> list[Column]:
    return [F.col(c).desc() if d == "desc" else F.col(c).asc()
            for c, d in specs]


def _after(specs: list[OrderSpec], boundary: tuple) -> Column:
    """Row sorts STRICTLY AFTER `boundary` in the total order."""
    cond = F.lit(False)
    eq = F.lit(True)
    for (c, d), bv in zip(specs, boundary):
        col = F.col(c)
        gt = (col < F.lit(bv)) if d == "desc" else (col > F.lit(bv))
        cond = cond | (eq & gt)
        eq = eq & (col == F.lit(bv))
    return cond


def auto_sample_mod(n: int, num_parts: int, *,
                    target_per_part: int = 1024) -> int:
    """Power-of-two hash-gate modulus that keeps the boundary sample
    near ``num_parts * target_per_part`` rows whatever n is — the
    bound that makes the driver-side sample collect safe at any
    corpus size (Spark's RangePartitioner sizes its sketch the same
    way). n is usually one parquet-metadata count away."""
    target = max(1, num_parts * target_per_part)
    if n <= target:
        return 1
    return 2 ** int(math.log2(n / target))


def sample_order_keys(df: DataFrame, specs: list[OrderSpec], *,
                      sample_mod: int, seed: int = 41) -> list[tuple]:
    """Deterministic ~1/sample_mod sample of the order-column tuples,
    sorted in the total order. One scan; the gate is a cheap row-local
    xxhash64 so the sample is uniform regardless of key distribution
    and identical across retries (rand() is neither)."""
    cols = [c for c, _ in specs]
    sampled = df.select(*cols)
    if sample_mod > 1:
        gate = F.pmod(F.xxhash64(*[F.col(c) for c in cols], F.lit(seed)),
                      F.lit(sample_mod)) == 0
        sampled = sampled.filter(gate)
    return sort_sample([tuple(r) for r in sampled.collect()], specs)


class _Rev:
    """Reverse-comparison wrapper so driver-side sorts honor DESC."""

    __slots__ = ("v",)

    def __init__(self, v):
        self.v = v

    def __lt__(self, other):
        return other.v < self.v

    def __eq__(self, other):
        return self.v == other.v


def sort_sample(rows: list[tuple], specs: list[OrderSpec]) -> list[tuple]:
    """Driver-side sort of raw order-key tuples in the `specs` total
    order (DESC columns honored via the reverse-comparison wrapper).
    For callers that collected their own sample rows and need them in
    boundary-pick order."""
    def keyf(t: tuple):
        return tuple(_Rev(v) if d == "desc" else v
                     for v, (_, d) in zip(t, specs))

    return sorted(rows, key=keyf)


def splits_from_sample(sample: list[tuple], num_parts: int) -> list[tuple]:
    """num_parts-1 boundary tuples at the sample's i/num_parts
    quantiles (ceil(q*m) discrete pick, 1-based — the same convention
    as compute_range_splits / agg_quantiles). Deduplicated; may return
    fewer boundaries (degenerate/tiny samples → fewer, fatter ranges,
    never wrong ranks)."""
    m = len(sample)
    out: list[tuple] = []
    for i in range(1, num_parts):
        if m == 0:
            break
        b = sample[min(m, math.ceil(i * m / num_parts)) - 1]
        if not out or b != out[-1]:
            out.append(b)
    return out


def range_pid(specs: list[OrderSpec], boundaries: list[tuple], *,
              unroll: bool = False) -> Column:
    """Range-partition id (0-based) as a pure row expression: the
    number of boundaries this row sorts strictly after.

    Two spellings of the same arithmetic, because the cost structure
    inverts with input size (both measured at 31 boundaries):

    - ``unroll=False`` (default): ONE array-of-structs literal folded
      by a single ``aggregate`` lambda — O(1) expression tree, near-
      zero analysis/codegen cost, but the HOF evaluator is
      interpreted per element. Right for modest row counts (the RFM
      per-customer aggregate: 3 metrics x 31 boundaries unrolled
      cost 7-13 s of analysis+codegen; the fold took it to ~0).
    - ``unroll=True``: per-boundary CASE chain inside WholeStageCodegen
      — pays ~1 s of compile once, then runs JVM-hot. Right for
      large tables (600k-row lineitem: the fold's 18M interpreted
      lambda steps measured 2-3x slower end-to-end than the unrolled
      form).

    Same winner either way; tests assert both against a global-window
    brute force."""
    if not boundaries:
        return F.lit(0)
    if unroll:
        return reduce(lambda a, b: a + b,
                      [F.when(_after(specs, bv), 1).otherwise(0)
                       for bv in boundaries]).cast("int")
    arr = F.array(*[
        F.struct(*[F.lit(v).alias(f"c{i}") for i, v in enumerate(bv)])
        for bv in boundaries])

    def after(b: Column) -> Column:
        cond = F.lit(False)
        eq = F.lit(True)
        for i, (c, d) in enumerate(specs):
            col = F.col(c)
            bv = b[f"c{i}"]
            gt = (col < bv) if d == "desc" else (col > bv)
            cond = cond | (eq & gt)
            eq = eq & (col == bv)
        return cond

    return F.aggregate(
        arr, F.lit(0),
        lambda acc, b: acc + F.when(after(b), 1).otherwise(0)).cast("int")


def rank_offsets(df: DataFrame, pid: Column) -> tuple[dict[int, int], int]:
    """Exclusive cumulative row counts per range id: one scan + a
    ≤num_parts-row aggregate collected to the driver. Returns
    ({pid: offset}, total_rows). Deterministic and recompute-safe
    because `pid` is a pure function of row values."""
    counts = {int(r["p"]): r["c"] for r in
              df.select(pid.alias("p")).groupBy("p")
                .agg(F.count("*").alias("c")).collect()}
    offsets: dict[int, int] = {}
    acc = 0
    for p in sorted(counts):
        offsets[p] = acc
        acc += counts[p]
    return offsets, acc


def attach_global_rank(df: DataFrame, specs: list[OrderSpec], *,
                       rank_col: str, num_parts: int = 32,
                       sample_mod: int = 16, pid_unroll: bool = False,
                       precomputed: tuple[list[tuple], dict[int, int]] | None = None,
                       ) -> tuple[DataFrame, int]:
    """Add exact 1-based global rank `rank_col` in the `specs` total
    order. Returns (ranked_df, total_rows). The plan contains only a
    pid-PARTITIONED window; the two driver collects are the bounded
    sample and the ≤num_parts count rows.

    `precomputed=(boundaries, offsets)` lets callers that already ran
    the prep jobs (or tests forcing degenerate geometry) skip them.
    """
    if precomputed is None:
        sample = sample_order_keys(df, specs, sample_mod=sample_mod)
        boundaries = splits_from_sample(sample, num_parts)
        offsets, total = rank_offsets(
            df, range_pid(specs, boundaries, unroll=pid_unroll))
    else:
        boundaries, offsets = precomputed
        total = -1
    pid = range_pid(specs, boundaries, unroll=pid_unroll)
    pid_name = f"_pid_{rank_col}"
    off = (F.element_at(
        F.create_map(*[F.lit(x) for p, o in sorted(offsets.items())
                       for x in (p, o)]),
        F.col(pid_name))
        if offsets else F.lit(0))
    w = Window.partitionBy(pid_name).orderBy(*_order_columns(specs))
    ranked = (df.withColumn(pid_name, pid)
              .withColumn(rank_col,
                          (off + F.row_number().over(w)).cast("long"))
              .drop(pid_name))
    return ranked, total


#: r13 (optimization round): probe results keyed by (applicationId, n).
#: The token map is a property of SPARK'S HASH FUNCTION, not of any
#: data — murmur3 is deterministic, so within one application the
#: probe (a driver collect + a validation job) is pure recomputation
#: of a session constant.  Memoizing it drops 2 scheduled jobs from
#: every compaction after the first (maintenance_compact_roundtrip and
#: warehouse_lifecycle each compact once per call; the sweep/bench run
#: them repeatedly in one session).  Not result caching: no query data
#: flows through this map, and a fresh application re-probes.
_IDENTITY_TOKENS_CACHE: dict[tuple[str, int], dict[int, int]] = {}


def identity_partition_tokens(spark, n: int) -> dict[int, int]:
    """For each partition index t in [0, n): an int token whose Spark
    hash lands exactly on partition t under ``repartition(n, col)``
    (HashPartitioning = pmod(murmur3, n)). Lets a DataFrame be
    partitioned by an EXPLICIT partition id — Spark's public API only
    hash-partitions, which maps ids to partitions with collisions —
    by routing each id through its probed token. Found empirically
    with one bounded driver job (coupon-collector, ~n·ln n probes);
    deterministic because murmur3 is — and therefore memoized per
    (application, n), see _IDENTITY_TOKENS_CACHE.

    The probe equates ``F.hash`` (murmur3) with the placement
    ``repartition(n, col)`` actually uses — true today, but that is
    an internal Spark implementation detail, not a public contract.
    So before returning, every token is round-tripped through a REAL
    ``repartition(n, col)`` + ``spark_partition_id()`` (one tiny
    n-row job): if a Spark upgrade ever changes the hash seed or
    placement, callers get a loud error here instead of a silently
    degraded one-range-per-file layout. The reproducible-layout test
    (tests/test_compaction.py) guards the same invariant end-to-end.
    """
    from pyspark.sql import functions as F
    app_id = spark.sparkContext.applicationId
    cache_key = (app_id, n)
    cached = _IDENTITY_TOKENS_CACHE.get(cache_key)
    if cached is not None:
        return dict(cached)
    # Evict entries from dead applications on insert (r13 advice): the
    # cache is keyed by applicationId, so in a long-lived process that
    # creates many sessions, stale apps' token maps would otherwise
    # accumulate unboundedly.  Keeping only the LIVE application also
    # re-asserts the cache's contract: hash-placement tokens for this
    # SparkContext, never data.
    for stale in [k for k in _IDENTITY_TOKENS_CACHE if k[0] != app_id]:
        del _IDENTITY_TOKENS_CACHE[stale]
    need = set(range(n))
    tokens: dict[int, int] = {}
    base = 0
    while need:
        batch = max(64, 4 * n)
        rows = (spark.range(base, base + batch)
                .select(F.col("id").cast("int").alias("tok"),
                        F.pmod(F.hash(F.col("id").cast("int")),
                               F.lit(n)).alias("t")).collect())
        for r in rows:
            if r.t in need:
                tokens[r.t] = r.tok
                need.discard(r.t)
        base += batch
    from ..functions.values import values_df
    placed = (values_df(spark,
                        [(t, tok) for t, tok in tokens.items()],
                        "expected int, tok int")
              .repartition(n, F.col("tok"))
              .select("expected", F.spark_partition_id().alias("actual")))
    misplaced = placed.filter(F.col("actual") != F.col("expected")).count()
    if misplaced:
        raise RuntimeError(
            f"identity_partition_tokens: {misplaced}/{n} probed tokens "
            "did not land on their expected partition — this Spark "
            "version's HashPartitioning no longer matches "
            "pmod(F.hash(col), n); deterministic layouts need a new "
            "probe strategy")
    _IDENTITY_TOKENS_CACHE[cache_key] = dict(tokens)
    return tokens


def ntile_ends(n: int, k: int) -> list[int]:
    """The last global rank in each of ntile(k)'s first k-1 buckets
    (SQL ntile: the first n%k buckets get the extra row), so
    bucket(rank) = 1 + #{e in ends : rank > e} reproduces ntile
    EXACTLY from ranks — no global-sort window needed."""
    q, r = divmod(n, k)
    return [b * q + min(b, r) for b in range(1, k)]


def bucket_from_rank(rank_col: str, ends: list[int]) -> Column:
    """ntile bucket number from an exact global rank column."""
    return reduce(lambda a, b: a + b,
                  [F.when(F.col(rank_col) > e, 1).otherwise(0)
                   for e in ends],
                  F.lit(1)).cast("long")


def attach_prefix_sum(df: DataFrame, specs: list[OrderSpec], *,
                      weight_col: str | None = None,
                      out_col: str | None = None,
                      weights: dict[str, str] | None = None,
                      num_parts: int = 32,
                      sample_mod: int = 16) -> DataFrame:
    """Add the exact global EXCLUSIVE prefix sum of ``weight_col`` in
    the ``specs`` total order — the weighted generalization of
    :func:`attach_global_rank` (rank = prefix sum of weight 1), and
    the distributed form of ``SUM(w) OVER (ORDER BY ... ROWS BETWEEN
    UNBOUNDED PRECEDING AND 1 PRECEDING)``, which as written funnels
    everything through one task. Same machinery: sampled range
    boundaries, pure-expression pid, per-range WEIGHT TOTALS cumsummed
    into offsets on the driver (a ≤num_parts-row collect), then a
    pid-partitioned running sum. Weights must be integral (exact
    driver cumsum; callers sum counts, never floats).

    Pass ``weights={out_col: weight_col, ...}`` to attach SEVERAL
    prefix sums in ONE pass: one sample, one totals collect (all sums
    in one agg), one Window operator evaluating every running sum
    over the same pid sort — the N-statistics case (e.g. both
    cumulative distribution numerators of a KS test) costs the same
    plan as one."""
    if weights is None:
        assert weight_col is not None and out_col is not None
        weights = {out_col: weight_col}
    sample = sample_order_keys(df, specs, sample_mod=sample_mod)
    boundaries = splits_from_sample(sample, num_parts)
    pid = range_pid(specs, boundaries)
    wcols = list(weights.values())
    rows = (df.select(pid.alias("p"), *wcols)
            .groupBy("p")
            .agg(*[F.sum(c).alias(c) for c in wcols]).collect())
    totals = {int(r["p"]): {c: int(r[c]) for c in wcols} for r in rows}
    offsets: dict[int, dict[str, int]] = {}
    acc = {c: 0 for c in wcols}
    for p in sorted(totals):
        offsets[p] = dict(acc)
        for c in wcols:
            acc[c] += totals[p][c]
    pid_name = "_pid_prefix"
    out = df.withColumn(pid_name, pid)
    w = (Window.partitionBy(pid_name).orderBy(*_order_columns(specs))
         .rowsBetween(Window.unboundedPreceding, -1))
    for ocol, wcol in weights.items():
        off = (F.element_at(
            F.create_map(*[F.lit(x) for p, o in sorted(offsets.items())
                           for x in (p, o[wcol])]),
            F.col(pid_name))
            if offsets else F.lit(0))
        out = out.withColumn(
            ocol, (off + F.coalesce(F.sum(wcol).over(w), F.lit(0)))
            .cast("long"))
    return out.drop(pid_name)
