"""The executed-plan audit as a CI gate (r08 verdict ask #3).

``scripts/audit_plans.py`` found the r07/r08 multi-derivation defects
by hand-sweeping the registry.  This module pins its accepted-flag set
EXACTLY, so any NEW multi-derivation plan (a consumer branch
re-deriving corpus lineage instead of reading a checkpoint), cartesian
product, or Python row eval fails pytest instead of waiting for the
next hand sweep.

Cost note: the audit BUILDS every registered plan, which executes the
eager-checkpoint subplans (materialization jobs) — ~2.5 min for the
full registry at sf0.001.  That is the price of gating the defect
class; keep sf0.001 (never a larger sf) as the audit input.
"""

from __future__ import annotations

import pytest

from kinesis_s3_data_shipper_spark.plans import REGISTRY, all_queries

SF = "/root/testdata/sf0.001"
THRESHOLD = 4

#: The triaged, accepted scan flags — each documented in its plan's
#: docstring (rule: a pruned re-SCAN of raw token/vector columns that
#: a checkpoint would have to materialize wholesale is accepted; a
#: re-derived corpus SHUFFLE is a defect).  Counts are pinned exactly:
#: plan growth shows up as a diff here, with the docstring explaining
#: the old number.  TEXTUAL counts (every Location: line in the plan
#: string) — a persisted subplan's one scan reprints under each
#: InMemoryTableScan consumer, so these grow with cache CONSUMERS;
#: the physical table below is the load-bearing one (r10 advice).
ACCEPTED_SCANS: dict[str, dict[str, int]] = {
    "dedup_minhash_lsh": {"documents": 4},
    "dedup_minhash_est_quality": {"documents": 4},
    # 18 textual after the r10c collapse (6 before): the cached
    # member-map scan reprints under each InMemoryTableScan — live
    # scans are members (once, then cached) + the toks re-derivations
    # (prefix pa/pb, verify ta/tb, sizes), each column-pruned.
    "dedup_setsim_prefix": {"documents": 18},
    # 16 TEXTUAL (12 in r11-r12), 7 physical (was 5): the r13
    # two-stage verify replaced the ga/gb string-gram sides with
    # ha/hb hashed-gram prefilter sides PLUS sa/sb survivor-text
    # sides — two extra rep-sized column-pruned re-scans, bought
    # deliberately: the candidate-economy record measured the old
    # string-array verify at ~75% of the operator's sf0.1 cost
    # (NGRAM_CANDIDATE_ECONOMY.json; 22.7 s -> 12.2 s end-to-end).
    "dedup_ngram_jaccard": {"documents": 16},
    # the group form: same two-stage core (7 physical live scans)
    # + the O(docs) projection's docs read and the member map
    # reprinting under best/scored/out consumers.
    "dedup_ngram_jaccard_groups": {"documents": 26},
    "dedup_containment": {"documents": 4},
    "ann_recall_eval": {"embeddings": 4},
    "ann_binary_hamming": {"embeddings": 4},
    "embedding_matryoshka_recall": {"embeddings": 4},
    "embedding_cosine_histogram": {"embeddings": 4},
    "text_fuzzy_match": {"documents": 4},
    "text_bm25_topk": {"documents": 4},
}

#: PHYSICAL counts for the same queries: post-cache-substitution —
#: each distinct InMemoryRelation's build subtree counted ONCE (it
#: scans parquet once, at materialization), reprints skipped.  This
#: is the number that measures real re-derivation: a genuine new
#: corpus re-scan moves THIS pin; a new cache consumer only moves the
#: textual one (r10 advice: the setsim 6 -> 18 textual jump was
#: reprint artifact masking, not work).
ACCEPTED_SCANS_PHYSICAL: dict[str, dict[str, int]] = {
    "dedup_minhash_lsh": {"documents": 1},
    "dedup_minhash_est_quality": {"documents": 3},
    "dedup_setsim_prefix": {"documents": 8},
    # 5 -> 7 / 10 -> 14 in r13: the two-stage verify's hashed
    # prefilter (ha/hb) and survivor-text (sa/sb) sides are four
    # rep-sized derivations where ga/gb were two — the re-scan-beats-
    # materialize trade, now applied twice, each column-pruned to
    # (doc_id, text).
    "dedup_ngram_jaccard": {"documents": 7},
    "dedup_ngram_jaccard_groups": {"documents": 14},
    "dedup_containment": {"documents": 3},
    "ann_recall_eval": {"embeddings": 4},
    "ann_binary_hamming": {"embeddings": 4},
    "embedding_matryoshka_recall": {"embeddings": 4},
    "embedding_cosine_histogram": {"embeddings": 4},
    "text_fuzzy_match": {"documents": 3},
    "text_bm25_topk": {"documents": 4},
}

#: Unpartitioned-window accepted set (r10 verdict ask #3): a Window
#: with an empty partition spec is a single-task global sort of its
#: input, so it is acceptable ONLY over provably tiny aggregate
#: frames.  Every entry below is one of those — the frame cardinality
#: is in parentheses; anything new here must be triaged the same way
#: (the r11 sweep caught embedding_cosine_histogram running its
#: 64-row sample draw as a row_number over the WHOLE vector corpus —
#: fixed to orderBy+limit, i.e. TakeOrderedAndProject).
ACCEPTED_UNPARTITIONED: dict[str, int] = {
    "source_mixture_weights": 1,       # |sources| rows
    "text_vocab_coverage": 1,          # top-100 limit runs FIRST
    "embedding_kcenter_step": 1,       # bottom-10 limit runs FIRST
    "embedding_dim_variance_prune": 1,  # |dims| = 64 rows
    "text_bpe_merge_step": 1,          # symbol-pair vocab (<= ~27^2)
    "text_bpe_merge_2step": 1,         # same frame, second merge
    "sample_stratified_neyman": 2,     # |strata| (langs) rows
    "profile_key_skew": 2,             # count-of-counts (checkpointed)
    "warehouse_partition_stats_skew": 1,  # |months| partitions
    "parts_skyline_pareto": 1,         # |p_size| groups (50)
    # r13: the EWMA fold inlines the monthly rollup (the pre-r13 plan
    # hid this same row_number-over-months window behind an eager
    # checkpoint, so the audit never saw it; the window itself is
    # unchanged).  |months| rows (~80 at any sf — group count of a
    # month-truncated date), the canonical tiny-aggregate class.
    "recursive_ewma_monthly": 1,
}

#: The one registered Python eval: the UDTF demonstrator, by design.
ACCEPTED_PYTHON: dict[str, int] = {"text_chunk_udtf": 1}

#: Loop-invariant expensive calls inside lambda bodies (the r12
#: CollapseProject let pitfall — split/sequence/regexp_* re-evaluated
#: once per collection element; r12 verdict ask #7).  EMPTY after the
#: r12 let-bind fixes: any new entry is a review-required O(n^2)
#: plan and must either be let-bound (operators/dedup.py::let) or
#: triaged here with the reason the re-evaluation is cheap.
ACCEPTED_INVARIANT_LAMBDA: dict[str, int] = {}


#: Confs the audit's pinned counts assume (the get_session values).
#: Pinned here because a PRIOR test leaking a changed conf (e.g. a
#: broadcast threshold restored via unset -> Spark's 10 MB default)
#: changes executed plans suite-wide and made this gate flag
#: differently in the full run than standalone.
_AUDIT_CONFS = {
    "spark.sql.autoBroadcastJoinThreshold": str(64 * 1024 * 1024),
    "spark.sql.adaptive.enabled": "true",
}


@pytest.fixture(scope="module")
def audit_results(spark):
    from scripts.audit_plans import audit
    all_queries()
    prev = {k: spark.conf.get(k) for k in _AUDIT_CONFS}
    for k, v in _AUDIT_CONFS.items():
        spark.conf.set(k, v)
    # The audit measures COLD plans (what scripts/audit_plans.py's
    # fresh session sees).  Earlier suite tests execute registered
    # queries whose multi-consumer persists legitimately stay in the
    # CacheManager; cache substitution then rewrites parts of a later
    # build's plan and breaks TEXTUAL exchange-reuse detection, so
    # scan counts drift (+2 on dedup_substring_spans/hybrid when
    # test_oracle_parity ran first).  That is session hygiene, not a
    # plan defect — clear it so the gate pins the canonical plans.
    spark.catalog.clearCache()
    try:
        flagged, errors = audit(spark, SF, threshold=THRESHOLD,
                                verbose=True)
    finally:
        for k, v in prev.items():
            spark.conf.set(k, v)
    assert not errors, {n: e.splitlines()[-1] for n, e in errors.items()}
    return flagged


def test_flagged_set_is_exactly_the_accepted_set(audit_results):
    expected = (set(ACCEPTED_SCANS) | set(ACCEPTED_PYTHON)
                | set(ACCEPTED_UNPARTITIONED)
                | set(ACCEPTED_INVARIANT_LAMBDA))
    assert set(audit_results) == expected, (
        sorted(set(audit_results) ^ expected))


def test_invariant_lambda_calls_pinned_exactly(audit_results):
    """r12 verdict ask #7: a new split/sequence/regexp_* call inside
    a lambda body that references no lambda variable (the exact
    signature of the two r12 O(words^2) finds) fails pytest as a
    review-required plan."""
    got = {n: c["invariant_lambda_calls"] for n, c in audit_results.items()
           if c["invariant_lambda_calls"]}
    assert got == ACCEPTED_INVARIANT_LAMBDA


def test_no_cartesian_products_anywhere(audit_results):
    assert not [n for n, c in audit_results.items() if c["cartesian"]]


def test_python_evals_only_the_registered_udtf(audit_results):
    got = {n: c["python"] for n, c in audit_results.items()
           if c["python"]}
    assert got == ACCEPTED_PYTHON


def test_accepted_scan_counts_pinned_exactly(audit_results):
    got = {n: c["per_source"] for n, c in audit_results.items()
           if n in ACCEPTED_SCANS}
    assert got == ACCEPTED_SCANS


def test_accepted_physical_scan_counts_pinned_exactly(audit_results):
    """The post-cache-substitution counts — the real-re-derivation
    signal the textual numbers dilute (r10 advice)."""
    got = {n: c["per_source_physical"] for n, c in audit_results.items()
           if n in ACCEPTED_SCANS_PHYSICAL}
    assert got == ACCEPTED_SCANS_PHYSICAL


def test_unpartitioned_windows_pinned_exactly(audit_results):
    """r10 verdict ask #3: a NEW unpartitioned window (a single-task
    corpus sort unless the frame is tiny) fails pytest instead of
    only WARNing at runtime."""
    got = {n: c["unpartitioned_windows"] for n, c in audit_results.items()
           if c["unpartitioned_windows"]}
    assert got == ACCEPTED_UNPARTITIONED


def test_detector_catches_an_injected_double_derivation(spark):
    """Prove the gate WOULD fire: a hand-built plan whose consumer
    branches re-derive the same scan lineage (the r07 graph defect in
    miniature) must cross the audit threshold."""
    import os

    from pyspark.sql import functions as F

    from scripts.audit_plans import audit_query

    docs = spark.read.parquet(os.path.join(SF, "documents.parquet"))
    base = docs.groupBy("lang").agg(F.count("*").alias("n"))
    bad = base
    for _ in range(THRESHOLD):  # union of N un-checkpointed branches
        bad = bad.unionAll(base)
    counts = audit_query(bad)
    assert max(counts["per_source"].values()) >= THRESHOLD


def test_detector_catches_an_injected_unpartitioned_window(spark):
    """Prove the window gate WOULD fire: a corpus-sized row_number
    with no partition spec (the embedding_cosine_histogram defect the
    r11 sweep caught, in miniature) must be counted — and its
    partitioned twin must NOT be."""
    import os

    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    from scripts.audit_plans import audit_query

    docs = spark.read.parquet(os.path.join(SF, "documents.parquet"))
    bad = docs.withColumn(
        "rk", F.row_number().over(W.orderBy("doc_id")))
    assert audit_query(bad)["unpartitioned_windows"] == 1
    good = docs.withColumn(
        "rk", F.row_number().over(W.partitionBy("lang").orderBy("doc_id")))
    assert audit_query(good)["unpartitioned_windows"] == 0
    # partition-without-order (2 bracket groups, no sort direction)
    # must not be mistaken for an order-only window
    agg = docs.withColumn(
        "s", F.sum("n_chars").over(W.partitionBy("lang")))
    assert audit_query(agg)["unpartitioned_windows"] == 0


def test_physical_counter_dedupes_cache_reprints(spark):
    """Prove the physical counter's cache substitution: one persisted
    aggregate consumed by three branches prints its build scan three
    times textually but physically scans parquet ONCE."""
    import os

    from pyspark.sql import functions as F

    from scripts.audit_plans import audit_query

    docs = spark.read.parquet(os.path.join(SF, "documents.parquet"))
    cached = docs.groupBy("lang").agg(F.count("*").alias("n")).persist()
    try:
        three = (cached.unionAll(cached)).unionAll(cached)
        counts = audit_query(three)
        assert counts["per_source"].get("documents", 0) == 3
        assert counts["per_source_physical"].get("documents", 0) == 1
    finally:
        cached.unpersist()


import glob as _glob
import os as _os
import tempfile as _tempfile

#: ksds* temp dirs that exist at MODULE IMPORT (before any test in
#: this file — in particular before the audit fixture builds every
#: plan).  Other processes (a concurrent sweep, the driver) may own
#: these; only dirs created after import are ours to account for.
#: Module-level, not a fixture: the module-scoped audit_results is
#: instantiated by the FIRST test that requests it, which runs before
#: any later fixture could snapshot.
_STAGING_BASELINE = set(
    _glob.glob(_os.path.join(_tempfile.gettempdir(), "ksds*")))


def test_registry_build_leaves_no_orphan_staging(audit_results):
    """r09 verdict ask #6 (the time-travel /tmp leak class,
    generalized): after a FULL registry build, every ksds* staging
    tree this process created must be registered with the atexit
    reaper — zero orphans that would outlive the process."""
    import glob
    import os
    import tempfile

    from kinesis_s3_data_shipper_spark.session import _STAGING_DIRS
    now = set(glob.glob(os.path.join(tempfile.gettempdir(), "ksds*")))
    orphans = (now - _STAGING_BASELINE) - set(_STAGING_DIRS)
    assert not orphans, sorted(orphans)


def test_staging_reaper_removes_registered_dirs():
    """The reaper itself works: a registered dir is gone after
    _reap_staging(), and re-reaping is a no-op."""
    import os

    from kinesis_s3_data_shipper_spark.session import (_reap_staging,
                                                       staging_dir)
    d = staging_dir("ksds_reaptest_")
    assert os.path.isdir(d)
    _reap_staging()
    assert not os.path.exists(d)
    _reap_staging()  # idempotent
