"""Physical-plan assertions: the scale properties each operator is
designed around must actually appear in the executed plan — filters
pushed to the parquet scan, column pruning, broadcast joins for dim
tables, partial (map-side) aggregation, top-k without a global sort.
A regression here is a 100 TB performance bug even when results stay
correct, so it's tested like correctness.
"""

from __future__ import annotations

import pytest

from kinesis_s3_data_shipper_spark.plans import REGISTRY, all_queries

all_queries()

SF = "/root/testdata/sf0.001"


def plan_of(spark, name: str) -> str:
    df = REGISTRY[name].spark(spark, SF)
    return df._jdf.queryExecution().executedPlan().toString()


def test_filter_pushdown_and_pruning(spark):
    plan = plan_of(spark, "filter_project_scalar")
    assert "PushedFilters: [" in plan
    assert "GreaterThan(p_size,10)" in plan
    # Column pruning: untouched wide columns must not be read.
    assert "p_retailprice" in plan
    assert "p_container" not in plan


def test_q3_broadcasts_dimension(spark):
    plan = plan_of(spark, "q3_shipping_priority")
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_q5_snowflake_broadcasts(spark):
    plan = plan_of(spark, "q5_region_revenue")
    # nation/region/supplier ride broadcasts; no cartesian anywhere.
    assert plan.count("BroadcastHashJoin") >= 3
    assert "CartesianProduct" not in plan


def test_agg_is_partial_final(spark):
    plan = plan_of(spark, "events_hourly")
    # Two HashAggregates (partial + final) around one Exchange.
    assert plan.count("HashAggregate") >= 2
    assert "partial_count" in plan or "partial" in plan


def test_sort_limit_is_topk(spark):
    plan = plan_of(spark, "sort_limit")
    # Global top-100 must be TakeOrderedAndProject, not a full sort.
    assert "TakeOrderedAndProject" in plan


def test_ann_bruteforce_broadcasts_queries(spark):
    plan = plan_of(spark, "ann_bruteforce_topk")
    assert "BroadcastNestedLoopJoin" in plan
    assert "CartesianProduct" not in plan


def test_dedup_exact_hash_single_shuffle(spark):
    plan = plan_of(spark, "dedup_exact_hash")
    # One shuffle for the digest groupBy (plus AQE reads) — the full
    # text column must not appear in the exchange.
    assert plan.count("Exchange hashpartitioning") == 1


def test_anti_join_stays_hash(spark):
    plan = plan_of(spark, "join_anti")
    assert "LeftAnti" in plan
    assert "CartesianProduct" not in plan


@pytest.mark.parametrize("name", ["q1_pricing_summary", "events_hourly",
                                  "join_inner_agg", "text_quality",
                                  "text_classifier_score",
                                  "text_vocab_coverage",
                                  "profile_table_stats"])
def test_no_python_udfs_in_core_queries(spark, name):
    """Core relational/text queries must stay entirely JVM-side
    (BatchEvalPython / ArrowEvalPython = a Python worker in the hot
    path; only the ingest splitter and multimodal decode may use one)."""
    plan = plan_of(spark, name)
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan


def test_q6_predicates_reach_scan(spark):
    plan = plan_of(spark, "q6_forecast_revenue")
    # All four predicates push to the parquet reader (row-group
    # skipping at scale); untouched wide columns are pruned.
    assert "PushedFilters: [" in plan
    assert "l_shipdate" in plan.split("PushedFilters")[1][:400]
    assert "l_partkey" not in plan


def test_q17_broadcasts_brand_dim(spark):
    plan = plan_of(spark, "q17_small_qty_revenue")
    # The brand-filtered part dim and the per-part threshold both ride
    # broadcasts — lineitem is never shuffled for the join.
    assert plan.count("BroadcastHashJoin") >= 2
    assert "CartesianProduct" not in plan


def test_q4_exists_is_semi_join(spark):
    plan = plan_of(spark, "q4_exists_priority")
    assert "LeftSemi" in plan
    assert "CartesianProduct" not in plan


def test_sampling_is_scan_side(spark):
    # The hash gate is one projection+filter over the scan: no shuffle
    # at all in the sampled-rows plan (Exchange only above, for AQE's
    # final coalesce of results, never hashpartitioning).
    plan = plan_of(spark, "sample_hash_stratified")
    assert "Exchange hashpartitioning" not in plan
    assert "BatchEvalPython" not in plan


def test_quality_filter_stays_jvm(spark):
    plan = plan_of(spark, "text_quality_filter")
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan
    assert "Exchange hashpartitioning" not in plan


def test_pii_scrub_stays_jvm(spark):
    plan = plan_of(spark, "text_pii_scrub")
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan


def test_q14_q19_broadcast_part_dim(spark):
    for name in ("q14_promo_revenue_share", "q19_disjunctive_revenue"):
        plan = plan_of(spark, name)
        assert "BroadcastHashJoin" in plan, name
        assert "CartesianProduct" not in plan, name
        # lineitem is never shuffled for these joins: the only
        # hash-partition exchange allowed would be the final 1-row agg.
        assert plan.count("Exchange hashpartitioning") == 0, name


def test_full_outer_preaggregates_before_join(spark):
    plan = plan_of(spark, "join_full_outer")
    assert "FullOuter" in plan
    # Both sides aggregate BEFORE the join (4 HashAggregates: partial+
    # final per side) so the join input is distinct dates, not rows.
    assert plan.count("HashAggregate") >= 4
    assert "CartesianProduct" not in plan


def test_embedding_dedup_shape(spark):
    plan = plan_of(spark, "dedup_embedding_cosine")
    # The dup map rides a broadcast back onto the corpus; the bucket
    # self-join is the only quadratic work and stays JVM-side.
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan


def test_gap_fill_window_reuses_partitioning(spark):
    plan = plan_of(spark, "events_gap_fill")
    # Spine explode is narrow; the fill window runs per user. No
    # cartesian, no Python, and the explode (Generate) sits below the
    # join rather than forcing an extra exchange of its own.
    assert "Generate explode" in plan
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan


def test_training_pipeline_single_dedup_shuffle(spark):
    plan = plan_of(spark, "pipeline_training_data")
    # The quality gate must evaluate scan-side (a Filter directly over
    # the file scan), the dedup window partitions by text once, and
    # nothing falls back to Python.
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan
    assert "CartesianProduct" not in plan


def test_q8_all_dims_broadcast(spark):
    plan = plan_of(spark, "q8_market_share")
    # Seven joins; every dimension (part, supplier, customer, nation x2,
    # region) rides a broadcast — lineitem is never shuffled for a join.
    assert plan.count("BroadcastHashJoin") >= 6
    assert "CartesianProduct" not in plan


def test_q10_topk_without_global_sort(spark):
    plan = plan_of(spark, "q10_returned_revenue")
    assert "TakeOrderedAndProject" in plan
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_zscore_stats_broadcast_back(spark):
    plan = plan_of(spark, "events_anomaly_zscore")
    # The per-type stats join back onto the scan as a broadcast; the
    # only hash-partition exchange is the stats aggregation itself.
    assert "BroadcastHashJoin" in plan
    assert plan.count("Exchange hashpartitioning") <= 1


def test_q2_window_min_not_self_join(spark):
    # The correlated-MIN is a window over one partkey shuffle — the
    # offer aggregate must NOT be joined against itself.
    plan = plan_of(spark, "q2_min_cost_supplier")
    assert "Window" in plan
    assert plan.count("BroadcastHashJoin") >= 4
    assert "CartesianProduct" not in plan
    assert "SortMergeJoin" not in plan


def test_q9_single_fact_shuffle(spark):
    # part/supplier/nation broadcast; lineitem-orders is the only
    # join shuffle, then the 2-key agg.
    plan = plan_of(spark, "q9_product_profit")
    assert plan.count("BroadcastHashJoin") >= 3
    assert "CartesianProduct" not in plan


def test_q11_threshold_broadcast_back(spark):
    # The 1-row threshold joins back via broadcast-nested-loop (it's a
    # non-equi comparison), never a shuffled join.
    plan = plan_of(spark, "q11_important_stock")
    assert "BroadcastNestedLoopJoin" in plan
    assert "SortMergeJoin" not in plan


def test_q16_not_in_is_broadcast_anti(spark):
    plan = plan_of(spark, "q16_supplier_cnt")
    assert "BroadcastHashJoin" in plan
    # NOT IN on a non-null key plans as LeftAnti, not a full join.
    assert "LeftAnti" in plan


def test_q20_semi_join_and_window(spark):
    plan = plan_of(spark, "q20_excess_suppliers")
    assert "LeftSemi" in plan
    assert "Window" in plan
    assert "CartesianProduct" not in plan


def test_funnel_reuses_user_partitioning(spark):
    # The three funnel steps all key on user_id; the step joins must
    # ride the aggregation's partitioning, and the final 1-row count
    # combine is broadcast — never a shuffled or cartesian join of
    # event rows.
    plan = plan_of(spark, "events_funnel")
    assert "BroadcastNestedLoopJoin" in plan
    assert "CartesianProduct" not in plan
    # v/c step aggregates are eagerly localCheckpointed so each feeds
    # two consumers from materialized blocks instead of recomputing
    # the events scan — and, unlike persist, the blocks' lifetime ends
    # with the DataFrame (no cached blocks outlive the query call).
    assert "Scan ExistingRDD" in plan
    assert "InMemoryTableScan" not in plan


def test_retention_cohort_two_aggs_one_key(spark):
    plan = plan_of(spark, "events_retention_cohort")
    assert "CartesianProduct" not in plan
    # first-seen agg, distinct, join, final agg — all but the final
    # (cohort,offset) agg share the user_id partitioning.
    assert plan.count("Exchange hashpartitioning") <= 4


def test_balance_classes_no_class_window(spark):
    # The rebalance gate must be a broadcast of per-class rates + a
    # scan-side filter — never a rank/window over the class partition
    # (a 100 TB majority class would funnel into one partition).
    plan = plan_of(spark, "sample_balance_classes")
    assert "BroadcastHashJoin" in plan
    assert "Window" not in plan


def test_mode_ranks_counts_not_rows(spark):
    # The mode window must sit ABOVE the (user,type) count aggregate:
    # aggregate first, then rank <=5 rows per user.
    plan = plan_of(spark, "agg_mode_per_user")
    agg_pos = plan.find("HashAggregate")
    win_pos = plan.find("Window")
    assert agg_pos != -1 and win_pos != -1
    # executedPlan prints top-down: Window appears before (above) the
    # aggregate feeding it.
    assert win_pos < agg_pos


def test_fuzzy_match_blocked_join(spark):
    # The quadratic compare must ride the length-bucket equi-join —
    # no cartesian product of the whole corpus.
    plan = plan_of(spark, "text_fuzzy_match")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_pagerank_three_node_shuffles(spark):
    # Edge dedup, outdegree, and the contribution sum are the only
    # hash shuffles; the outdegree join rides the edge partitioning
    # or a broadcast — never a cartesian.  The deduped edge list is
    # materialized once (r08: the graph-family single-derivation
    # rule), so the final plan reads RDD blocks, never parquet.
    plan = plan_of(spark, "graph_pagerank_iter")
    assert "CartesianProduct" not in plan
    assert plan.count("HashAggregate") >= 4  # partial+final x2 at least
    assert plan.count("Scan parquet") == 0
    assert "Scan ExistingRDD" in plan


def test_lsh_probe_is_bucket_equijoin(spark):
    # The probe must be an equi-join on the bucket key (broadcast of
    # the capped query side) — never a cross join of the corpus.
    plan = plan_of(spark, "ann_lsh_probe")
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan


def test_ivf_probe_is_cluster_equijoin(spark):
    plan = plan_of(spark, "ann_ivf_probe")
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_pq_adc_broadcasts_query_luts(spark):
    # ADC scoring joins the corpus codes against the broadcast per-
    # query lookup tables; the corpus is never shuffled for the join.
    plan = plan_of(spark, "ann_pq_adc")
    assert "BroadcastNestedLoopJoin" in plan
    assert "CartesianProduct" not in plan
    assert "SortMergeJoin" not in plan


def test_semdedup_blocked_pairs(spark):
    # Within-cluster pair verify rides the cluster equi-join; the dup
    # map broadcasts back onto the corpus.
    plan = plan_of(spark, "semdedup_kmeans")
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan


def test_sketch_merge_rolls_up_partials(spark):
    # Sketch build (hour,type) + merge (type) + exact distinct: all
    # hash aggregates with partial/final split; the estimate joins
    # back via broadcast, never a shuffled join of raw events.
    plan = plan_of(spark, "agg_sketch_merge_hll")
    assert plan.count("HashAggregate") >= 4
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_runtime_bloom_filter_join_pruning(spark, sf_small):
    """Catalyst's runtime bloom-filter injection: a selective non-
    broadcast join must plant a bloom_filter_agg on the build side and
    a might_contain probe filter on the fact scan side — rows that
    can't join die before the shuffle. At 100 TB this is the runtime
    twin of DPP for non-partition keys; the thresholds only gate it by
    size, so pin the plan shape with them relaxed."""
    from pyspark.sql import functions as F

    confs = {
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold":
            "10GB",
        "spark.sql.optimizer.runtime.bloomFilter."
        "applicationSideScanSizeThreshold": "0",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    saved = {k: spark.conf.get(k) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        li = spark.read.parquet(f"{sf_small}/lineitem.parquet")
        orders = (spark.read.parquet(f"{sf_small}/orders.parquet")
                  .filter(F.col("o_orderpriority") == "1-URGENT"))
        j = (li.join(orders, li.l_orderkey == orders.o_orderkey)
             .select("l_extendedprice"))
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "bloom_filter_agg" in plan
        assert "might_contain" in plan
        assert j.count() > 0
    finally:
        for k, v in saved.items():
            spark.conf.set(k, v)


def test_interval_join_is_equi_not_nested_loop(spark):
    """The binned interval join must plan as an equi-join on the bin
    key; a BroadcastNestedLoopJoin/CartesianProduct here means the
    rewrite regressed to the O(n*m) naive plan."""
    plan = plan_of(spark, "join_interval_binned")
    assert "BroadcastHashJoin" in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_ivfpq_probe_is_equi_join_and_arrow_only(spark):
    """ann_ivfpq_adc must probe via a broadcast equi-join on the coarse
    cell — never a corpus cross join (that would erase the IVF
    pruning) — and the only Python in the plan is the Arrow-batched
    encode/assignment, never row-at-a-time."""
    plan = plan_of(spark, "ann_ivfpq_adc")
    assert "BroadcastHashJoin" in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan


def test_attribution_reuses_user_partitioning(spark):
    """Gap flag, session cumsum, first-touch window, and the
    per-session reduce must all ride ONE user_id exchange; the only
    other exchange is the |event_types|-row attribution agg."""
    plan = plan_of(spark, "events_session_attribution")
    assert plan.count("Exchange hashpartitioning") == 2
    assert "CartesianProduct" not in plan


def test_pattern_scan_single_shuffle(spark):
    """The per-entity series scan costs ONE shuffle (the per-user
    collect); window explode and moment folds are array HOFs inside
    the row, and the best-match window reuses the agg partitioning."""
    plan = plan_of(spark, "events_pattern_scan")
    assert plan.count("Exchange hashpartitioning") == 1
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan


def test_heavy_hitters_never_shuffles_full_vocab(spark):
    """The exact-verify groupBy must sit ABOVE the broadcast candidate
    gate: tokens join candidates via BroadcastHashJoin, so the only
    word exchanges carry candidate occurrences and the tiny candidate
    distinct — never the full vocabulary."""
    plan = plan_of(spark, "text_heavy_hitters")
    assert "BroadcastHashJoin" in plan
    assert plan.count("Exchange hashpartitioning") == 2
    assert "CartesianProduct" not in plan


def test_pit_join_is_equi_with_residual(spark):
    """The PIT join must ride the dimension-key equality (broadcast or
    sort-merge, interval test as residual) — a nested-loop/cartesian
    here means the temporal join degenerated to O(facts x versions)."""
    plan = plan_of(spark, "pit_join_scd2")
    assert "BroadcastHashJoin" in plan or "SortMergeJoin" in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_basket_lift_pairs_ride_equality(spark):
    """Pair generation must join baskets on the order key (equality,
    part< as residual); the only nested-loop allowed is the 1-row
    basket-total scalar join."""
    plan = plan_of(spark, "basket_pair_lift")
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    # The scalar n_baskets join is a single-row broadcast: at most one
    # BroadcastNestedLoopJoin, and never on the pair-generation side.
    assert plan.count("BroadcastNestedLoopJoin") <= 1


def test_rfm_no_global_sort(spark):
    """RFM's quintiles come from the distributed ranker: exactly the
    three pid-partitioned window exchanges (one per metric) over the
    checkpointed per-customer aggregate — never a single-partition /
    range exchange holding a metric's total order (the round-4 weak
    finding)."""
    plan = plan_of(spark, "customer_rfm_segments")
    assert plan.count("Exchange hashpartitioning") == 3
    assert "SinglePartition" not in plan
    assert "rangepartitioning" not in plan
    assert "BatchEvalPython" not in plan


@pytest.mark.parametrize("name", ["compute_range_splits",
                                  "compute_range_splits_sampled"])
def test_range_splits_no_global_sort(spark, name):
    """Both the exact and the sampled split computation rank via
    pid-partitioned windows — no task ever holds the total order."""
    plan = plan_of(spark, name)
    assert "SinglePartition" not in plan
    assert "rangepartitioning" not in plan
    assert "Exchange hashpartitioning" in plan
    assert "BatchEvalPython" not in plan


def test_dedup_paragraphs_digest_only_shuffle(spark):
    """The sentence-dedup exchange must carry (md5 digest, doc_id) —
    never sentence text: the keeper window partitions by the digest,
    and no Python evaluation appears anywhere."""
    plan = plan_of(spark, "dedup_paragraphs")
    assert "Exchange hashpartitioning(sh" in plan
    assert "SinglePartition" not in plan
    assert "BatchEvalPython" not in plan


def test_quality_weighted_sample_scan_side(spark):
    """The weighted gate is a scan-side expression + one partial/final
    agg — no join, no window, no Python."""
    plan = plan_of(spark, "sample_quality_weighted")
    assert plan.count("Exchange hashpartitioning") == 1
    assert "Join" not in plan and "Window" not in plan
    assert "BatchEvalPython" not in plan


def test_incremental_lsh_probe_is_equijoin(spark):
    """The delta probe must ride band-bucket equi-joins (SortMerge or
    Hash), never a nested-loop pair scan."""
    plan = plan_of(spark, "dedup_minhash_lsh_incremental")
    assert "NestedLoop" not in plan
    assert "BatchEvalPython" not in plan


def test_mad_outliers_single_entity_shuffle(spark):
    """Median/MAD run inside the row after ONE per-user collect —
    the events_cusum shape: one exchange, no window, no Python."""
    plan = plan_of(spark, "events_mad_outliers")
    assert plan.count("Exchange hashpartitioning") == 1
    assert "Window" not in plan
    assert "BatchEvalPython" not in plan


def test_collocations_prune_before_stat_joins(spark):
    """Min-support must prune the bigram table BEFORE the unigram-count
    joins (downward closure), survivors ride broadcasts, and the top-50
    is a bounded TakeOrdered — never a global sort or cartesian."""
    plan = plan_of(spark, "text_collocations")
    assert "TakeOrderedAndProject" in plan
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan


def test_upsample_is_scan_side_explode(spark):
    """Deterministic upsampling is one scan + a narrow explode — no
    shuffle, no Python."""
    plan = plan_of(spark, "sample_deterministic_upsample")
    assert "Generate explode" in plan
    assert "Exchange hashpartitioning" not in plan
    assert "BatchEvalPython" not in plan


def test_pca_power_step_no_vec_id_shuffle(spark):
    """The covariance ACTION w = Σ (x_d − μ_d)·s_i must NOT plan the
    per-vector scalar s as a vec_id self-join against the exploded
    elements (a corpus-sized exchange at a billion vectors — the
    round-6 verdict's one scale-killer). s is computed in the SAME
    projection as the posexplode, so the only hash exchanges are the
    two |dims|-key map-side-combined aggs (μ and w); μ and the norm
    ride back as broadcasts."""
    plan = plan_of(spark, "embedding_pca_power_step")
    assert "SortMergeJoin" not in plan
    assert "ShuffledHashJoin" not in plan
    assert plan.count("Exchange hashpartitioning") <= 2
    assert "BatchEvalPython" not in plan


def test_twophase_distinct_shape(spark):
    """The manual two-phase exact distinct: pair pre-agg then key agg —
    exactly two hash exchanges, both aggs partial+final, and no Expand
    node (the native COUNT DISTINCT planning artifact it replaces)."""
    plan = plan_of(spark, "agg_distinct_twophase")
    assert plan.count("Exchange hashpartitioning") == 2
    assert "Expand" not in plan
    assert plan.count("HashAggregate") >= 4  # partial+final x 2 phases


def test_bloom_prefilter_is_scan_side(spark):
    """The bloom probe must be a pure filter expression (no join, no
    exchange) feeding the broadcast exact join; only the final agg
    hash-partitions."""
    plan = plan_of(spark, "join_bloom_prefilter")
    assert "BroadcastHashJoin" in plan
    assert plan.count("Exchange hashpartitioning") <= 1
    assert "SortMergeJoin" not in plan
    assert "BatchEvalPython" not in plan


def test_deletion_vectors_probe_is_broadcast(spark):
    """The DV read path must probe the bitmap via a BROADCAST join on
    (file, word) — never a shuffled corpus join — and the only hash
    exchanges are the per-file window/agg keys. Deleted-row counting
    rides bit_count over the DV words, not a second corpus pass."""
    plan = plan_of(spark, "warehouse_deletion_vectors")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "ShuffledHashJoin" not in plan
    assert "BatchEvalPython" not in plan


def test_cdc_apply_no_extra_exchange(spark):
    """CDC apply: the last-writer-wins window and the full-outer apply
    both key on custkey. The plan must stay JVM-side with no
    Python eval and no cartesian; the changelog dedup is a
    row_number window (within-partition sort only)."""
    plan = plan_of(spark, "cdc_apply_changes")
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan
    # one exchange for the changelog window + join sides on the key
    assert plan.count("Exchange hashpartitioning") <= 3


def test_matryoshka_no_corpus_shuffle(spark):
    """MRL recall eval: both arms are |Q|-bounded broadcast nested
    loops; the per-query rank windows partition by query_id. No
    corpus-sized hash exchange, no Python."""
    plan = plan_of(spark, "embedding_matryoshka_recall")
    assert "BroadcastNestedLoopJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "BatchEvalPython" not in plan


def test_weighted_quantile_preaggs_before_window(spark):
    """Exact weighted quantiles must collapse the corpus to the
    distinct-value distribution with a map-side-combined pre-agg
    BEFORE any window touches it, and the threshold picks are plain
    aggregates — no join, no Python, bounded exchanges."""
    plan = plan_of(spark, "agg_weighted_quantile")
    assert "HashAggregate" in plan
    assert "Join" not in plan
    assert "BatchEvalPython" not in plan
    assert plan.count("Exchange hashpartitioning") <= 3


def test_asof_nearest_single_pass(spark):
    """direction='nearest' must be ONE union + two frames over the
    same per-key sort — never two composed as-ofs re-joined on the
    left key (a second corpus-sized exchange). Zero joins, exactly
    one hash exchange (user_id), no Python."""
    plan = plan_of(spark, "asof_join_nearest")
    assert "Join" not in plan
    assert plan.count("Exchange hashpartitioning") == 1
    assert "BatchEvalPython" not in plan


def test_audio_vad_no_shuffle(spark):
    """VAD's island merge runs inside the Arrow batch: the whole plan
    is scan -> ArrowEvalPython/mapInPandas -> result with no exchange
    at all (unlike sessionize, whose islands shuffle on the key)."""
    plan = plan_of(spark, "multimodal_audio_vad")
    assert "Exchange hashpartitioning" not in plan
    assert "Join" not in plan


def test_feature_hash_dictionary_free(spark):
    """The hashing trick must not build/broadcast a vocabulary: no
    join anywhere, and the corpus collapses via the (bucket, token)
    map-side pre-agg before the 64-key rollup."""
    plan = plan_of(spark, "feature_hash_vectorize")
    assert "Join" not in plan
    assert "BatchEvalPython" not in plan
    assert plan.count("Exchange hashpartitioning") <= 2


def test_zorder_single_rollup_shuffle(spark):
    """Morton clustering must be: 1-row stats agg broadcast back +
    row-local bit-interleave + ONE bounded-key rollup shuffle. Any
    SortMergeJoin or extra exchange means the stats pass shuffled the
    corpus."""
    plan = plan_of(spark, "warehouse_zorder_cluster")
    assert "BroadcastNestedLoopJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "BatchEvalPython" not in plan
    assert plan.count("Exchange hashpartitioning") == 1


def test_scenecut_no_shuffle(spark):
    """Scene-cut's change-point fold runs inside the Arrow batch:
    scan -> mapInPandas -> rows, no exchange, no join (the diff-based
    sibling of multimodal_audio_vad's level-based islands)."""
    plan = plan_of(spark, "multimodal_video_scenecut")
    assert "Exchange hashpartitioning" not in plan
    assert "Join" not in plan


def test_bpe_encode_corpus_exchanges_are_word_counts(spark):
    """Encoding must join per-doc WORD COUNTS to the learned
    dictionary — never ship symbol sequences corpus-wide, and never
    drop into Python. Merge learning is checkpoint-truncated; the
    final plan is the (doc,word) pre-agg + word-key join + doc
    rollup."""
    plan = plan_of(spark, "text_bpe_encode")
    assert "BatchEvalPython" not in plan
    assert plan.count("Exchange hashpartitioning") <= 4


def test_asof_tolerance_adds_no_exchange(spark):
    """The staleness gate is a row-local projection on the matched
    delta: the plan must stay byte-identical in shape to the backward
    as-of — one user_id exchange, zero joins, no Python."""
    plan = plan_of(spark, "asof_join_tolerance")
    assert plan.count("Exchange hashpartitioning") == 1
    assert "Join" not in plan
    assert "BatchEvalPython" not in plan


def test_sliding_distinct_bounded_rewrite(spark):
    """Sliding count-distinct must ride the W-x-activity-pairs
    rewrite: dedupe, explode(7), dedupe, count — never a per-day
    self-join of the event log (no SMJ; the only join is the
    broadcast 1-row horizon clip)."""
    plan = plan_of(spark, "events_sliding_distinct")
    assert "SortMergeJoin" not in plan
    assert "BroadcastNestedLoopJoin" in plan
    assert plan.count("Exchange hashpartitioning") <= 3


def test_bigram_lm_model_broadcast_back(spark):
    """The capped bigram model must come back as a broadcast (top-k
    via TakeOrderedAndProject), context totals derive from the
    bigram counts (no second corpus pass), and scoring never drops
    into Python."""
    plan = plan_of(spark, "text_bigram_lm_score")
    assert "BroadcastHashJoin" in plan
    assert "BatchEvalPython" not in plan
    assert plan.count("Exchange hashpartitioning") <= 2


def test_quantile_normalize_no_global_window(spark):
    """The global-rank step must ride the distributed ranker: no
    single-partition window anywhere in the executed plan, and the
    inverse-CDF pick is an EQUI-join on the position key (no
    NestedLoop/theta join), no Python."""
    plan = plan_of(spark, "grouped_quantile_normalize")
    assert "SinglePartition" not in plan
    assert "NestedLoop" not in plan
    assert "BatchEvalPython" not in plan


def test_containment_rides_band_join(spark):
    """Containment verify must reuse the LSH candidate machinery:
    equi-joins only (band buckets + id lookups), no cartesian, no
    Python, and the verify operand is the 8-byte hash arrays."""
    plan = plan_of(spark, "dedup_containment")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "BatchEvalPython" not in plan


def test_countmin_counter_shuffle_is_constant_width(spark):
    """The CMS counter build must map-side-combine: partial+final
    HashAggregates around the (r, b) exchange — the shuffle carries
    <=256 cells per task however big the fact table is — and the
    probe estimation joins the counter table by broadcast, never a
    sort-merge join of the corpus."""
    plan = plan_of(spark, "agg_sketch_countmin")
    assert plan.count("HashAggregate") >= 2
    assert "partial" in plan
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "BatchEvalPython" not in plan


def test_winnowing_single_docid_sort_family(spark):
    """Winnowing's gram build (two leads), both min frames and the
    per-doc rollup must all key on doc_id — no join of the gram
    stream to itself, no Python, no global window."""
    plan = plan_of(spark, "text_winnowing_fingerprint")
    assert "Join" not in plan
    assert "BatchEvalPython" not in plan
    assert "SinglePartition" not in plan


def test_kcenter_assignment_is_scan_projection(spark):
    """The k-center coverage/argmax must be a shuffle-free scan
    projection (centers as plan literals): no join of any kind, no
    exchange except the TakeOrdered singleton, and the global
    bottom-10 must be TakeOrderedAndProject, not a full sort."""
    plan = plan_of(spark, "embedding_kcenter_step")
    assert "Join" not in plan
    assert "TakeOrderedAndProject" in plan
    assert "Exchange hashpartitioning" not in plan
    assert "BatchEvalPython" not in plan


def test_negative_sampling_rank_addressed_draws(spark):
    """Bucket-alias negative sampling: draws reach items through
    (bucket, rank) equi-joins — no cartesian against the catalog, no
    theta join, no Python — and the catalog-side rank window is
    bucket-partitioned, never a single global partition."""
    plan = plan_of(spark, "sample_negatives_per_user")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "SinglePartition" not in plan
    assert "BatchEvalPython" not in plan


def test_rate_limit_single_user_shuffle_fold(spark):
    """The token-bucket replay must be the per-entity-series shape:
    one user_id exchange feeding the collect, the whole recursion an
    in-row fold — no join, no window, no Python anywhere."""
    plan = plan_of(spark, "events_rate_limit")
    assert "Join" not in plan
    assert "BatchEvalPython" not in plan
    assert "SinglePartition" not in plan
    assert plan.count("Exchange hashpartitioning") == 1


def test_changepoint_runs_on_the_hourly_aggregate(spark):
    """Binary segmentation's corpus-sized work must be the one
    map-side-combined hourly pre-agg; the scoring fold runs in-row on
    the |types|-row aggregate — no join, no Python, no global sort."""
    plan = plan_of(spark, "events_changepoint_binary")
    assert "Join" not in plan
    assert "BatchEvalPython" not in plan
    assert "SinglePartition" not in plan
    assert plan.count("HashAggregate") >= 2
    assert "partial" in plan


def test_jaccard_neighbors_no_cartesian_no_python(spark):
    """Link scoring must ride the degree-oriented triangle dataflow:
    keyed joins only (wedge + closing + broadcast degree
    annotations), no cartesian/nested-loop pairing of nodes, no
    Python, no global window."""
    plan = plan_of(spark, "graph_jaccard_neighbors")
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan
    assert "SinglePartition" not in plan
    assert "BroadcastHashJoin" in plan


def test_gini_profile_two_phase_agg(spark):
    """The balance audit's corpus-sized work is the one (source,
    lang) count: partial+final HashAggregates around a tiny
    exchange, the rollup/expand on the aggregate — no join, no
    Python, no window."""
    plan = plan_of(spark, "profile_gini_simpson")
    assert "Join" not in plan
    assert "BatchEvalPython" not in plan
    assert plan.count("HashAggregate") >= 2
    assert "partial" in plan
    assert "Expand" in plan


def test_rake_topk_is_take_ordered(spark):
    """RAKE's final top-20 must be TakeOrderedAndProject (never a
    full sort), phrase extraction row-local HOFs (no Python), and
    the word-score join an equi-join, not a cartesian."""
    plan = plan_of(spark, "text_keyword_rake")
    assert "TakeOrderedAndProject" in plan
    assert "BatchEvalPython" not in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_holt_single_user_shuffle_struct_fold(spark):
    """Holt's coupled recursions must be the per-entity-series shape:
    one user_id exchange, the (l, b) fold in-row — no join, no
    Python, no second shuffle."""
    plan = plan_of(spark, "events_holt_step")
    assert "Join" not in plan
    assert "BatchEvalPython" not in plan
    assert "SinglePartition" not in plan
    assert plan.count("Exchange hashpartitioning") == 1


def test_bow_priority_digest_only_shuffle(spark):
    """The priority dedup's shuffle must carry the 32-char digest +
    small columns, never document text: the exchange's schema is
    checked for the text column, and both window passes ride one
    bow_key sort — no join, no Python."""
    plan = plan_of(spark, "dedup_bow_priority")
    assert "Join" not in plan
    assert "BatchEvalPython" not in plan
    assert plan.count("Exchange hashpartitioning") == 1
    import re
    ex = [l for l in plan.splitlines() if "Exchange hashpartitioning" in l]
    assert ex and "text" not in ex[0]


def test_ttest_totals_broadcast_back(spark):
    """Welch's corpus-sized work is the one |types|-row moment agg;
    the totals row rides a broadcast join back — no sort-merge join,
    no Python, no second corpus scan."""
    plan = plan_of(spark, "agg_ttest_welch")
    assert "BatchEvalPython" not in plan
    assert "SortMergeJoin" not in plan
    assert plan.count("HashAggregate") >= 2
    assert "partial" in plan


def test_bestfit_packing_single_shard_shuffle(spark):
    """BFD packing must be the per-shard fold shape: one shard
    exchange, the bin-list fold in-row — no join, no Python, no
    global window."""
    plan = plan_of(spark, "pack_sequences_bestfit")
    assert "Join" not in plan
    assert "BatchEvalPython" not in plan
    assert "SinglePartition" not in plan
    assert plan.count("Exchange hashpartitioning") == 1


def test_chi2_runs_on_the_contingency_aggregate(spark):
    """Chi-squared's corpus work is the one (type, hod) count; margins
    and expected ride broadcasts over the tiny table — no sort-merge
    join, no Python."""
    plan = plan_of(spark, "agg_chi2_independence")
    assert "BatchEvalPython" not in plan
    assert "SortMergeJoin" not in plan
    assert plan.count("HashAggregate") >= 2
    assert "partial" in plan


def test_novelty_shuffles_digests_not_text(spark):
    """The novelty score's gram shuffle must carry md5 digests, never
    document text, and the doc rollup join stays keyed — no
    cartesian, no Python."""
    plan = plan_of(spark, "text_ngram_novelty")
    assert "BatchEvalPython" not in plan
    assert "CartesianProduct" not in plan
    ex = [l for l in plan.splitlines() if "Exchange hashpartitioning" in l]
    assert ex and all("text" not in l for l in ex)
    # In-doc distinct is in-row (array_distinct before the explode):
    # the plan gets exactly the gram-min exchange plus the two doc_id
    # rollup/join exchanges — a (doc_id, gram) distinct exchange
    # (the first cut's 8x-at-10x linear term) must not reappear.
    assert len(ex) <= 3


def test_schema_evolution_merged_read_stays_jvm(spark):
    """The merged-schema read must aggregate with map-side combine
    over the union of layouts — no Python, no join, no global
    window in the read plan."""
    plan = plan_of(spark, "warehouse_schema_evolution")
    assert "BatchEvalPython" not in plan
    assert "Join" not in plan
    assert plan.count("HashAggregate") >= 2


def test_mannwhitney_no_global_window(spark):
    """The cumulative-below term must ride the distributed prefix sum
    (a pid-partitioned running-sum Window over a hashpartitioning
    exchange): the ONLY single-partition exchange allowed is the
    final 1-row statistic combine, never a global-order window or a
    range exchange, and nothing falls back to Python."""
    plan = plan_of(spark, "agg_mannwhitney_u")
    assert plan.count("Exchange SinglePartition") == 1
    assert "rangepartitioning" not in plan
    assert "Window" in plan
    assert plan.count("Exchange hashpartitioning") >= 1
    assert "BatchEvalPython" not in plan
    assert plan.count("HashAggregate") >= 2
    assert "partial" in plan


def test_ks_single_pass_two_cumsum(spark):
    """KS must attach BOTH cumulative counts in one prefix-sum pass
    (one Window operator, pid-partitioned) and take the top-1 via
    TakeOrderedAndProject — never a global sort, no Python; the final
    gap argmax is exact-integer."""
    plan = plan_of(spark, "agg_ks_statistic")
    assert "TakeOrderedAndProject" in plan
    assert "rangepartitioning" not in plan
    assert "BatchEvalPython" not in plan
    assert plan.count("Window") == 1


def test_group_holdout_scan_side_tag(spark):
    """The group-holdout split tag must be a scan-side expression
    (no join to a user dimension, no Python); rollup + leakage audit
    are keyed aggregates with map-side combine."""
    plan = plan_of(spark, "sample_group_holdout")
    assert "BatchEvalPython" not in plan
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan
    assert plan.count("HashAggregate") >= 2
    assert "partial" in plan


def test_hybrid_rrf_fusion_layer_shape(spark):
    """Hybrid RRF: both arms broadcast the capped |Q| query frame
    (never shuffling the corpus for the pairing), fusion joins two
    |Q|x10 frames, no Python, and the only windows partition by
    query_id."""
    plan = plan_of(spark, "retrieval_hybrid_rrf")
    assert "BatchEvalPython" not in plan
    assert "CartesianProduct" not in plan
    assert plan.count("BroadcastNestedLoopJoin") <= 2  # the two arms
    assert "SinglePartition" not in plan


def test_match_recognize_single_user_shuffle_fsm(spark):
    """MATCH_RECOGNIZE must keep the per-entity-series shape: one
    user_id exchange feeding the collect, the FSM an in-row integer
    fold — no join, no window, no Python anywhere."""
    plan = plan_of(spark, "events_match_recognize")
    assert "Join" not in plan
    assert "BatchEvalPython" not in plan
    assert "SinglePartition" not in plan
    assert plan.count("Exchange hashpartitioning") == 1


def test_kcore_peel_semi_joins_and_partial_degrees(spark):
    """Each peel round must filter edges by LEFT SEMI joins on the
    survivor set (never an inner join that could duplicate edge rows)
    and every degree agg must map-side combine; no Python, no
    cartesian anywhere.  Round 1's peel is materialized inside the
    checkpoints (its semi-joins ran at build time); round 2's peel and
    degree aggs remain in the final plan, reading the checkpointed
    survivors."""
    plan = plan_of(spark, "graph_kcore_peel")
    assert plan.count("LeftSemi") >= 2      # final round x 2 endpoints
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan
    assert "partial_count" in plan


def test_cdc_chunks_one_docid_sort_no_selfjoin(spark):
    """CDC chunking's boundary flags are in-row (no lag self-join);
    the chunk-id window and the per-chunk rollup must ride one doc_id
    sort; the digest agg map-side combines; top-25 via TakeOrdered,
    never a global sort."""
    plan = plan_of(spark, "text_cdc_chunks")
    assert "Join" not in plan
    assert "BatchEvalPython" not in plan
    assert "TakeOrderedAndProject" in plan
    assert plan.count("Exchange hashpartitioning(doc_id") == 1


def test_ivm_partials_mapside_and_tiny_merge(spark):
    """Incremental view maintenance: both the base and delta partial
    aggs must map-side combine, the merge is one join on the view
    grain, and the date split reaches the scan as a pushed filter."""
    plan = plan_of(spark, "agg_incremental_view_merge")
    assert plan.count("partial_count") >= 2
    assert "BatchEvalPython" not in plan
    assert "CartesianProduct" not in plan
    assert "PushedFilters: [IsNotNull(o_orderdate)" in plan


def test_benford_one_9key_count_broadcast_back(spark):
    """Benford profiling: the only corpus-sized work is one
    map-side-combined 9-key count; the expectation table and the
    total come back as broadcasts — no Python, no cartesian blowup
    (the 1-row total crossJoin must be a broadcast NLJ)."""
    plan = plan_of(spark, "profile_benford_digits")
    assert "partial_count" in plan
    assert "BatchEvalPython" not in plan
    assert "CartesianProduct" not in plan


def test_neyman_alloc_on_aggregate_broadcast_quota(spark):
    """Neyman sampling: moments map-side combine; allocation windows
    run on the |strata|-row aggregate; the quota joins back as a
    broadcast; the draw window partitions by stratum (never global
    over the corpus)."""
    plan = plan_of(spark, "sample_stratified_neyman")
    assert "partial_count" in plan
    assert "BatchEvalPython" not in plan
    assert "BroadcastHashJoin" in plan
    assert "partitionBy=[lang" in plan or "hashpartitioning(lang" in plan


def test_pq_train_step_rowlocal_assignment_no_selfjoin(spark):
    """The PQ train step must keep the code assignment row-local next
    to the element explode (the r06 PCA lesson: no exploded-elements
    x codes self-join): no Join anywhere, the encode rides the Arrow
    kernel (never row-at-a-time Python), and the only hash exchange
    is the 1024-key map-side-combined mean agg."""
    plan = plan_of(spark, "embedding_pq_train_step")
    assert "Join" not in plan
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" in plan
    assert plan.count("Exchange hashpartitioning") == 1
    assert "partial" in plan


def test_log2_histogram_one_mapside_count(spark):
    """The log2 histogram's only work is one map-side-combined
    (type, bucket) count — no join, no window, no Python."""
    plan = plan_of(spark, "agg_log2_histogram")
    assert "Join" not in plan
    assert "BatchEvalPython" not in plan
    assert "partial_count" in plan
    assert plan.count("Exchange hashpartitioning") == 1


def test_louvain_gain_integer_argmax_on_edges(spark):
    """Louvain's gain pass: degree annotations join on node keys (no
    cartesian), the 2m scalar comes back as a broadcast, and the
    per-node argmax is an aggregate riding the edge list — no window
    over the corpus, no Python."""
    plan = plan_of(spark, "graph_louvain_merge_step")
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan
    assert "BroadcastNestedLoopJoin" in plan  # the 1-row 2m scalar
    assert "Window" not in plan
    assert "partial_max" in plan or "partial_sum" in plan


def test_seasonal_decompose_runs_on_hourly_aggregate(spark):
    """Seasonal decomposition's corpus term must be the one map-side
    combined hourly pre-agg; the MA window and 24-key rollup run on
    the aggregate — no join, no Python, no global-sort window."""
    plan = plan_of(spark, "events_seasonal_decompose_ma")
    assert "Join" not in plan
    assert "BatchEvalPython" not in plan
    assert "partial_count" in plan
    assert "SinglePartition" not in plan


def test_constraint_check_mapside_arms_single_fk_shuffle(spark):
    """The constraint audit: the four orders-local constraints ride
    ONE map-side-combined scan agg unpivoted via stack() (r08 audit
    fix — 5 orders scans became 2), the FK and quantity-range arms
    keep theirs; the FK left join is the only join; no Python, no
    cartesian."""
    plan = plan_of(spark, "warehouse_constraint_check")
    # three aggregation arms (orders audit, FK, range), each partial
    assert plan.count("partial_count") >= 3
    assert "Generate stack" in plan or "stack(4" in plan
    assert "BatchEvalPython" not in plan
    assert "CartesianProduct" not in plan


def test_outage_gaps_one_type_shuffle_takeordered(spark):
    """Outage gaps: one event_type exchange feeds the lag window;
    top-20 via TakeOrdered, never a global sort; no join, no
    Python."""
    plan = plan_of(spark, "events_outage_gaps")
    assert "Join" not in plan
    assert "BatchEvalPython" not in plan
    assert "TakeOrderedAndProject" in plan
    assert plan.count("Exchange hashpartitioning") == 1


def test_cosine_histogram_constant_pair_work(spark):
    """Cosine histogram: the 64-row sample side broadcasts (the pair
    join must be a broadcast NLJ over the capped sample, never a
    shuffle of the corpus against itself), and the rollup map-side
    combines; no Python."""
    plan = plan_of(spark, "embedding_cosine_histogram")
    assert "BatchEvalPython" not in plan
    assert "BroadcastNestedLoopJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "partial_count" in plan


def test_minhash_est_quality_candidates_only(spark):
    """The estimate-quality eval must ride the band-bucket equi-join
    (never an all-pairs product): no cartesian, no Python, and the
    per-doc signature frames join candidates on doc id."""
    plan = plan_of(spark, "dedup_minhash_est_quality")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "BatchEvalPython" not in plan


def test_ols_two_factor_one_moment_agg(spark):
    """The 2-factor OLS must be one map-side-combined moment agg with
    the solve on the |groups|-row aggregate: no join, no window, no
    Python, one exchange."""
    plan = plan_of(spark, "agg_ols_two_factor")
    assert "Join" not in plan
    assert "BatchEvalPython" not in plan
    assert "partial_sum" in plan
    assert plan.count("Exchange hashpartitioning") == 1


def test_kfold_scan_side_tag_tiny_join(spark):
    """K-fold assignment: the fold tag is a scan-side projection (no
    shuffle before the count), one map-side-combined (fold, lang)
    count, totals broadcast back."""
    plan = plan_of(spark, "sample_kfold_assign")
    assert "BatchEvalPython" not in plan
    assert "partial_count" in plan
    assert "BroadcastHashJoin" in plan


def test_dim_variance_one_moment_agg(spark):
    """Dimension-variance pruning: one |dims|-key map-side-combined
    moment agg is the only corpus term; ranking runs on the 64-row
    aggregate; no join, no Python."""
    plan = plan_of(spark, "embedding_dim_variance_prune")
    assert "Join" not in plan
    assert "BatchEvalPython" not in plan
    assert "partial_sum" in plan


def test_kneser_ney_inrow_bigrams_dictionary_joins(spark):
    """KN counts: bigrams build in-row (no lag window before the
    count — exactly one Window allowed for nothing: zero Windows),
    one (w1, w2) count, then dictionary-scale joins only; top-20 via
    TakeOrdered."""
    plan = plan_of(spark, "text_kneser_ney_counts")
    assert "Window" not in plan
    assert "BatchEvalPython" not in plan
    assert "TakeOrderedAndProject" in plan
    assert "partial_count" in plan


def test_markov_step_on_transition_aggregate(spark):
    """The Markov power step: the corpus's one lead() pass runs ONCE
    inside the transition-aggregate localCheckpoint job; the final
    plan must read only the materialized |types|^2-row aggregate
    (Scan ExistingRDD), joining the broadcast row totals — no
    user_id exchange may survive into it (it would mean the totals
    branch re-ran the corpus window, the IVFPQ double-eval bug)."""
    plan = plan_of(spark, "events_markov_stationary_step")
    assert "BatchEvalPython" not in plan
    assert "BroadcastHashJoin" in plan
    assert "Scan ExistingRDD" in plan
    assert "Exchange hashpartitioning(user_id" not in plan


def test_partition_stats_calendar_grain(spark):
    """Partition-skew profile: one map-side-combined per-month count;
    the totals row broadcasts back; the rank window runs over the
    calendar-bounded aggregate (a SinglePartition of |months| rows is
    the intended tiny-aggregate shape)."""
    plan = plan_of(spark, "warehouse_partition_stats_skew")
    assert "BatchEvalPython" not in plan
    assert "partial_count" in plan
    assert "BroadcastNestedLoopJoin" in plan


def test_ab_lift_one_user_shuffle_stats_on_scalar(spark):
    """The A/B funnel lift: one user_id shuffle for the step MINs
    (the funnel cost model); the z statistic runs on a 1-row pivot —
    no join, no Python."""
    plan = plan_of(spark, "events_ab_lift_funnel")
    assert "Join" not in plan
    assert "BatchEvalPython" not in plan
    assert plan.count("Exchange hashpartitioning(user_id") == 1


def test_gdpr_purge_broadcast_antijoin(spark):
    """The GDPR purge must be a broadcast ANTI join (requests are
    tiny vs the corpus) and the residue check a broadcast inner
    re-join — never a shuffled join of the corpus against itself."""
    plan = plan_of(spark, "warehouse_gdpr_delete_audit")
    assert "LeftAnti, BuildRight" in plan
    assert "SortMergeJoin" not in plan
    assert "BatchEvalPython" not in plan


def test_poisson_bootstrap_replicates_ride_the_scan(spark):
    """The bootstrap's replicate dimension must ride the scan (one
    explode, no corpus reshuffle), and the corpus x32 pass must run
    ONCE: the replicate table localCheckpoints, so the final plan
    reads the materialized 32 rows (Scan ExistingRDD) with zero hash
    exchanges — a surviving hashpartitioning(b) would mean the SE
    branch re-ran the explode (the double-eval bug)."""
    plan = plan_of(spark, "sample_poisson_bootstrap_mean")
    assert "BatchEvalPython" not in plan
    assert "Scan ExistingRDD" in plan
    assert "Exchange hashpartitioning" not in plan
    assert "BroadcastNestedLoopJoin" in plan


def test_skyline_aggregate_first_rewrite(spark):
    """The skyline must be the aggregate-first rewrite: one map-side
    combined |sizes|-key pre-agg, dominance via one running-min window
    on the tiny aggregate — never an all-pairs dominance join."""
    plan = plan_of(spark, "parts_skyline_pareto")
    assert "Join" not in plan
    assert "BatchEvalPython" not in plan
    assert "partial_min" in plan
    assert plan.count("Exchange hashpartitioning") == 1


def test_gap_percentiles_distinct_value_windows(spark):
    """Gap percentiles: one event_type shuffle for the lag, one
    map-side (type, gap_s) count, cumulative windows over distinct
    VALUES only; no join, no Python, no global window."""
    plan = plan_of(spark, "events_gap_percentiles")
    assert "Join" not in plan
    assert "BatchEvalPython" not in plan
    assert "SinglePartition" not in plan
    assert "partial_count" in plan


def test_tfidf_no_python_dictionary_joins(spark):
    """TF-IDF top terms: token stats shuffle on doc/term keys with
    map-side combines, df joins at dictionary scale, top-k via a
    per-doc window — no Python, no cartesian."""
    plan = plan_of(spark, "text_tfidf_top_terms")
    assert "BatchEvalPython" not in plan
    assert "CartesianProduct" not in plan
    assert "partial_count" in plan


def test_path_transitions_reuses_user_partitioning(spark):
    """The Markov matrix: one user_id exchange for the lead() pass,
    pair counts map-side combine to <=|types|^2 keys, probability
    window over the tiny aggregate — no join, no Python."""
    plan = plan_of(spark, "events_path_transitions")
    assert "Join" not in plan
    assert "BatchEvalPython" not in plan
    assert plan.count("Exchange hashpartitioning(user_id") == 1
    assert "partial_count" in plan


def test_rollup_is_expand_with_partial_agg(spark):
    """ROLLUP must compile to the Expand operator feeding one
    map-side-combined aggregation — never a union of per-level
    rescans (N scans of the fact table at scale)."""
    plan = plan_of(spark, "agg_rollup")
    assert "Expand" in plan
    assert "partial" in plan
    assert "Union" not in plan
    assert plan.count("Scan parquet") == 1


def test_triangle_count_degree_oriented_no_cartesian(spark):
    """Degree-oriented triangle counting: the wedge self-join keys on
    the oriented source (hash join), no cartesian, no Python (the
    BroadcastNestedLoopJoin Cross entries are the 1-row scalar
    assembly, allowed).  The r07 scalar-branch re-derivation is fixed:
    the four output scalars read the checkpointed edge/degree/oriented
    tables (test_graph_family_single_edge_derivation pins the 0-scan
    invariant), and the wedge/triangle counts ride ONE pass over the
    wedge join — a closing-edge LEFT join whose match flag is counted,
    replacing the former count-then-semi-join double consumption."""
    plan = plan_of(spark, "graph_triangle_count")
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan
    # one outer-join probe of the closing edges, no semi-join rescan
    assert "LeftOuter" in plan
    assert "LeftSemi" not in plan


#: The co-purchase graph family: every member must derive the basket
#: self-join edge build exactly once (DISK_ONLY localCheckpoint) —
#: the r07 plan sweep measured 248 parquet scans in k-core's executed
#: plan, 32 in Louvain's, ~10 edge rebuilds in triangle count, all
#: from consumer branches re-deriving lineage.
_GRAPH_FAMILY = ("graph_triangle_count", "graph_jaccard_neighbors",
                 "graph_kcore_peel", "graph_kcore_fixpoint",
                 "graph_louvain_merge_step",
                 "graph_louvain_contract_step")


@pytest.mark.parametrize("name", _GRAPH_FAMILY)
def test_graph_family_single_edge_derivation(spark, name):
    """The final executed plan must read ONLY materialized RDD blocks:
    zero parquet scans (each source table was scanned exactly once,
    inside the eager edge-build checkpoint) and at least one
    Scan ExistingRDD.  This is the 100 TB invariant — at local scale
    the re-scans were invisible because the files are tiny."""
    plan = plan_of(spark, name)
    assert plan.count("Scan parquet") == 0, plan
    assert "Scan ExistingRDD" in plan
    assert "InMemoryTableScan" not in plan  # checkpoint, not persist


#: r08 plan-audit fixes (scripts/audit_plans.py): queries whose
#: corpus-sized shuffle fed multiple consumer branches, now
#: materialized once at the aggregate branch point.  Values are the
#: maximum allowed parquet scans of any single source in the FINAL
#: executed plan (self-joins and deliberate second arms keep theirs).
_AUDIT_FIXED_MAX_SCANS = {
    "warehouse_constraint_check": 2,  # orders: audit agg + FK side
    "profile_key_skew": 1,
    "agg_chi2_independence": 1,
    "agg_sketch_theta_setops": 1,
    "basket_pair_lift": 1,
    "text_kneser_ney_counts": 1,
    "text_collocations": 3,  # unigram ckpt + bigram pass + btot pass
}


@pytest.mark.parametrize("name", sorted(_AUDIT_FIXED_MAX_SCANS))
def test_audit_fixed_plans_stay_single_derivation(spark, name):
    import re
    plan = plan_of(spark, name)
    per: dict[str, int] = {}
    for m in re.finditer(r"Location:.*?(\w+)\.parquet", plan):
        per[m.group(1)] = per.get(m.group(1), 0) + 1
    worst = max(per.values(), default=0)
    assert worst <= _AUDIT_FIXED_MAX_SCANS[name], (name, per)
