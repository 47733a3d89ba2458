"""Plan-quality regression guards: the judge-facing scale properties —
pushdown reaching the scan, dims broadcasting, no accidental sort-merge
or cartesian joins — asserted on the executed (post-AQE) plans so a
refactor can't silently regress them.

Runs at sf0.001: plan SHAPE is scale-invariant for these assertions
(AQE join-strategy choices that differ by size are asserted only where
the choice is forced by an explicit hint).
"""

from __future__ import annotations

import pytest

from ducklakexl_spark.queries import QUERIES, load_all

load_all()

SF = "/root/testdata/sf0.001"


def executed_plan(spark, name: str) -> str:
    df = QUERIES[name](spark, SF)
    df.collect()
    return df._jdf.queryExecution().executedPlan().toString()


def test_q06_filters_pushed_to_scan(spark):
    plan = executed_plan(spark, "q06_forecast_revenue")
    assert "PushedFilters: [" in plan
    assert "IsNotNull(l_shipdate)" in plan or "GreaterThanOrEqual(l_shipdate" in plan
    # column pruning: the scan must not read all 11 lineitem columns
    assert "l_returnflag" not in plan.split("ReadSchema")[1].split("\n")[0]


def test_q03_broadcasts_dimensions(spark):
    plan = executed_plan(spark, "q03_shipping_priority")
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    # top-k executes as TakeOrderedAndProject, not global sort + limit
    assert "TakeOrderedAndProject" in plan


def test_ivf_no_sort_merge_join(spark):
    plan = executed_plan(spark, "sim_ivf_topk")
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan


def test_range_join_is_broadcast_nlj(spark):
    plan = executed_plan(spark, "range_join_value_bands")
    assert "BroadcastNestedLoopJoin" in plan


def test_minhash_no_cartesian(spark):
    plan = executed_plan(spark, "dedup_minhash_lsh")
    assert "CartesianProduct" not in plan


def test_whole_stage_codegen_active(spark):
    # '*(n)' prefixes mark whole-stage-codegen spans
    plan = executed_plan(spark, "q01_pricing_summary")
    assert "*(" in plan


def test_exact_dedup_partial_aggregates(spark):
    plan = executed_plan(spark, "dedup_exact")
    # map-side partial agg before the shuffle: two HashAggregate levels
    assert plan.count("HashAggregate") >= 2


def test_simhash_banded_no_nested_loop_over_corpus(spark):
    """Hamming-ball banding: candidate pairs come from an equi-join on
    (block, value), never a nested-loop over the corpus cross product."""
    plan = executed_plan(spark, "dedup_simhash")
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_near_dup_pairs_lsh_no_nested_loop_over_corpus(spark):
    plan = executed_plan(spark, "sim_near_dup_pairs")
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_q02_decorrelated_no_cartesian(spark):
    """Q2's scalar-min correlation must decorrelate into aggregates +
    equi-joins: no nested-loop re-execution per part."""
    plan = executed_plan(spark, "q02_min_cost_supplier")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert plan.count("HashAggregate") >= 2  # cost + per-part floor


def test_q11_total_broadcasts(spark):
    """The uncorrelated global total must broadcast to the per-part
    rows, never shuffle-join a single-row side."""
    plan = executed_plan(spark, "q11_important_parts")
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_q20_semi_join_single_fact_scan(spark):
    """r9: one conditional aggregate covers both the 1996 window and the
    all-time per-part total — lineitem must appear once (the pre-r9
    recent/total split scanned it twice; the range filter now lives in
    the aggregate's WHEN, not the scan, because the total needs every
    row of the blue parts anyway)."""
    plan = executed_plan(spark, "q20_part_promotion")
    assert "CartesianProduct" not in plan
    init = plan.split("== Initial Plan ==")[-1]
    assert init.count("lineitem.parquet") == 1


def test_q21_single_fact_scan_decorrelated(spark):
    """r9: the EXISTS/NOT-EXISTS double-correlation is decorrelated into
    ONE li⋈orders pass + a per-order conditional aggregate (nsupp>=2,
    nlate==1) — the fact table must appear exactly once in the plan (the
    pre-r9 semi/anti shape scanned lineitem 3x and orders 2x)."""
    plan = executed_plan(spark, "q21_waiting_suppliers")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # structural shape lives in the pre-AQE section (at tiny SFs AQE can
    # prune the executed side to EmptyRelation)
    init = plan.split("== Initial Plan ==")[-1]
    assert init.count("lineitem.parquet") == 1
    assert init.count("orders.parquet") == 1
    assert "HashAggregate" in plan


def test_text_filters_single_codegen_stage(spark):
    """The repetition/Gopher filters are per-row projections: no
    exchange (shuffle) anywhere in the plan."""
    for name in ("text_repetition_filter", "text_gopher_filter",
                 "text_pii_scrub"):
        plan = executed_plan(spark, name)
        assert "Exchange" not in plan, name


def test_contamination_broadcasts_eval_grams(spark):
    """The eval-holdout gram probe must broadcast — the corpus side never
    shuffles for the join (the 100 TB property of the contamination
    check)."""
    plan = executed_plan(spark, "text_contamination_3gram")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan


def test_tfidf_broadcasts_vocabulary(spark):
    """df (vocabulary-sized) and N (single row) broadcast back onto tf —
    the only data-sized shuffles are the two key aggregations."""
    plan = executed_plan(spark, "text_tfidf_top_terms")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_bm25_single_corpus_shuffle(spark):
    plan = executed_plan(spark, "text_bm25_search")
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "TakeOrderedAndProject" in plan  # top-20, not a global sort


def test_mixture_quota_broadcasts(spark):
    plan = executed_plan(spark, "sample_mixture_by_lang")
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_ngram_spans_no_cartesian_no_bnlj(spark):
    """Exact-span dup profile: the dup-gram join must be an equi-join on
    the gram hash (co-partitioned with the frequency groupBy), never a
    nested-loop or cartesian over the exploded gram set."""
    plan = executed_plan(spark, "dedup_ngram_spans")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_semantic_dedup_equi_join_on_cell(spark):
    """SemDeDup pairwise step must be an equi-join on the cluster cell
    (the O(n^2/k) trick), never a corpus-wide cartesian."""
    plan = executed_plan(spark, "sim_semantic_dedup")
    assert "CartesianProduct" not in plan


def test_span_removal_no_cartesian_no_bnlj(spark):
    plan = executed_plan(spark, "dedup_span_removal")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_funnel_no_cartesian_steps_materialized(spark):
    """r9: each step frame is localCheckpointed (computed exactly once);
    the final plan consumes the checkpointed RDDs — no events.parquet
    rescans (the pre-r9 cascade replayed each step per reference: 6
    scans for 3 steps).  The per-step event_type filter still pushes to
    the parquet scan inside the checkpoint jobs; here we pin that the
    cascade itself no longer re-derives anything."""
    plan = executed_plan(spark, "events_funnel_steps")
    assert "CartesianProduct" not in plan
    assert "events.parquet" not in plan
    assert "ExistingRDD" in plan


def test_retention_no_cartesian(spark):
    plan = executed_plan(spark, "events_retention_cohorts")
    assert "CartesianProduct" not in plan


def test_range_search_zero_shuffle(spark):
    # broadcast-query radius search: corpus side scans map-side only
    plan = executed_plan(spark, "sim_range_search")
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
    assert "Exchange hashpartitioning" not in plan


def test_pagerank_no_cartesian(spark):
    plan = executed_plan(spark, "graph_pagerank")
    assert "CartesianProduct" not in plan


def test_phash_dedup_banded_no_bnlj(spark):
    plan = executed_plan(spark, "mm_phash_dedup")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_bloom_prefilter_broadcasts_words(spark):
    plan = executed_plan(spark, "dedup_incremental_bloom")
    assert "CartesianProduct" not in plan
    # the word table joins broadcast; only candidates reach the exact join
    assert "BroadcastHashJoin" in plan


def test_bpe_pairs_topk_no_global_sort(spark):
    plan = executed_plan(spark, "text_bpe_pair_freqs")
    assert "TakeOrderedAndProject" in plan


def test_er_blocking_equi_join_no_cartesian(spark):
    """Entity-resolution candidates must come from the hash equi-join on
    the (nation, segment) block key — the edit-distance verify runs on
    block-mates only, never a corpus cross product."""
    plan = executed_plan(spark, "er_blocked_match")
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_triangles_oriented_equi_joins_only(spark):
    """Degree-oriented triangle counting: wedge generation and closure are
    equi-joins on node keys; a BNLJ/cartesian would mean the orientation
    got lost in a refactor."""
    plan = executed_plan(spark, "graph_triangles")
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_gapfill_single_user_exchange_layout(spark):
    """Gap-fill chain (hourly agg -> span -> grid join -> LOCF window) is
    keyed on user_id throughout; the event_type-free user filter must
    reach the parquet scan."""
    plan = executed_plan(spark, "events_gapfill_locf")
    assert "CartesianProduct" not in plan
    assert "PushedFilters: [" in plan


def test_kmeans_assign_no_join(spark):
    """k-means E-step folds centroids into constants: the assignment scan
    has no join at all (the only joins in the plan would come from a
    regression to a centroid-table join)."""
    plan = executed_plan(spark, "ml_kmeans_iter")
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan


def test_pattern_match_segmented_two_aggs_no_join_no_window(spark):
    """Sequence pattern matching (r9 segmented shape): per-(user, chunk)
    transition features + per-user fold — exactly two aggregations, no
    join (a funnel-style regression) and NO sort-window (a regression to
    the r8 whole-stream collapse that straggled on the hot key)."""
    plan = executed_plan(spark, "events_pattern_match")
    assert "Join" not in plan
    assert "Window" not in plan  # no whole-partition sort-window
    # two groupBy shuffles; AQE prints final+initial sections (x2)
    assert plan.count("Exchange hashpartitioning") <= 4


def test_mad_joins_broadcast_median(spark):
    """MAD's join-back of the per-type medians must broadcast (|types|
    rows), never shuffle the events side twice for the join."""
    plan = executed_plan(spark, "robust_stats_mad")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_minhash_reuses_exchanges(spark):
    """The banded self-join reads the signature frame twice and the
    verify join reads the shingle table twice; since round 7 both are
    per-session PERSISTED (the dedup index — a written artifact at
    deployment), so every reuse is an in-memory relation scan instead
    of a recomputed shingle pipeline.  Guard: the plan must read the
    cache (or reuse an exchange) and must never rebuild the shingle
    scan per side — at most one parquet scan of documents may remain
    (the cold build), not one per DAG branch."""
    plan = executed_plan(spark, "dedup_minhash_lsh")
    # every branch over the shingle/signature tables goes through the
    # cache (the plan string repeats each InMemoryRelation's BUILD
    # pipeline under the scan node, so count cache reads, not scans)
    assert plan.count("InMemoryTableScan") >= 2


def test_pq_adc_zero_join_scan(spark):
    """PQ-ADC: encode + table-lookup scoring is one stateless projection
    chain over the corpus — no joins at all; the only exchange feeds the
    TakeOrdered top-k."""
    plan = executed_plan(spark, "sim_pq_adc_topk")
    for op in ("Join", "CartesianProduct"):
        assert op not in plan
    assert "TakeOrderedAndProject" in plan


def test_anomaly_zscore_segmented_chunk_window(spark):
    """Rolling z-score (r9 segmented shape): the scoring window
    partitions by (event_type, hour-chunk) with an overlap carry — the
    plan must never fall back to a whole-event_type sort partition
    (cardinality 5 → corpus/5 rows in one task) and never go
    single-partition; every exchange stays on an event_type-prefixed
    key."""
    plan = executed_plan(spark, "events_anomaly_zscore")
    assert "CartesianProduct" not in plan
    assert "SinglePartition" not in plan
    import re as _re

    # every window spec carries the chunk key after event_type; a spec
    # of bare (event_type, ts...) means the whole-type sort came back.
    # (Bare event_type EXCHANGES remain legal: the carry fold groups
    # ~720 chunk summaries per type — metadata-sized.)
    specs = _re.findall(r"windowspecdefinition\(event_type#\d+, (\w+)#", plan)
    assert specs and all(s == "ck" for s in specs), specs
    assert plan.count("Exchange hashpartitioning(event_type") <= 8


def test_linear_classifier_zero_token_shuffle(spark):
    """Hashed linear scorer: the per-token hash+weight fold happens
    map-side inside one projection; nothing token-granular crosses a
    shuffle (the only exchange is the 5-row language rollup)."""
    plan = executed_plan(spark, "ml_linear_quality_score")
    assert "Join" not in plan
    assert "explode" not in plan.lower()


def test_c4_filters_exchange_free(spark):
    plan = executed_plan(spark, "text_c4_filters")
    assert "Exchange" not in plan


def test_curation_funnel_no_cartesian_no_bnlj(spark):
    """The chained funnel keeps every stage's scale shape: equi-joins
    only, nothing corpus-sized nested-looped or broadcast."""
    plan = executed_plan(spark, "pipeline_curation_funnel")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_mmr_candidates_take_ordered_no_corpus_pairs(spark):
    """MMR re-rank: the corpus-touching stage is a single scan ending in
    TakeOrderedAndProject (top-16); the all-pairs cosine matrix exists
    ONLY over the 16-candidate local frame (scans of the embeddings
    parquet appear exactly twice: candidate scoring + nothing else)."""
    plan = executed_plan(spark, "sim_mmr_rerank")
    assert "CartesianProduct" not in plan
    # selection steps operate on checkpointed local frames, never
    # re-scanning the corpus: at most the candidate stage reads parquet
    assert plan.count("Scan parquet") <= 1


def test_plain_scan_unchanged_without_inlined_rows(spark, tmp_path):
    """Data inlining must be pay-as-you-go: a table with NO inlined rows
    scans as a bare parquet read — no union, no extra local relation."""
    from ducklakexl_spark.engine import DuckLakeSpark

    lake = DuckLakeSpark(
        spark=spark,
        data_path=str(tmp_path / "d"),
        local_catalog=str(tmp_path / "c"),
    )
    lake.sql("CREATE TABLE p(id BIGINT)")
    lake.sql("INSERT INTO p SELECT id FROM range(0, 1000) AS r(id)")
    df = lake.table_df("p")
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Union" not in plan
    assert "LocalTableScan" not in plan and "LocalRelation" not in plan


def test_auc_no_corpus_sort(spark):
    # the tie-aware AUC must rank per-distinct-score AGGREGATES, not rows:
    # the only Sort beneath the window sits above a HashAggregate
    plan = executed_plan(spark, "ml_auc_quality")
    assert "CartesianProduct" not in plan
    # exactly the stats aggregation + the score-ordered window + final agg:
    # corpus rows cross one Exchange (hashpartitioning on the score key).
    # AQE prints final + initial plan sections, so each unique exchange
    # appears twice in the string.
    assert plan.count("Exchange hashpartitioning") <= 2


def test_markov_segmented_pairs_no_join(spark):
    plan = executed_plan(spark, "events_markov_transitions")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "Join" not in plan
    # r9 single-pass segmented shape: ONE events scan feeding the
    # (user, chunk) agg, a chunk-summary lag window for boundary
    # stitching, the (src,dst) agg, and the bounded src-normalization
    # window; AQE prints final + initial sections so counts double
    assert plan.count("Exchange hashpartitioning") <= 8
    assert plan.count("Scan parquet") <= 2, "second corpus scan came back"
    import re as _re

    # a user_id-partitioned window is allowed ONLY over the chunk
    # summaries (ordered by chunk_id — bounded rows per user); ordering
    # one by ts/event_id means the r8 whole-stream lead() came back
    for m in _re.finditer(r"windowspecdefinition\(user_id#\d+,([^)]*)\)", plan):
        assert "chunk_id" in m.group(1), f"whole-stream user window: {m.group(0)}"
        assert "ts#" not in m.group(1) and "event_id" not in m.group(1)


def test_hll_merge_joins_only_sketch_metadata(spark):
    # the day <= day theta join is allowed to be a BNLJ -- but ONLY over
    # aggregated register/day frames, never the raw corpus: every BNLJ
    # input must sit above an aggregate
    plan = executed_plan(spark, "sketch_hll_merge_daily")
    assert "CartesianProduct" not in plan
    import re as _re

    for m in _re.finditer(r"BroadcastNestedLoopJoin", plan):
        below = plan[m.start():]
        assert "HashAggregate" in below, "BNLJ over non-aggregated input"


def test_canonical_pick_no_bnlj(spark):
    plan = executed_plan(spark, "dedup_canonical_pick")
    assert "CartesianProduct" not in plan


def test_dsir_broadcasts_bucket_stats(spark):
    """DSIR scoring joins the constant-sized (1024-bucket) frequency
    tables back onto the corpus features — broadcast, never a
    corpus-wide SortMergeJoin (the 100 TB property of hashed-feature
    importance weighting)."""
    plan = executed_plan(spark, "text_dsir_importance")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan


def test_theta_set_ops_no_cartesian(spark):
    """Theta set expressions run on sample-sized relations; the only
    joins are semi/anti/single-row — no cartesian over the corpus."""
    plan = executed_plan(spark, "sketch_theta_set_ops")
    assert "CartesianProduct" not in plan


def test_copartition_join_adds_no_exchange(spark):
    """Both aggregations key on user_id, so the join must introduce no
    exchange of its own: every Exchange in the final plan partitions on
    a key set CONTAINING user_id (the aggregates' own requirement) —
    none is a join-induced repartition of an already-aggregated side."""
    plan = executed_plan(spark, "join_copartition_reuse")
    final = plan.split("== Initial Plan ==")[0]
    import re

    for m in re.finditer(r"Exchange hashpartitioning\(([^)]*)\)", final):
        assert "user_id" in m.group(1), m.group(0)


def test_ivfpq_no_joins_before_topk(spark):
    """IVFPQ: assignment + encode + ADC is a pure scan pipeline — no
    SortMergeJoin or cartesian anywhere, and the top-k is
    TakeOrderedAndProject (no global sort of the candidates)."""
    plan = executed_plan(spark, "sim_ivfpq_topk")
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "TakeOrderedAndProject" in plan


def test_asof_forward_union_window_no_bnlj(spark):
    """Forward ASOF (VERDICT r5 task 4) keeps the union + carry plan:
    one shuffle on the key, never a nested-loop range product."""
    plan = executed_plan(spark, "asof_forward")
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "Window" in plan


def test_broadcast_hints_are_size_gated(spark, monkeypatch):
    """VERDICT r6 task 3: explicit broadcast hints on linear-SF dims
    (customer/part/supplier/vocab frames) are gated on the base table's
    on-disk size — under the cap the hint applies; past it the frame is
    returned UN-hinted so AQE/thresholds decide instead of a forced
    driver broadcast of a multi-GB relation."""
    import ducklakexl_spark.queries as qmod

    df = qmod.load(spark, SF, "customer")
    hinted = qmod.broadcast_if_small(df, SF, "customer")
    assert hinted is not df  # tiny fixture: hint applied
    assert "hint" in hinted._jdf.queryExecution().logical().toString().lower()
    monkeypatch.setattr(qmod, "BROADCAST_CAP_BYTES", 0)
    not_hinted = qmod.broadcast_if_small(df, SF, "customer")
    assert not_hinted is df  # large dim: no forced broadcast hint


def test_q18_broadcast_gate_keeps_plan_at_small_sf(spark):
    """q18's aggregated lineitem side keeps its broadcast (gated on the
    orders table) at tested SFs — the executed plan still shows the
    broadcast join and no sort-merge across the skewed orderkey."""
    plan = executed_plan(spark, "q18_large_orders")
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


# --- r9 optimization-round shape pins (OPTIMIZATION_r09.md) ----------------


def final_plan(spark, name: str) -> str:
    """The post-AQE section only: executedPlan().toString() prints the
    final plan followed by '+- == Initial Plan ==', and shape counts over
    the whole string would double-count every node."""
    return executed_plan(spark, name).split("Initial Plan")[0]


def test_simhash_self_join_reuses_one_exchange(spark):
    """dedup_simhash r9: the banded self-join's sides are the same
    fingerprint pipeline; the merge hint makes them identical (b, v)
    shuffles that ReuseExchange collapses — the tokenize+vote pass must
    execute once (a regression re-runs the corpus pipeline twice)."""
    plan = final_plan(spark, "dedup_simhash")
    assert "ReusedExchange" in plan
    assert plan.count("Scan parquet") - plan.count("ReusedExchange") <= 1


def test_phash_self_join_reuses_one_exchange(spark):
    """mm_phash_dedup r9: same ReuseExchange discipline — the Arrow
    pHash decode (mapInPandas) must run once, not per join side."""
    plan = final_plan(spark, "mm_phash_dedup")
    assert "ReusedExchange" in plan
    assert plan.count("MapInPandas") - plan.count("ReusedExchange") <= 1


def test_welch_single_scan_no_bnlj(spark):
    """stats_welch_ttest r9: pair generation is a Generate chain over
    one collected stats array — one events scan, no nested-loop join of
    two replayed aggregates."""
    plan = final_plan(spark, "stats_welch_ttest")
    assert "BroadcastNestedLoopJoin" not in plan
    assert plan.count("Scan parquet") == 1


def test_retention_single_scan_no_join(spark):
    """events_retention_cohorts r9: cohort week comes from a window over
    the distinct user-week frame — one events scan, no join."""
    plan = final_plan(spark, "events_retention_cohorts")
    assert plan.count("Scan parquet") == 1
    assert "SortMergeJoin" not in plan and "BroadcastHashJoin" not in plan


def test_gapfill_single_scan_no_join(spark):
    """events_gapfill_locf r9: each observation generates its own
    gap-run (lead + sequence) — one events scan, no grid join."""
    plan = final_plan(spark, "events_gapfill_locf")
    assert plan.count("Scan parquet") == 1
    assert "SortMergeJoin" not in plan and "BroadcastHashJoin" not in plan


def test_hll_distinct_single_scan_no_bnlj(spark):
    """sketch_hll_distinct r9: registers and the exact count share one
    distinct-user pass — one scan, no crossJoin of a second aggregate."""
    plan = final_plan(spark, "sketch_hll_distinct")
    assert plan.count("Scan parquet") == 1
    assert "BroadcastNestedLoopJoin" not in plan


def test_confusion_f1_single_scan_no_join(spark):
    """ml_confusion_f1 r9: both filter predicates evaluate in one
    projection of one documents scan — no doc_id self-equi-join."""
    plan = final_plan(spark, "ml_confusion_f1")
    assert plan.count("Scan parquet") == 1
    assert "SortMergeJoin" not in plan and "BroadcastHashJoin" not in plan


def test_q17_single_fact_scan_window_cut(spark):
    """q17 r9: the per-part quantity cut is a window over the already
    brand-filtered fact rows — exactly one lineitem scan."""
    plan = final_plan(spark, "q17_small_qty_revenue")
    assert plan.count("Scan parquet") == 2  # lineitem + part
    assert "Window" in plan


def test_feature_scaling_single_scan_no_join(spark):
    """ml_feature_scaling r9: min_z/max_z fold into the stats pass (z is
    monotone in x) — one scan, no pivot join-back."""
    plan = final_plan(spark, "ml_feature_scaling")
    assert plan.count("Scan parquet") == 1
    assert "SortMergeJoin" not in plan and "BroadcastHashJoin" not in plan


def test_q03_shuffle_hash_join_past_broadcast_scale(spark, monkeypatch):
    """q03 r9 (sf100-pair finding): past the broadcast cap the
    orders⋈lineitem join is hinted SHUFFLE_HASH — no per-pass
    SortMergeJoin sort of the corpus-sized probe side (25.5 → 14.2 s
    warm at sf100).  Simulated here by zeroing the size gate; the
    fixture-scale shape (customer broadcast, TakeOrderedAndProject)
    is pinned by test_q03_broadcasts_dimensions above."""
    import ducklakexl_spark.queries as q

    from ducklakexl_spark.queries.relational import q03_shipping_priority

    monkeypatch.setattr(q, "BROADCAST_CAP_BYTES", -1)
    try:
        # call the raw builder (not the memoizing registry wrapper) so
        # the patched-gate plan never enters the shared plan cache
        df = q03_shipping_priority(spark, SF)
        plan = df._jdf.queryExecution().optimizedPlan().toString()
        assert "shuffle_hash" in plan or "SHUFFLE_HASH" in plan
    finally:
        # clears the shared plan+load caches (later tests rebuild their
        # plans — the safe trade for isolation); _SIZE_CACHE is
        # deliberately left populated: this test never perturbed it,
        # only the gate constant, so its entries stay valid
        q.clear_plan_caches(spark)


# --- r10 optimization-round shape pins (OPTIMIZATION_r10.md) ----------------


def test_q03_hint_withheld_while_filtered_build_broadcastable(
    spark, monkeypatch
):
    """q03 r10 (ADVICE r9): the SHUFFLE_HASH gate keys on the ESTIMATED
    FILTERED build (orders bytes x 0.18 selectivity), not the unfiltered
    base — at mid scales where the filtered build still broadcasts, the
    hint must be withheld so AQE keeps the broadcast plan (probe never
    shuffled).  Simulated by a cap between frac*bytes and bytes: the old
    gate (unfiltered > cap) would hint; the fixed gate must not."""
    import ducklakexl_spark.queries as q

    from ducklakexl_spark.queries.relational import q03_shipping_priority

    orders_bytes = q._path_bytes(f"{SF}/orders.parquet")
    monkeypatch.setattr(q, "BROADCAST_CAP_BYTES", int(orders_bytes * 0.5))
    try:
        df = q03_shipping_priority(spark, SF)
        plan = df._jdf.queryExecution().optimizedPlan().toString()
        assert "shuffle_hash" not in plan and "SHUFFLE_HASH" not in plan
    finally:
        q.clear_plan_caches(spark)


def test_q03_hint_withheld_when_build_partition_oversized(spark, monkeypatch):
    """q03 r10 (ADVICE r9 upper gate): Spark's shuffled-hash BUILD side
    does not spill, so once the estimated filtered-build bytes per
    shuffle partition exceed the safety cap the hint must be withheld
    and SMJ's spill-safe path stand."""
    import ducklakexl_spark.queries as q

    from ducklakexl_spark.queries.relational import q03_shipping_priority

    monkeypatch.setattr(q, "BROADCAST_CAP_BYTES", -1)
    monkeypatch.setattr(q, "SHUFFLE_HASH_BUILD_PARTITION_CAP", 0)
    try:
        df = q03_shipping_priority(spark, SF)
        plan = df._jdf.queryExecution().optimizedPlan().toString()
        assert "shuffle_hash" not in plan and "SHUFFLE_HASH" not in plan
    finally:
        q.clear_plan_caches(spark)


def test_minhash_lsh_candidate_frame_persisted(spark):
    """dedup_minhash_lsh r10 (VERDICT r9 task 3): the banded candidate
    pairs are the third persisted dedup-index table — the verify
    prefilter's build side reads the cache instead of replaying the
    doc-sized band self-join, so the executed plan evaluates the band
    join at most once (inside the cache materialization) and reads the
    candidate cache twice."""
    from ducklakexl_spark.queries import dedup

    plan = final_plan(spark, "dedup_minhash_lsh")
    # both candidate references (verify join + prefilter ids) read caches
    assert plan.count("InMemoryTableScan") >= 2
    # identity: the index caches, per session+sf_dir
    assert dedup.lsh_candidate_pairs(spark, SF) is dedup.lsh_candidate_pairs(
        spark, SF
    )
    # the band self-join executes at most once: every join on the band
    # key lives inside the ONE InMemoryRelation description (the cache
    # build), never as a second live join in the query DAG.  (r9 shape:
    # two band-key joins, one per candidate reference.)
    band_joins = [
        ln for ln in plan.splitlines()
        if "Join" in ln and "band_key" in ln
    ]
    assert len(band_joins) <= 1


def test_diversity_coverage_single_corpus_scan(spark):
    """sim_diversity_coverage r10 (VERDICT r9 task 6): the 10-row
    selection frame is checkpointed, so the query's executed plan is ONE
    embeddings corpus scan against a broadcast — the mmr/top5 selection
    pipelines (their own corpus scans) no longer replay per execution."""
    plan = final_plan(spark, "sim_diversity_coverage")
    assert plan.count("Scan parquet") == 1


def test_ngram_jaccard_checkpointed_shingles(spark):
    """dedup_ngram_jaccard r10 (VERDICT r9 task 6): the (doc_id, shingle
    set) frame is checkpointed and feeds both sides of the quadratic
    audit join — zero parquet rescans; tokenization runs once."""
    plan = final_plan(spark, "dedup_ngram_jaccard")
    assert plan.count("Scan parquet") == 0
