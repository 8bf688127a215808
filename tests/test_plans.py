"""Physical-plan regression tests — the 100 TB scale contract.

Correctness tests prove the numbers; these prove the SHAPE: filters reach the
parquet scan, projections prune columns, dimensions broadcast instead of
shuffling, and aggregates don't rescan the fact table. A regression here is
invisible at sf0.01 and catastrophic at 100 TB, which is exactly why it's
pinned.
"""

from __future__ import annotations

import re

import pytest

from amazon_kinesis_data_streams_health_check_spark.plans.registry import all_queries

QUERIES = all_queries()


def plan_of(spark, sf, name: str) -> str:
    df = QUERIES[name].builder(spark, sf)
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def test_q6_pushdown_and_pruning(spark, sf_small):
    """The pure scan query: every predicate pushed, 4-column read schema."""
    plan = plan_of(spark, sf_small, "q6_forecast_revenue")
    pushed = re.search(r"PushedFilters: \[(.*?)\]", plan)
    assert pushed, plan
    for col in ("l_discount", "l_quantity"):
        assert col in pushed.group(1), f"{col} not pushed: {pushed.group(1)}"
    read = re.search(r"ReadSchema: struct<(.*?)>", plan)
    assert read, plan
    cols = {c.split(":")[0] for c in read.group(1).split(",") if c}
    # Projection pruning: only the columns the query touches, not all 7+.
    assert cols <= {"l_shipdate", "l_discount", "l_quantity", "l_extendedprice"}, cols


def test_q9_dimensions_broadcast_single_fact_shuffle(spark, sf_small):
    """Fact-to-dim joins must broadcast; only orders<->lineitem may shuffle."""
    plan = plan_of(spark, sf_small, "q9_product_profit")
    assert plan.count("BroadcastHashJoin") >= 2, plan
    assert "SortMergeJoin" not in plan or plan.count("SortMergeJoin") <= 1, plan


def test_q7_nation_pair_broadcasts(spark, sf_small):
    plan = plan_of(spark, sf_small, "q7_volume_shipping")
    assert plan.count("BroadcastHashJoin") >= 2, plan


def test_q1_single_aggregation_exchange(spark, sf_small):
    """Scan -> partial agg -> one exchange -> final agg. More exchanges means
    the partial aggregation (map-side combine) was lost."""
    plan = plan_of(spark, sf_small, "q1_pricing_summary")
    # Exactly one Exchange node (the formatted dump names each node twice:
    # once in the tree, once as a "(n) Exchange" detail header — count the
    # headers).
    n_exchange_nodes = len(re.findall(r"^\(\d+\) Exchange", plan, re.M))
    assert n_exchange_nodes == 1, plan
    assert len(re.findall(r"^\(\d+\) HashAggregate", plan, re.M)) == 2, plan


def test_q11_no_second_fact_scan(spark, sf_small):
    """The global-total scalar must reuse the persisted per-nation aggregate,
    not rescan lineitem (RemoveRedundantAggregates hazard)."""
    plan = plan_of(spark, sf_small, "q11_important_nations")
    n_li_scans = len(re.findall(r"Scan parquet .*?lineitem|lineitem\.parquet", plan))
    assert n_li_scans <= 1, plan
    assert "InMemoryTableScan" in plan or "InMemoryRelation" in plan, plan


def test_stratified_sample_is_scan_plus_filter(spark, sf_small):
    """Sampling must stay a narrow scan+filter: no exchange, no aggregate."""
    plan = plan_of(spark, sf_small, "curation_stratified_sample")
    assert "Exchange" not in plan, plan
    assert "HashAggregate" not in plan, plan


def test_pack_sequences_window_partitions_by_source(spark, sf_small):
    """The packing window must hash-partition by source (parallel at scale),
    never a single global window."""
    plan = plan_of(spark, sf_small, "curation_pack_sequences")
    assert "SinglePartition" not in plan, plan
    assert re.search(r"hashpartitioning\(source", plan), plan


@pytest.mark.parametrize(
    "name",
    ["q4_order_priority", "q12_late_lines_by_flag", "q16_supplier_part_counts"],
)
def test_semi_anti_queries_have_no_cartesian(spark, sf_small, name):
    plan = plan_of(spark, sf_small, name)
    assert "CartesianProduct" not in plan, plan


def test_ann_topk_has_no_per_query_window(spark, sf_small):
    """Brute-force top-k must be two-phase (local top-k then merge): a
    row_number window partitioned only by query_id routes the entire scored
    corpus for one query onto one task — the r01-flagged 100 TB scale-killer."""
    plan = plan_of(spark, sf_small, "ann_topk_bruteforce")
    assert not re.findall(r"^\(\d+\) Window", plan, re.M), plan
    assert "row_number" not in plan, plan
    # Both phases partially aggregate before their exchange.
    assert len(re.findall(r"^\(\d+\) (?:Object)?HashAggregate", plan, re.M)) >= 4, plan


@pytest.mark.parametrize("name", ["ann_ivf", "ann_ivf_flat"])
def test_ivf_rerank_has_no_per_query_window(spark, sf_small, name):
    """The IVF re-rank shares topk_per_query with brute-force: no window may
    partition on query_id (ann_ivf_flat's only window numbers the 16-row
    centroid set — a constant-size single-partition op, which is fine)."""
    plan = plan_of(spark, sf_small, name)
    assert "windowspecdefinition(query_id" not in plan, plan


def test_contamination_eval_side_broadcasts(spark, sf_small):
    """The eval slice must be the broadcast side: the training-corpus n-gram
    explode may never shuffle (at 100 TB that shuffle IS the job)."""
    plan = plan_of(spark, sf_small, "contamination_check")
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan


def test_vocab_stats_two_phase_no_expand(spark, sf_small):
    """vocab_stats computes doc frequency via (token, doc_id) pre-aggregation,
    not countDistinct: no Expand node, and the hot-token key never feeds a
    single-reducer distinct."""
    plan = plan_of(spark, sf_small, "vocab_stats")
    assert not re.findall(r"^\(\d+\) Expand", plan, re.M), plan


def test_embedding_centroids_single_shuffle_partial_agg(spark, sf_small):
    """posexplode -> one keyed agg: a single hash-partitioned shuffle (the
    other exchange is parallel_scan's round-robin spread of the single-file
    test table) with a map-side partial aggregate before it."""
    plan = plan_of(spark, sf_small, "embedding_centroids")
    assert len(re.findall(r"hashpartitioning\(label", plan)) == 1, plan
    assert len(re.findall(r"^\(\d+\) HashAggregate", plan, re.M)) >= 2, plan


def test_salted_join_shuffles_on_salt_no_broadcast(spark, sf_small):
    """salted_join must materialize as a shuffled join keyed by
    (user_id, _salt) — a broadcast would make the salt dead weight, and an
    unsalted shuffle would re-concentrate hot keys."""
    plan = plan_of(spark, sf_small, "skew_salted_join")
    assert "ShuffledHashJoin" in plan, plan
    assert "BroadcastHashJoin" not in plan, plan
    assert re.search(r"hashpartitioning\(user_id#\d+L?, _salt", plan), plan


def test_doc_chunks_is_shuffle_free(spark, sf_small):
    """Chunking is pure narrow work: sequence-explode + substring never
    justify an exchange (parallel_scan's round-robin spread of the single
    test file is the only permitted one)."""
    plan = plan_of(spark, sf_small, "doc_chunks")
    exchanges = re.findall(r"^\(\d+\) Exchange", plan, re.M)
    assert len(exchanges) <= 1, plan
    assert "hashpartitioning" not in plan, plan
    assert "Generate" in plan, plan  # the sequence-explode stayed codegen'd


def test_denylist_scrub_is_shuffle_free(spark, sf_small):
    plan = plan_of(spark, sf_small, "denylist_scrub")
    assert "hashpartitioning" not in plan, plan


def test_tfidf_topk_is_two_phase_no_source_window(spark, sf_small):
    """The per-source top-k must be local-slice + merge: a row_number window
    partitioned by source would hold the whole vocabulary of a source in one
    task at 100 TB."""
    plan = plan_of(spark, sf_small, "tfidf_top_terms")
    assert "windowspecdefinition(source" not in plan, plan
    assert "row_number" not in plan, plan
    # n_docs scalar joins as broadcast, never a shuffle.
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan, plan


def test_inverted_index_postings_capped_two_phase(spark, sf_small):
    """Postings must be capped per (term, partition) BEFORE the term-level
    merge — the plan shows slice(...) inside the partial aggregate, so no
    stopword ever materializes its full posting list in one buffer."""
    plan = plan_of(spark, sf_small, "inverted_index")
    assert "windowspecdefinition" not in plan, plan
    assert plan.count("slice") >= 2, plan


def test_length_quartiles_window_partitions_by_source(spark, sf_small):
    """ntile must partition by source (bounded cardinality) — an empty
    partition spec would be a single-task global sort."""
    plan = plan_of(spark, sf_small, "length_quartiles")
    assert "windowspecdefinition(source" in plan, plan


def test_embedding_quantization_broadcasts_dim_stats(spark, sf_small):
    """Per-dim stats (64 keys, partial-aggregated) broadcast back to the
    vector scan; quantize/reconstruct stay narrow — no second wide stage."""
    plan = plan_of(spark, sf_small, "embedding_quantization")
    assert "BroadcastNestedLoopJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan
    assert len(re.findall(r"hashpartitioning\(dim", plan)) == 1, plan


def test_unpivot_single_fact_scan_no_union(spark, sf_small):
    """stack() must melt in one Generate over ONE lineitem scan — the
    4-scan UNION ALL formulation (the oracle's) is what we refuse to plan."""
    plan = plan_of(spark, sf_small, "lineitem_measures_unpivot")
    assert "Union" not in plan, plan
    assert len(re.findall(r"^\(\d+\) Scan parquet", plan, re.M)) == 1, plan


def test_grouping_sets_single_expand_single_shuffle(spark, sf_small):
    """GROUPING SETS = one Expand + one keyed aggregation exchange."""
    plan = plan_of(spark, sf_small, "revenue_grouping_sets")
    assert len(re.findall(r"^\(\d+\) Expand", plan, re.M)) == 1, plan
    assert len(re.findall(r"^\(\d+\) Exchange", plan, re.M)) == 1, plan


def test_event_time_histogram_partial_agg(spark, sf_small):
    """Bounded-key histogram: map-side partial aggregate before the single
    exchange."""
    plan = plan_of(spark, sf_small, "event_time_histogram")
    assert len(re.findall(r"^\(\d+\) HashAggregate", plan, re.M)) >= 2, plan
    assert len(re.findall(r"^\(\d+\) Exchange", plan, re.M)) == 1, plan


def test_topn_plans_as_take_ordered_not_full_sort(spark, sf_small):
    """ORDER BY + LIMIT must plan as TakeOrderedAndProject (per-partition
    top-N + driver merge of N) — a global range-partitioned sort of the
    whole join output to keep 10 rows is the scale bug this pins out."""
    plan = plan_of(spark, sf_small, "q3_shipping_priority")
    assert "TakeOrderedAndProject" in plan, plan
    assert "rangepartitioning" not in plan, plan


def test_repetition_stats_no_window_no_cartesian(spark, sf_small):
    """Per-doc n-gram metrics group on (doc_id, gram) — never a positional
    window (whose per-doc partitions would serialize long docs) and never a
    cross join."""
    plan = plan_of(spark, sf_small, "repetition_stats")
    assert "windowspecdefinition" not in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_substring_dup_dedups_shingles_narrowly(spark, sf_small):
    """Within-doc shingle dedup must happen row-locally (array_distinct
    before the explode) so the shuffle never carries duplicate shingles a
    single row already knew about. The shingle stage sits behind a
    localCheckpoint in the final plan (pinning ONE computation for its three
    consumers), so the row-local property is asserted on the data: a doc
    that is one 8-gram repeated many times must contribute exactly one
    exploded shingle row."""
    from pyspark.sql import functions as F

    from amazon_kinesis_data_streams_health_check_spark.plans.corpus_queries import (
        _SHINGLE_N,
        _SPARK_TOK,
    )

    doc = spark.createDataFrame(
        [(1, " ".join(["tok"] * (_SHINGLE_N * 10)))], "doc_id long, text string"
    )
    parts = ", ".join(f"element_at(t, i + {j})" for j in range(_SHINGLE_N))
    shs = doc.select(F.expr(_SPARK_TOK).alias("t")).select(
        F.expr(
            f"if(size(t) >= {_SHINGLE_N},"
            f" array_distinct(transform(sequence(1, size(t) - {_SHINGLE_N - 1}),"
            f" i -> md5(concat_ws(' ', {parts})))),"
            f" cast(array() as array<string>))"
        ).alias("shs")
    )
    assert shs.select(F.explode("shs")).count() == 1

    plan = plan_of(spark, sf_small, "substring_dup_frac")
    assert "windowspecdefinition" not in plan, plan
    # Shuffle budget: gram groupBy, gram join, per-doc groupBy, final doc
    # join (+ AQE reads) — never a per-shingle window or a cartesian.
    assert "CartesianProduct" not in plan, plan


def test_split_assign_is_narrow_plus_one_exchange(spark, sf_small):
    """Split assignment is a pure key-hash map; the only wide stage is the
    tiny (source, split) aggregation, partially aggregated map-side."""
    plan = plan_of(spark, sf_small, "split_assign")
    assert len(re.findall(r"^\(\d+\) Exchange", plan, re.M)) == 1, plan
    assert len(re.findall(r"^\(\d+\) HashAggregate", plan, re.M)) >= 2, plan


def test_knn_graph_no_per_query_window_no_cartesian(spark, sf_small):
    """The kNN graph joins on the LSH bucket key (hash join, never a
    cartesian n^2) and merges top-k two-phase — no row_number window over
    query_id."""
    plan = plan_of(spark, sf_small, "knn_graph_lsh")
    assert "CartesianProduct" not in plan, plan
    assert "windowspecdefinition" not in plan, plan
    assert "row_number" not in plan, plan
    assert plan.count("slice") >= 2, plan


def test_hybrid_search_pushes_metadata_filters(spark, sf_small):
    """The metadata predicate must reach the documents parquet scan
    (PushedFilters) so at 100 TB the vector math runs only on survivors;
    top-k stays two-phase (no per-query window)."""
    plan = plan_of(spark, sf_small, "hybrid_search")
    pushed = re.findall(r"PushedFilters: \[([^\]]*)\]", plan)
    assert any("lang" in p and "n_chars" in p for p in pushed), plan
    assert "windowspecdefinition" not in plan, plan
    assert "row_number" not in plan, plan


def test_table_profile_single_scan_no_expand(spark, sf_small):
    """Multi-column profiling must melt (Generate) over ONE fact scan and
    two-phase its distincts — multi-countDistinct's Expand (plan-wide row
    multiplication inside the aggregate) is the shape this refuses."""
    plan = plan_of(spark, sf_small, "table_profile")
    assert not re.findall(r"^\(\d+\) Expand", plan, re.M), plan
    assert len(re.findall(r"^\(\d+\) Scan parquet", plan, re.M)) == 1, plan
    # Phase 1 (over the raw melted rows — the volume that matters) must hash-
    # aggregate; only the tiny per-column fold may sort-aggregate (its string
    # extrema buffers force SortAggregate, over 6 groups).
    assert len(re.findall(r"^\(\d+\) HashAggregate", plan, re.M)) >= 2, plan


def test_funnel_pushes_stage_filters(spark, sf_small):
    """Every funnel stage filters on event_type at the scan (PushedFilters)
    and composes keyed aggregations — no per-user window over event lists."""
    plan = plan_of(spark, sf_small, "funnel_stages")
    pushed = re.findall(r"PushedFilters: \[([^\]]*)\]", plan)
    assert any("event_type" in p for p in pushed), plan
    assert "windowspecdefinition" not in plan, plan


def test_cohort_retention_no_expand_no_countdistinct_window(spark, sf_small):
    """Distinct (user, week) pairs feed a plain count — never an Expand
    (multi-countDistinct) or a distinct-count window."""
    plan = plan_of(spark, sf_small, "cohort_retention")
    assert not re.findall(r"^\(\d+\) Expand", plan, re.M), plan
    assert "windowspecdefinition" not in plan, plan


def test_scd2_windows_partition_by_user(spark, sf_small):
    """Both SCD2 windows must partition by user_id — an empty partition spec
    would serialize the whole event stream through one task."""
    plan = plan_of(spark, sf_small, "scd2_state_history")
    assert "windowspecdefinition(user_id" in plan, plan
    assert "SinglePartition" not in plan, plan


def test_gap_interpolation_uses_growing_frames_only(spark, sf_small):
    """Neighbor search must be growing frames (unbounded-preceding ->
    current, forward via DESC order): a current->unbounded-following frame
    re-scans per row — O(n^2) per partition, measured 100x slower on the
    month-long grid."""
    plan = plan_of(spark, sf_small, "metric_gap_interpolation")
    assert "unboundedfollowing" not in plan.lower(), plan
    assert "windowspecdefinition(stream_name" in plan, plan


def test_anomaly_flags_window_partitions_by_stream(spark, sf_small):
    """The sliding 60-row frame must partition by stream_name — and the test
    itself must stay integer-only (no float aggregate in the window)."""
    plan = plan_of(spark, sf_small, "metric_anomaly_flags")
    assert "windowspecdefinition(stream_name" in plan, plan
    assert "SinglePartition" not in plan, plan


def test_rolling_actives_explode_not_range_join(spark, sf_small):
    """Rolling coverage comes from a narrow 7-day explode per pair — a
    day-range join (nested-loop compare against the calendar) is the shape
    this refuses."""
    plan = plan_of(spark, sf_small, "rolling_active_users")
    assert "Generate" in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_pagerank_no_cartesian(spark, sf_small):
    plan = plan_of(spark, sf_small, "pagerank_knn")
    assert "CartesianProduct" not in plan, plan


def test_driver_window_has_no_scale_red_flags(spark, sf_small):
    """Sweep EVERY batch query in the driver's 50-entry window: no
    CartesianProduct anywhere, and no global range-partitioned sort outside
    a TakeOrderedAndProject (per-query pins catch specifics; this catches a
    regression sneaking into any window query we didn't pin individually)."""
    names = list(QUERIES)[:50]
    flags = {}
    for name in names:
        if name.startswith("streaming_"):
            continue  # streaming drives execute on build; plans pinned elsewhere
        plan = plan_of(spark, sf_small, name)
        hits = []
        if "CartesianProduct" in plan:
            hits.append("cartesian")
        if "rangepartitioning" in plan and "TakeOrderedAndProject" not in plan:
            hits.append("global-sort")
        if hits:
            flags[name] = hits
    assert not flags, flags


def test_runtime_bloom_filter_prunes_shuffle_join_fact_scan(spark, sf_small):
    """The 100 TB regime where the dim does NOT fit a broadcast: Spark's
    runtime bloom filter must inject (bloom_filter_agg on the filtered dim,
    might_contain on the fact scan) so the shuffle join still prunes fact
    rows before the exchange. Pinned with broadcast disabled to model the
    big-dim case; confs restored after."""
    from pyspark.sql import functions as F

    saved = {
        k: spark.conf.get(k)
        for k in (
            "spark.sql.autoBroadcastJoinThreshold",
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
        )
    }
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set(
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
            "0",
        )
        li = spark.read.parquet(f"{sf_small}/lineitem.parquet")
        orders = spark.read.parquet(f"{sf_small}/orders.parquet").filter(
            F.col("o_orderpriority") == "1-URGENT"
        )
        j = li.join(orders, li.l_orderkey == orders.o_orderkey).select(
            "l_orderkey", "l_extendedprice"
        )
        plan = j._sc._jvm.PythonSQLUtils.explainString(
            j._jdf.queryExecution(), "formatted"
        )
        assert "bloom_filter_agg" in plan, plan
        assert "might_contain" in plan, plan
    finally:
        for k, v in saved.items():
            spark.conf.set(k, v)


def test_audio_windows_is_single_pass_no_shuffle(spark, sf_small):
    """E4 audio framing: one Arrow mapInPandas pass over the scan — a keyed
    shuffle (or a second scan) in this plan means the framing stopped being
    partition-local. (parallel_scan's round-robin exchange is the expected
    small-file parallelization, not a keyed shuffle.)"""
    plan = plan_of(spark, sf_small, "media_audio_windows")
    assert "Exchange hashpartitioning" not in plan, plan
    assert "Exchange rangepartitioning" not in plan, plan
    assert len(re.findall(r"\(\d+\) Scan parquet", plan)) == 1, plan


def test_surprisal_vocab_broadcasts_no_token_shuffle_join(spark, sf_small):
    """The scoring pass joins tokens to the vocabulary BROADCAST — a token-
    keyed shuffle join would put every 'the' on one reducer."""
    plan = plan_of(spark, sf_small, "doc_surprisal_score")
    assert plan.count("BroadcastHashJoin") >= 1, plan
    assert "SortMergeJoin" not in plan, plan


def test_epoch_index_no_data_plane_global_sort(spark, sf_small):
    """Only the bucket-count aggregate (<=65536 rows) may cross a single
    partition; the document-bearing side must shuffle by bucket hash and
    join the offsets broadcast."""
    plan = plan_of(spark, sf_small, "epoch_global_index")
    assert plan.count("BroadcastHashJoin") >= 1, plan
    assert "CartesianProduct" not in plan, plan
    # The single-partition exchange exists exactly once (offset cumsum).
    assert plan.count("SinglePartition") == 1, plan


def test_adaptive_filter_threshold_broadcasts(spark, sf_small):
    plan = plan_of(spark, sf_small, "adaptive_quality_filter")
    assert plan.count("BroadcastHashJoin") >= 1, plan
    assert "SortMergeJoin" not in plan, plan


def test_phash_dedup_no_cartesian_banded_join(spark, sf_small):
    plan = plan_of(spark, sf_small, "media_phash_dedup")
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan


def test_source_overlap_grid_broadcasts(spark, sf_small):
    plan = plan_of(spark, sf_small, "source_overlap_jaccard")
    assert "CartesianProduct" not in plan, plan


def test_allpairs_no_cartesian_no_nested_loop(spark, sf_small):
    plan = plan_of(spark, sf_small, "dedup_jaccard_allpairs")
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan


def test_market_basket_narrow_pairs_broadcast_dims_topn(spark, sf_small):
    """Pair generation must be the narrow array comprehension (no item-level
    self-join), item counts broadcast, and the final top-N must be
    TakeOrderedAndProject, not a global sort."""
    plan = plan_of(spark, sf_small, "market_basket_rules")
    assert "CartesianProduct" not in plan, plan
    assert "SortMergeJoin" not in plan, plan
    assert "TakeOrderedAndProject" in plan, plan
    assert plan.count("BroadcastHashJoin") >= 2, plan


def test_sketch_intersection_broadcasts_pair_dimension(spark, sf_small):
    """The pair fan-out and every enrichment join ride broadcasts; the only
    shuffles are keyed aggregations (no SortMergeJoin on user rows)."""
    plan = plan_of(spark, sf_small, "sketch_set_intersection")
    assert "CartesianProduct" not in plan, plan
    assert plan.count("BroadcastHashJoin") >= 3, plan


def test_incremental_join_maintenance_broadcasts_customer_legs(spark, sf_small):
    """Every delta leg joins a broadcast customer side — the delta refresh
    must never shuffle the fact table on the join key."""
    plan = plan_of(spark, sf_small, "incremental_join_maintenance")
    assert "SortMergeJoin" not in plan, plan
    assert "CartesianProduct" not in plan, plan
    assert plan.count("BroadcastHashJoin") >= 3, plan


def test_dedup_semantic_label_blocked_broadcast_centroids(spark, sf_small):
    """The pair scan must ride the label block (no cartesian / nested-loop)
    and centroids must broadcast back to members, not shuffle them."""
    plan = plan_of(spark, sf_small, "dedup_semantic")
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "BroadcastHashJoin" in plan, plan


def test_contrastive_pairs_no_per_query_window(spark, sf_small):
    """Both pair-class selections must be the two-phase top-k, never a
    row_number window over the scored candidate set."""
    plan = plan_of(spark, sf_small, "contrastive_pairs_mining")
    assert "windowspecdefinition(query_id" not in plan, plan
    assert "row_number" not in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_reshard_routing_lineage_broadcasts(spark, sf_small):
    """Shard ownership must resolve as a broadcast equi-join on epoch (tiny
    lineage side), never a shuffled or nested-loop interval join over the
    event stream."""
    plan = plan_of(spark, sf_small, "shard_reshard_routing")
    assert "BroadcastHashJoin" in plan, plan
    assert "CartesianProduct" not in plan, plan
    assert "SortMergeJoin" not in plan, plan


def test_pca_gram_is_partial_aggregated(spark, sf_small):
    """The d^2-key gram aggregation must partial-aggregate map-side (two
    HashAggregate levels around one exchange) so shuffle volume is
    O(partitions * d^2), not O(rows * d^2); the projection pass the query
    returns must be fully narrow (zero exchanges)."""
    import pyspark.sql.functions as F

    from amazon_kinesis_data_streams_health_check_spark.plans.ext_queries import (
        _PCA_Q,
        _pca_gram,
    )

    emb = spark.read.parquet(f"{sf_small}/embeddings.parquet")
    q = emb.select(
        F.expr(
            f"transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * {_PCA_Q}) AS BIGINT))"
        ).alias("q")
    )
    gdf = _pca_gram(q)
    gplan = gdf._sc._jvm.PythonSQLUtils.explainString(
        gdf._jdf.queryExecution(), "formatted"
    )
    assert len(re.findall(r"^\(\d+\) (?:Object)?HashAggregate", gplan, re.M)) >= 2, gplan
    assert len(re.findall(r"^\(\d+\) Exchange", gplan, re.M)) == 1, gplan

    plan = plan_of(spark, sf_small, "embedding_pca_project")
    assert not re.findall(r"^\(\d+\) Exchange", plan, re.M), plan
    assert "CartesianProduct" not in plan, plan


def test_dup_span_windows_partition_by_doc(spark, sf_small):
    """The gaps-and-islands windows may only partition by doc_id (bounded by
    document length) — a global or position-keyed window would serialize the
    corpus onto one task."""
    plan = plan_of(spark, sf_small, "dup_span_stats")
    for spec in re.findall(r"windowspecdefinition\(([^,]+),", plan):
        assert "doc_id" in spec, plan
    assert "CartesianProduct" not in plan, plan


def test_kpl_deaggregate_single_shard_shuffle(spark, sf_small):
    """The de-aggregation legs must be narrow Arrow maps (MapInPandas, no
    per-row Python); the only sort-merge join allowed is the FULL-OUTER
    audit join of two per-shard aggregates (bounded by shard count — full
    outer cannot broadcast); no cartesian beyond the idiomatic 1-row
    broadcast audit attach. The pack leg's per-shard applyInPandas sits
    behind the localCheckpoint boundary and is pinned functionally by
    tests/test_kpl.py."""
    plan = plan_of(spark, sf_small, "kinesis_kpl_deaggregate")
    assert "CartesianProduct" not in plan, plan
    smj = re.findall(r"^\(\d+\) SortMergeJoin (\w+)", plan, re.M)
    assert all(k == "FullOuter" for k in smj) and len(smj) <= 1, plan
    assert "MapInPandas" in plan, plan


def test_shard_order_audit_partitions_by_shard(spark, sf_small):
    """The delivery-order audit window may only partition by shard_id —
    per-shard volume is bounded by Kinesis' own shard throughput cap, so a
    per-shard sort is safe; a global window would not be."""
    plan = plan_of(spark, sf_small, "shard_order_audit")
    for spec in re.findall(r"windowspecdefinition\(([^,]+),", plan):
        assert "shard_id" in spec, plan
    assert "CartesianProduct" not in plan, plan


def test_bigram_surprisal_counts_fold_from_type_table(spark, sf_small):
    """The unigram-prefix counts and vocabulary size must fold from the
    bigram TYPE table, not rescan the exploded token stream: the exploded
    checkpoint feeds exactly two consumers (counting pass + scoring pass)."""
    plan = plan_of(spark, sf_small, "doc_bigram_surprisal")
    assert "CartesianProduct" not in plan.replace(
        "BroadcastNestedLoopJoin Cross", ""
    ), plan
    # The scoring join re-keys on the uniform bigram key by design; no
    # sort-merge should survive AQE at any tested size.
    assert len(re.findall(r"^\(\d+\) Scan ExistingRDD", plan, re.M)) <= 5, plan


def test_shard_autoscale_event_side_never_shuffles(spark, sf_small):
    """Both audit passes over the event stream must resolve as broadcast
    joins against the bounded layout/children relations (the range
    predicate makes them nested-loop, which is fine with a <=16-row build
    side); a SortMergeJoin or a true cartesian over events would not
    survive 100x."""
    plan = plan_of(spark, sf_small, "shard_autoscale_plan")
    assert "SortMergeJoin" not in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_shard_autoscale_plan_tiles_keyspace(spark, sf_small):
    """The planned child shards must exactly tile [0, 2^32) with no gap or
    overlap (the SplitShard/MergeShards coverage invariant consumers rely
    on), splits must halve their parent, merges must span exactly their two
    adjacent parents, and new shard ids must continue the sequence."""
    from amazon_kinesis_data_streams_health_check_spark.plans.healthcheck_queries import (
        _ASP_LAYOUT,
        _ASP_WIDTHS,
    )
    from amazon_kinesis_data_streams_health_check_spark.plans.registry import get

    rows = sorted(
        get("shard_autoscale_plan").builder(spark, sf_small).collect(),
        key=lambda r: r.lo,
    )
    # exact tiling
    assert rows[0].lo == 0 and rows[-1].hi == 1 << 32
    for a, b in zip(rows, rows[1:]):
        assert a.hi == b.lo, (a, b)
    layout = {f"shardId-{s:012d}": (lo, hi) for s, lo, hi in _ASP_LAYOUT}
    splits = [r for r in rows if r.action == "split-child"]
    for r in splits:
        plo, phi = layout[r.parent]
        assert (r.lo, r.hi) in (
            (plo, (plo + phi) // 2),
            ((plo + phi) // 2, phi),
        ), r
    assert len(splits) % 2 == 0
    for r in rows:
        if r.action == "merged":
            assert layout[r.parent][0] == r.lo
            assert layout[r.parent][1] == layout[r.adjacent_parent][0]
            assert layout[r.adjacent_parent][1] == r.hi
    new_ids = sorted(
        int(r.shard_id[8:]) for r in rows if r.action in ("split-child", "merged")
    )
    assert new_ids == list(
        range(len(_ASP_WIDTHS), len(_ASP_WIDTHS) + len(new_ids))
    )


def test_retention_and_fanout_windows_stay_shard_bounded(spark, sf_small):
    """The retention-risk aggregation has no window at all; the fan-out
    divergence window may only partition by shard_id (bounded by the EFO
    20-consumer registration limit)."""
    plan = plan_of(spark, sf_small, "consumer_fanout_lag")
    for spec in re.findall(r"windowspecdefinition\(([^,]+),", plan):
        assert "shard_id" in spec, plan
    assert "CartesianProduct" not in plan, plan
    plan = plan_of(spark, sf_small, "retention_expiry_risk")
    assert "windowspecdefinition" not in plan, plan


def test_cost_units_aggregates_broadcast_joined(spark, sf_small):
    """Both metering legs (per-record, per-blob) must partial-aggregate and
    meet in a broadcast join on the bounded stream dimension — payload
    bytes never ride through a sort-merge join."""
    plan = plan_of(spark, sf_small, "kinesis_cost_units")
    assert "SortMergeJoin" not in plan, plan
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastHashJoin" in plan, plan


def test_span_corruption_single_wide_stage(spark, sf_small):
    """Window explode and md5 span arithmetic are narrow; the only
    exchange in the plan is the final per-doc aggregation's."""
    plan = plan_of(spark, sf_small, "span_corruption_plan")
    # tree nodes only (details repeat names): scan spread + the one agg shuffle
    assert len(re.findall(r"^\(\d+\) Exchange", plan, re.M)) <= 2, plan
    assert "windowspecdefinition" not in plan, plan
    assert "Join" not in plan, plan


def test_e2e_pipeline_no_sortmerge_no_cartesian(spark, sf_small):
    """The composition may only join shard-bounded audit legs (broadcast)
    and the per-shard minute grid (broadcast anti-join) — nothing in the
    end-to-end path is allowed to sort-merge or go cartesian."""
    plan = plan_of(spark, sf_small, "kinesis_e2e_pipeline")
    assert "SortMergeJoin" not in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_stream_correlation_series_join_on_minute_only(spark, sf_small):
    """The pair join keys on the uniform minute grid with bounded stream
    fan-out — never on raw events — and the grid bounds broadcast."""
    plan = plan_of(spark, sf_small, "stream_correlation_matrix")
    assert "CartesianProduct" not in plan, plan
    assert "rangepartitioning" not in plan, plan


def test_kcl_checkpoint_filters_packed_blobs_before_explode(spark, sf_small):
    """The checkpoint refetch filter must land on the PACKED relation (one
    row per blob) with the lease table broadcast — de-aggregation fan-out
    happens only on refetched blobs."""
    plan = plan_of(spark, sf_small, "kcl_subsequence_checkpoint")
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan


def test_quality_matched_resample_bounded_dims_broadcast(spark, sf_small):
    """The (source, bucket) decision table is bounded and must broadcast
    onto the per-doc projection; no sort-merge join, no window."""
    plan = plan_of(spark, sf_small, "quality_matched_resample")
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan
    assert "windowspecdefinition" not in plan, plan


def test_kneser_ney_joins_type_tables_not_stream(spark, sf_small):
    """All LM statistics join on the Heaps-bounded TYPE relation; the token
    stream contributes exactly one counting aggregation (its exchange) and
    the T-types 1-row aggregate broadcasts."""
    plan = plan_of(spark, sf_small, "kneser_ney_bigram")
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" in plan, plan  # 1-row T broadcast


def test_media_interleave_pack_window_partitions_by_source(spark, sf_small):
    """The pack cumsum must partition by source — an empty partition spec
    would serialize the corpus through one task."""
    plan = plan_of(spark, sf_small, "media_interleave_pack")
    assert "windowspecdefinition(source" in plan, plan
    assert "Join" not in plan, plan


def test_padded_batch_waste_windows_partition_by_source(spark, sf_small):
    """Both batch-formation row_number windows partition by source; no
    global range sort anywhere."""
    plan = plan_of(spark, sf_small, "padded_batch_waste")
    assert "windowspecdefinition(source" in plan, plan
    assert "rangepartitioning" not in plan, plan


def test_auc_window_runs_on_tie_groups_not_rows(spark, sf_small):
    """The cumulative-rank window must consume the (source, score) tie-group
    aggregate — windowing raw documents would shuffle the corpus twice."""
    plan = plan_of(spark, sf_small, "auc_rank_exact")
    assert "windowspecdefinition(source" in plan, plan
    # the window input is the aggregated tie-group relation: an exchange on
    # (source, score) must appear below an exchange on (source)
    assert re.search(r"hashpartitioning\(source[^)]*score", plan), plan


def test_novelty_attribution_needs_no_join_back(spark, sf_small):
    """Novel counts come straight from the shingle-keyed min aggregation
    (first_doc rows) — the only joins are the per-doc left join and the
    broadcast 1-row max; nothing sort-merges the shingle stream twice."""
    plan = plan_of(spark, sf_small, "ngram_novelty_decay")
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" in plan, plan  # 1-row max broadcast


def test_prefix_cache_unions_before_single_rollup_exchange(spark, sf_small):
    """Depth legs union below the (source, depth, prefix) aggregation; the
    rollup to (source, depth) is map-side partial — no extra wide stage,
    no join."""
    plan = plan_of(spark, sf_small, "prefix_cache_hit_estimate")
    assert "Join" not in plan, plan
    assert "Union" in plan, plan


def test_survivorship_audit_no_cartesian_pinned_scored(spark, sf_small):
    """Same cost class as dedup_keep_list: source-blocked pair join +
    cluster-keyed min-struct pick — never a cartesian, and the audit fold
    adds no extra wide stage beyond the cluster join."""
    plan = plan_of(spark, sf_small, "dedup_survivorship_audit")
    assert "CartesianProduct" not in plan, plan


def test_disorder_profile_windows_partition_by_stream(spark, sf_small):
    """All 16 leads + the running max ride windows partitioned by the
    bounded stream dimension over ONE narrow projection; the offset melt is
    a Generate, not a 16-way self-union of the scan."""
    plan = plan_of(spark, sf_small, "event_disorder_profile")
    assert "windowspecdefinition(event_type" in plan, plan
    assert "rangepartitioning" not in plan, plan
    assert "Union" not in plan, plan


def test_watermark_tradeoff_single_pass_no_join(spark, sf_small):
    """One lateness window (partitioned by stream), one explode of the
    bounded delay candidates, one keyed aggregation — no join anywhere."""
    plan = plan_of(spark, sf_small, "watermark_policy_tradeoff")
    assert "windowspecdefinition(event_type" in plan, plan
    assert "Join" not in plan, plan
    assert "rangepartitioning" not in plan, plan


def test_tokenizer_fertility_floor_broadcasts(spark, sf_small):
    """The 1-row fairness floor broadcasts onto the pinned per-lang
    aggregate (the seg-broadcast leg lives behind the localCheckpoint and
    is pinned via bpe_tokenize_apply's identical shape); no cartesian, no
    global sort."""
    plan = plan_of(spark, sf_small, "tokenizer_fertility")
    assert "BroadcastNestedLoopJoin" in plan, plan
    assert "CartesianProduct" not in plan, plan
    assert "rangepartitioning" not in plan, plan


def test_heaps_fit_checkpoint_grid_broadcasts(spark, sf_small):
    """Both checkpoint probes consume the bounded (source x 8) grid as a
    broadcast; first ranks come from a keyed min aggregation, never a
    per-word window."""
    plan = plan_of(spark, sf_small, "heaps_law_fit")
    assert "CartesianProduct" not in plan, plan
    assert "rangepartitioning" not in plan, plan


def test_survival_family_runs_on_bounded_event_tables(spark, sf_small):
    """KM and log-rank risk windows consume the pooled (cohort, offset)
    aggregate — a single-partition window over a bounded relation, never a
    range-partitioned global sort of user rows."""
    for name in ("kaplan_meier_survival", "log_rank_test"):
        plan = plan_of(spark, sf_small, name)
        assert "rangepartitioning" not in plan, (name, plan)
        assert "CartesianProduct" not in plan, (name, plan)


def test_context_truncation_loss_no_join(spark, sf_small):
    """One narrow token-count projection, a bounded 4-way explode, one
    keyed aggregation — text never joins and nothing range-partitions."""
    plan = plan_of(spark, sf_small, "context_truncation_loss")
    assert "Join" not in plan, plan
    assert "rangepartitioning" not in plan, plan
    assert "explode([512,1024,2048,4096])" in plan, plan


def test_gini_concentration_window_partitions_by_stream(spark, sf_small):
    """The rank window runs per-stream (bounded dimension) over the
    (stream, user) COUNT relation, never raw events; no global sort, no
    join."""
    plan = plan_of(spark, sf_small, "gini_concentration")
    assert "windowspecdefinition(event_type" in plan, plan
    assert "rangepartitioning" not in plan, plan
    assert "Join" not in plan, plan


def test_kcl_lease_rebalance_event_side_never_shuffles(spark, sf_small):
    """The event stream feeds one shard-keyed count; every later join rides
    a broadcast of the worker/offset relations. A SortMergeJoin or true
    cartesian over events would not survive 100x."""
    plan = plan_of(spark, sf_small, "kcl_lease_rebalance")
    assert "SortMergeJoin" not in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_kcl_lease_rebalance_invariants(spark, sf_small):
    """Every observed shard's lease is assigned exactly once to a live
    worker, every surviving owner keeps what stickiness allows, and final
    per-worker loads sit in [floor(S/3), ceil(S/3)] with new_owner_leases
    reporting the true final count."""
    import collections

    from amazon_kinesis_data_streams_health_check_spark.plans.registry import get

    rows = get("kcl_lease_rebalance").builder(spark, sf_small).collect()
    assert len({r.shard_id for r in rows}) == len(rows)
    assert all(r.new_owner in {"w0", "w1", "w2"} for r in rows)
    nc = collections.Counter(r.new_owner for r in rows)
    s = len(rows)
    assert all(s // 3 <= c <= s // 3 + (1 if s % 3 else 0) for c in nc.values()), nc
    for r in rows:
        assert r.new_owner_leases == nc[r.new_owner], r
        assert r.moved == (r.new_owner != r.old_owner), r
        assert r.was_orphan == (r.old_owner == "w3"), r
        if r.was_orphan:
            assert r.moved, r


@pytest.mark.slow
def test_kcl_lease_rebalance_failover_paths_at_oracle_sf(spark, sf_oracle):
    """At the driver's correctness scale all 16 shards appear, the dead
    worker's leases orphan, and both the shed and steal paths fire."""
    from amazon_kinesis_data_streams_health_check_spark.plans.registry import get

    rows = get("kcl_lease_rebalance").builder(spark, sf_oracle).collect()
    assert len(rows) == 16
    assert sum(r.was_orphan for r in rows) > 0
    assert sum(r.moved for r in rows) >= sum(r.was_orphan for r in rows)


def test_mixture_temperature_reweight_single_corpus_pass(spark, sf_small):
    """The corpus is touched once (token-count agg with map-side partials);
    the weight arithmetic runs on the source-bounded relation with the
    1-row total broadcast — no join over documents, no global sort."""
    plan = plan_of(spark, sf_small, "mixture_temperature_reweight")
    assert "BroadcastNestedLoopJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan
    assert "rangepartitioning" not in plan, plan
    assert len(re.findall(r"Scan parquet|parquet\.", plan)) <= 2, plan


def test_mixture_temperature_weights_are_exact_isqrt(spark, sf_small):
    """The corrected floor-sqrt must satisfy w^2 <= n < (w+1)^2 exactly, and
    the ppm columns must be the exact integer divisions of those weights."""
    from amazon_kinesis_data_streams_health_check_spark.plans.registry import get

    rows = get("mixture_temperature_reweight").builder(spark, sf_small).collect()
    wt = sum(r.weight for r in rows)
    total = sum(r.n_tokens for r in rows)
    for r in rows:
        assert r.weight * r.weight <= r.n_tokens < (r.weight + 1) ** 2, r
        assert r.sample_ppm == 10**6 * r.weight // wt, r
        assert r.natural_ppm == 10**6 * r.n_tokens // total, r
        assert r.draw_tokens == r.weight * total // wt, r
        assert r.upsampled == (r.epochs_milli > 1000), r


def test_lake_dpp_join_prunes_partitions_at_runtime(spark, sf_small):
    """The partitioned fact scan must carry a dynamicpruningexpression
    partition filter fed by the broadcast dim (the builder raises without
    it); the join must broadcast, never sort-merge, and the fact must
    actually read fewer partitions than it wrote."""
    plan = plan_of(spark, sf_small, "lake_dpp_join")
    assert "dynamicpruningexpression" in plan, plan
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan


def test_lake_dpp_join_reads_fewer_months_than_exist(spark, sf_small):
    """12 dim months out of the full ship-month range: the result covers
    exactly the urgent-1995 months and no cold month leaks through."""
    from amazon_kinesis_data_streams_health_check_spark.plans.registry import get

    rows = get("lake_dpp_join").builder(spark, sf_small).collect()
    assert 0 < len(rows) <= 12
    assert all(r.ym.startswith("1995") for r in rows)
    assert all(r.n_lines > 0 for r in rows)


def test_maxsim_has_no_per_query_window_and_no_explode_of_subvectors(spark, sf_small):
    """MaxSim must score inside higher-order functions (the sub-vector axis
    never becomes rows) and rank via the two-phase merge — a row_number
    window on query_id routes the whole scored corpus for one query onto
    one task."""
    plan = plan_of(spark, sf_small, "maxsim_late_interaction")
    assert "windowspecdefinition(query_id" not in plan, plan
    assert "row_number" not in plan, plan
    assert "CartesianProduct" not in plan, plan
    # exactly one Generate: the final top-k posexplode of K rows per query
    assert len(re.findall(r"^\(\d+\) Generate", plan, re.M)) <= 1, plan


def test_maxsim_dominates_its_own_subscores(spark, sf_small):
    """Sanity on the lattice: the reported maxsim of the top hit must be at
    least the single-vector dot product of the full embeddings (MaxSim's
    per-facet max can only match or beat the aligned-position sum)."""
    from amazon_kinesis_data_streams_health_check_spark.plans.registry import get

    rows = get("maxsim_late_interaction").builder(spark, sf_small).collect()
    assert {r.query_id for r in rows} == {0, 1, 2, 3}
    for qid in range(4):
        ranks = sorted(r.rank for r in rows if r.query_id == qid)
        assert ranks == [1, 2, 3, 4, 5], ranks
        scores = [r.maxsim for r in sorted(
            (r for r in rows if r.query_id == qid), key=lambda r: r.rank)]
        assert scores == sorted(scores, reverse=True), scores


def test_session_gap_sweep_one_lag_pass_no_join(spark, sf_small):
    """One per-user lag window (hash-partitioned by the uniform user key),
    a bounded threshold explode, keyed aggregations — no join anywhere and
    no global sort."""
    plan = plan_of(spark, sf_small, "session_gap_sweep")
    assert "Join" not in plan, plan
    assert "rangepartitioning" not in plan, plan
    assert re.search(r"hashpartitioning\(user_id", plan), plan
    assert len(re.findall(r"^\(\d+\) Window", plan, re.M)) == 1, plan


def test_session_gap_sweep_monotone_in_threshold(spark, sf_small):
    """A larger gap can only merge sessions: n_sessions must be
    non-increasing and intra time non-decreasing in T; the 30-min row must
    agree with user_sessions' total session count."""
    from amazon_kinesis_data_streams_health_check_spark.plans.registry import get

    rows = sorted(
        get("session_gap_sweep").builder(spark, sf_small).collect(),
        key=lambda r: r.gap_s,
    )
    assert [r.gap_s for r in rows] == [300, 900, 1800, 3600]
    for a, b in zip(rows, rows[1:]):
        assert a.n_sessions >= b.n_sessions, (a, b)
        assert a.intra_total_s <= b.intra_total_s, (a, b)
        assert a.n_users == b.n_users and a.n_events == b.n_events, (a, b)
    n_sessions_30 = rows[2].n_sessions
    us = get("user_sessions").builder(spark, sf_small).count()
    assert n_sessions_30 == us, (n_sessions_30, us)


def test_ewma_control_chart_one_window_per_stream(spark, sf_small):
    """All 12 lags evaluate inside ONE ordered window partitioned by the
    bounded stream key — 12 separate window nodes (or a join) would scan
    the series 12 times."""
    plan = plan_of(spark, sf_small, "ewma_control_chart")
    assert len(re.findall(r"^\(\d+\) Window", plan, re.M)) == 1, plan
    assert "Join" not in plan, plan
    assert "rangepartitioning" not in plan, plan


def test_ewma_control_chart_matches_python_recurrence(spark, sf_small):
    """The window-lag EWMA numerator must equal the truncated geometric
    recurrence computed independently in Python, and flags must only fire
    outside warmup."""
    from collections import defaultdict

    from amazon_kinesis_data_streams_health_check_spark.plans.registry import get

    rows = get("ewma_control_chart").builder(spark, sf_small).collect()
    series = defaultdict(list)
    for r in sorted(rows, key=lambda r: (r.stream_name, r.window_start)):
        series[r.stream_name].append(r)
    H = 12
    for s, rs in series.items():
        xs = [r.n_arrivals for r in rs]
        for t, r in enumerate(rs):
            past = xs[max(0, t - H):t]
            expected = sum(x * (1 << (H - k)) for k, x in
                           zip(range(len(past), 0, -1), past))
            assert r.ewma_num == expected, (s, t, r)
            if r.warmup:
                assert not r.spike_high and not r.spike_low, r


def test_dedup_pr_curve_no_brute_force_in_spark_plan(spark, sf_small):
    """The O(n^2) pair join lives only in the oracle: the Spark plan must
    contain no cartesian product; pair generation rides the prefix-filter
    and banded self-joins."""
    plan = plan_of(spark, sf_small, "dedup_threshold_pr_curve")
    assert "CartesianProduct" not in plan, plan


def test_dedup_pr_curve_consistent_with_lsh_recall_point(spark, sf_small):
    """Set containments: n_true non-increasing in tau, detected <= true and
    <= candidates; the tau=1/2 row must reproduce dedup_lsh_recall's
    operating point exactly."""
    from amazon_kinesis_data_streams_health_check_spark.plans.registry import get

    rows = sorted(
        get("dedup_threshold_pr_curve").builder(spark, sf_small).collect(),
        key=lambda r: r.tau_num / r.tau_den,
    )
    assert [(r.tau_num, r.tau_den) for r in rows] == [(1, 3), (1, 2), (2, 3), (4, 5)]
    for a, b in zip(rows, rows[1:]):
        assert a.n_true >= b.n_true, (a, b)
        assert a.n_candidates == b.n_candidates, (a, b)
    for r in rows:
        assert r.n_detected <= r.n_true, r
        assert r.n_detected <= r.n_candidates, r
    point = get("dedup_lsh_recall").builder(spark, sf_small).collect()[0]
    half = rows[1]
    assert half.n_true == point.n_true_pairs, (half, point)
    assert half.n_detected == point.n_detected, (half, point)
    assert half.n_candidates == point.n_candidates, (half, point)


def test_filter_agreement_kappa_single_pass_no_join(spark, sf_small):
    """All three flags come from one narrow scan (codegen'd expressions);
    the pair melt is a bounded explode; no join, no global sort."""
    plan = plan_of(spark, sf_small, "filter_agreement_kappa")
    assert "Join" not in plan, plan
    assert "rangepartitioning" not in plan, plan
    assert len(re.findall(r"Scan parquet|parquet\.", plan)) <= 2, plan


def test_filter_agreement_kappa_matches_sklearn_free_formula(spark, sf_small):
    """The ppm kappa must equal the independent Python computation from the
    emitted contingency (incl. truncation-toward-zero on negatives), and
    each pair's cells must sum to n."""
    from amazon_kinesis_data_streams_health_check_spark.plans.registry import get

    rows = get("filter_agreement_kappa").builder(spark, sf_small).collect()
    assert {r.pair for r in rows} == {
        "quality~langmis", "quality~short", "langmis~short"
    }
    for r in rows:
        assert r.n11 + r.n10 + r.n01 + r.n00 == r.n, r
        r1, c1 = r.n11 + r.n10, r.n11 + r.n01
        pe_num = r1 * c1 + (r.n - r1) * (r.n - c1)
        num = r.n * (r.n11 + r.n00) - pe_num
        den = r.n * r.n - pe_num
        if den == 0:
            assert r.kappa_ppm is None, r
        else:
            sign = -1 if num < 0 else 1
            assert r.kappa_ppm == sign * (10**6 * abs(num) // den), r


def test_zipf_fit_rank_window_on_vocab_not_stream(spark, sf_small):
    """The rank window must partition by source over the VOCAB relation
    (post-aggregation), never range-partition the token stream; one scan."""
    plan = plan_of(spark, sf_small, "zipf_law_fit")
    assert "rangepartitioning" not in plan, plan
    assert "Join" not in plan, plan
    assert len(re.findall(r"Scan parquet|parquet\.", plan)) <= 2, plan


def test_zipf_fit_matches_python_ols(spark, sf_small):
    """The sign-split micro slope must equal the independent Python OLS
    over the power-of-two checkpoint points, recomputed from raw counts."""
    import collections
    import math

    from amazon_kinesis_data_streams_health_check_spark.operators.textstats import (
        TOKEN_RE,
    )
    from amazon_kinesis_data_streams_health_check_spark.plans.registry import get
    import re as _re

    import duckdb

    rows = {r.source: r for r in get("zipf_law_fit").builder(spark, sf_small).collect()}
    docs = duckdb.sql(
        f"SELECT source, lower(text) AS t FROM read_parquet('{sf_small}/documents.parquet')"
    ).fetchall()
    counts: dict = collections.defaultdict(collections.Counter)
    for src, t in docs:
        counts[src].update(_re.findall(TOKEN_RE, t))
    for src, ctr in counts.items():
        ranked = sorted(ctr.items(), key=lambda kv: (-kv[1], kv[0]))
        pts = [
            (int(math.log2(r)), (f).bit_length() - 1)
            for r, (_, f) in enumerate(ranked, start=1)
            if r & (r - 1) == 0
        ]
        n = len(pts)
        sx = sum(x for x, _ in pts); sy = sum(y for _, y in pts)
        sxx = sum(x * x for x, _ in pts); sxy = sum(x * y for x, y in pts)
        den = n * sxx - sx * sx
        r_ = rows[src]
        assert r_.n_points == n, (src, r_)
        if den == 0:
            assert r_.zipf_slope_micro is None, r_
        else:
            num = n * sxy - sx * sy
            sign = -1 if num < 0 else 1
            assert r_.zipf_slope_micro == sign * (10**6 * abs(num) // den), (src, r_)


def test_link_prediction_no_cartesian_bounded_wedge(spark, sf_small):
    """The wedge join shuffles on vertex ids (never a cartesian); the
    anti-join removes existing edges; no global sort anywhere."""
    plan = plan_of(spark, sf_small, "link_prediction_knn")
    assert "CartesianProduct" not in plan, plan
    assert "rangepartitioning" not in plan, plan


def test_link_prediction_pairs_are_nonadjacent_with_common_neighbors(spark, sf_small):
    """Every predicted pair must be absent from the edge set, have >= 2
    common neighbors, and its Jaccard must match the inclusion-exclusion
    arithmetic of the reported degrees."""
    from amazon_kinesis_data_streams_health_check_spark.plans.corpus_queries import (
        knn_graph_lsh,
    )
    from amazon_kinesis_data_streams_health_check_spark.plans.registry import get

    rows = get("link_prediction_knn").builder(spark, sf_small).collect()
    edges = {
        (min(r.query_id, r.neighbor_id), max(r.query_id, r.neighbor_id))
        for r in knn_graph_lsh(spark, sf_small).collect()
    }
    adj: dict = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    for r in rows:
        assert (r.doc_a, r.doc_b) not in edges, r
        common = adj.get(r.doc_a, set()) & adj.get(r.doc_b, set())
        assert r.n_common == len(common) >= 2, r
        assert r.deg_a == len(adj[r.doc_a]) and r.deg_b == len(adj[r.doc_b]), r
        assert r.jaccard_ppm == 10**6 * r.n_common // (r.deg_a + r.deg_b - r.n_common), r


def test_cuped_one_user_agg_no_sort(spark, sf_small):
    """One broadcast bound onto the scan, one user-keyed aggregation, one
    bounded variant fold — no sort-merge join, no global sort."""
    plan = plan_of(spark, sf_small, "cuped_variance_reduction")
    assert "SortMergeJoin" not in plan, plan
    assert "rangepartitioning" not in plan, plan
    assert re.search(r"hashpartitioning\(user_id", plan), plan


def test_cuped_matches_python_moments(spark, sf_small):
    """theta and corr^2 must equal the independent Python computation from
    raw events (incl. the sign-split truncation), and pre+post must
    conserve the event count."""
    import collections

    import duckdb

    from amazon_kinesis_data_streams_health_check_spark.plans.registry import get

    rows = {r.variant: r for r in
            get("cuped_variance_reduction").builder(spark, sf_small).collect()}
    ev = duckdb.sql(
        f"SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) FROM read_parquet('{sf_small}/events.parquet')"
    ).fetchall()
    lo = min(e for _, e in ev); hi = max(e for _, e in ev)
    mid = (lo + hi) // 2
    per = collections.defaultdict(lambda: [0, 0])
    for uid, e in ev:
        per[uid][0 if e <= mid else 1] += 1
    import hashlib
    groups = collections.defaultdict(list)
    for uid, (x, y) in per.items():
        h = int(hashlib.md5(str(uid).encode()).hexdigest()[:8], 16)
        groups["A" if h % 2 == 0 else "B"].append((x, y))
    total_events = len(ev)
    assert sum(r.pre_events + r.post_events for r in rows.values()) == total_events
    for var, pts in groups.items():
        n = len(pts)
        sx = sum(x for x, _ in pts); sy = sum(y for _, y in pts)
        sxx = sum(x * x for x, _ in pts); syy = sum(y * y for _, y in pts)
        sxy = sum(x * y for x, y in pts)
        cov_n = n * sxy - sx * sy
        varx_n = n * sxx - sx * sx
        vary_n = n * syy - sy * sy
        r = rows[var]
        assert r.n_users == n, (var, r)
        if varx_n == 0:
            assert r.theta_micro is None, r
        else:
            sign = -1 if cov_n < 0 else 1
            assert r.theta_micro == sign * (10**6 * abs(cov_n) // varx_n), (var, r)
        if varx_n * vary_n == 0:
            assert r.var_reduction_ppm is None, r
        else:
            assert r.var_reduction_ppm == 10**6 * cov_n * cov_n // (varx_n * vary_n), (var, r)


def test_lsh_s_curve_no_cartesian_and_sane_curve(spark, sf_small):
    """No brute force in the Spark plan; predictions are valid ppm and the
    analytic curve is non-decreasing in similarity decile."""
    plan = plan_of(spark, sf_small, "lsh_s_curve_validation")
    assert "CartesianProduct" not in plan, plan
    from amazon_kinesis_data_streams_health_check_spark.plans.registry import get

    rows = sorted(
        get("lsh_s_curve_validation").builder(spark, sf_small).collect(),
        key=lambda r: r.sim_decile,
    )
    assert rows, "no true pairs at tau=1/3"
    for a, b in zip(rows, rows[1:]):
        assert a.pred_collision_ppm <= b.pred_collision_ppm, (a, b)
    for r in rows:
        assert 0 <= r.pred_collision_ppm <= 10**6, r
        assert 0 <= r.measured_collision_ppm <= 10**6, r


def test_lsh_s_curve_prediction_matches_python_rational(spark, sf_small):
    """Spot-check the exact rational collision formula against Python
    bignum arithmetic recomputed from (i, u) pair sizes."""
    from amazon_kinesis_data_streams_health_check_spark.operators.dedup import (
        jaccard_allpairs_pairs,
    )
    from amazon_kinesis_data_streams_health_check_spark.plans.registry import get
    from amazon_kinesis_data_streams_health_check_spark.sources.tables import (
        parallel_scan,
    )
    import collections

    docs = parallel_scan(spark, sf_small, "documents")
    pairs = jaccard_allpairs_pairs(docs, 1, 3, keep_sizes=True).collect()
    buckets = collections.defaultdict(list)
    for p in pairs:
        i, u = p.n_inter, p.n_union
        ppm = 10**6 * (u**12 - (u**3 - i**3) ** 4) // u**12
        buckets[10 * i // u].append(ppm)
    rows = {r.sim_decile: r for r in
            get("lsh_s_curve_validation").builder(spark, sf_small).collect()}
    assert set(rows) == set(buckets)
    for d, ppms in buckets.items():
        assert rows[d].n_pairs == len(ppms), (d, rows[d])
        assert rows[d].pred_collision_ppm == sum(ppms) // len(ppms), (d, rows[d])


def test_lake_clustering_depth_contrast(spark, sf_small):
    """The audited numbers must show the layout story: clustered zone maps
    are disjoint (max depth 1), hashed files all span the domain (max
    depth = n_files, avg depth > half of it)."""
    from amazon_kinesis_data_streams_health_check_spark.plans.registry import get

    rows = {r.layout: r for r in
            get("lake_clustering_depth").builder(spark, sf_small).collect()}
    c, h = rows["clustered"], rows["hashed"]
    assert c.n_files == h.n_files == 8
    assert c.max_depth == 1, c
    assert h.max_depth == 8, h
    assert c.avg_depth_milli <= 1000, c
    assert h.avg_depth_milli > 4000, h


def test_dataset_card_single_scan_no_expand(spark, sf_small):
    """The lone per-source countDistinct must not Expand-multiply the scan;
    the language profile attaches as a broadcast; no global sort."""
    plan = plan_of(spark, sf_small, "dataset_card_summary")
    assert not re.findall(r"^\(\d+\) Expand", plan, re.M), plan
    assert "SortMergeJoin" not in plan, plan
    assert "rangepartitioning" not in plan, plan


def test_dataset_card_internally_consistent(spark, sf_small):
    """Card rows must reconcile with the simpler registry queries: doc and
    token totals vs token_counts_by_source, dup ppm against dedup_exact
    arithmetic, quartiles ordered."""
    from amazon_kinesis_data_streams_health_check_spark.plans.registry import get

    card = {r.source: r for r in
            get("dataset_card_summary").builder(spark, sf_small).collect()}
    for r in card.values():
        assert r.q25 <= r.q50 <= r.q75, r
        assert 0 <= r.exact_dup_ppm <= 10**6, r
        assert 0 <= r.short_doc_ppm <= 10**6, r
        assert r.n_langs >= 1 and r.dominant_lang, r
    tok = {r.source: r for r in
           get("token_counts_by_source").builder(spark, sf_small).collect()}
    if tok and "n_docs" in next(iter(tok.values())).asDict():
        for src, t in tok.items():
            assert card[src].n_docs == t.n_docs, (src, t)


def test_ranker_tau_single_scored_pass_no_per_query_window(spark, sf_small):
    """Both rankers slice the SAME scored pass via the two-phase merge — a
    row_number window on query_id would route a query's whole candidate
    set to one task; the corpus is scanned once."""
    plan = plan_of(spark, sf_small, "ranker_agreement_tau")
    assert "windowspecdefinition(query_id" not in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_ranker_tau_matches_python_pairs(spark, sf_small):
    """tau-a must equal the independent Python pair count over the emitted
    shared lists, and every query row must satisfy the C(n,2) identity."""
    from amazon_kinesis_data_streams_health_check_spark.plans.registry import get

    rows = get("ranker_agreement_tau").builder(spark, sf_small).collect()
    assert rows
    for r in rows:
        assert r.n_pairs == r.n_shared * (r.n_shared - 1) // 2, r
        if r.n_pairs == 0:
            assert r.tau_ppm is None, r
        else:
            num = 2 * r.n_concordant - r.n_pairs
            sign = -1 if num < 0 else 1
            assert r.tau_ppm == sign * (10**6 * abs(num) // r.n_pairs), r
            assert -(10**6) <= r.tau_ppm <= 10**6, r


@pytest.mark.slow
def test_kcl_lease_scale_out_pure_steal_at_oracle_sf(spark, sf_oracle):
    """Scale-out: zero orphans, every move lands on the NEW worker, final
    loads in [floor(S/5), ceil(S/5)], and stickiness holds — nobody below
    target loses a lease."""
    import collections

    from amazon_kinesis_data_streams_health_check_spark.plans.registry import get

    rows = get("kcl_lease_scale_out").builder(spark, sf_oracle).collect()
    assert sum(r.was_orphan for r in rows) == 0
    moved = [r for r in rows if r.moved]
    assert moved and all(r.new_owner == "w4" for r in moved), moved
    nc = collections.Counter(r.new_owner for r in rows)
    s = len(rows)
    assert all(s // 5 <= c <= s // 5 + (1 if s % 5 else 0) for c in nc.values()), nc


def test_checkpoint_tradeoff_no_join_bounded_explode(spark, sf_small):
    """One narrow projection, bounded explode, keyed aggregations — no
    join, no window, no global sort; and replay exposure must be monotone:
    a longer interval can only increase the worst bucket."""
    plan = plan_of(spark, sf_small, "checkpoint_interval_tradeoff")
    assert "Join" not in plan, plan
    assert "rangepartitioning" not in plan, plan
    from amazon_kinesis_data_streams_health_check_spark.plans.registry import get
    import collections

    by_stream = collections.defaultdict(list)
    for r in get("checkpoint_interval_tradeoff").builder(spark, sf_small).collect():
        by_stream[r.stream_name].append(r)
    for rs in by_stream.values():
        rs.sort(key=lambda r: r.interval_s)
        assert [r.interval_s for r in rs] == [60, 300, 900, 3600]
        for a, b in zip(rs, rs[1:]):
            assert a.worst_replay <= b.worst_replay, (a, b)
            assert a.n_checkpoints >= b.n_checkpoints, (a, b)
            assert a.n_events == b.n_events, (a, b)


def test_aqe_skew_audit_output_is_x32_of_base_counts(spark, sf_small):
    """The audit's aggregate must equal the replication identity: n is 32x
    the per-stream event count (every fact row joins exactly one dim row).
    The skew=true assertion itself lives inside the builder (it raises)."""
    from amazon_kinesis_data_streams_health_check_spark.plans.registry import get
    from amazon_kinesis_data_streams_health_check_spark.sources.tables import (
        load_table,
    )
    import pyspark.sql.functions as SF

    rows = {r.event_type: r for r in
            get("aqe_skew_join_audit").builder(spark, sf_small).collect()}
    base = {
        r.event_type: r.cnt
        for r in load_table(spark, sf_small, "events")
        .groupBy("event_type")
        .agg(SF.count(SF.lit(1)).alias("cnt"))
        .collect()
    }
    assert set(rows) == set(base)
    for et, r in rows.items():
        assert r.n == 32 * base[et], (et, r, base[et])


def test_runtime_bloom_audit_matches_plain_join(spark, sf_small):
    """The Bloom semi-filter must not change results: the audit equals the
    unfiltered join arithmetic (the might_contain assertion raises inside
    the builder)."""
    from amazon_kinesis_data_streams_health_check_spark.plans.registry import get
    from amazon_kinesis_data_streams_health_check_spark.sources.tables import (
        load_table,
    )
    import pyspark.sql.functions as SF

    r = get("runtime_bloom_join_audit").builder(spark, sf_small).collect()[0]
    li = load_table(spark, sf_small, "lineitem")
    o = load_table(spark, sf_small, "orders").filter(
        SF.col("o_orderpriority") == "1-URGENT"
    )
    expect = li.join(o, li.l_orderkey == o.o_orderkey).count()
    assert r.n_lines == expect, (r, expect)


def test_vocab_oov_stream_never_shuffles_on_word(spark, sf_small):
    """The held-out stream joins the BROADCAST vocab — a shuffle keyed on
    word would move the whole token stream; the vocab's top-N is the
    two-phase slice (no global rank window over the word table)."""
    plan = plan_of(spark, sf_small, "vocab_oov_drift")
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan
    assert "row_number" not in plan, plan


def test_control_chart_ensemble_consistent_with_standalone_charts(spark, sf_small):
    """The ensemble's vote must be internally consistent (n_alarms = sum of
    flags, consensus = n_alarms >= 2) and its EWMA leg must match the
    standalone ewma_control_chart on the same series."""
    from amazon_kinesis_data_streams_health_check_spark.plans.registry import get

    rows = get("control_chart_ensemble").builder(spark, sf_small).collect()
    for r in rows:
        total = int(r.shewhart) + int(r.cusum_up) + int(r.ewma)
        assert r.n_alarms == total, r
        assert r.consensus == (total >= 2), r
    ew = {
        (r.stream_name, int(r.window_start.timestamp())): r.spike_high
        for r in get("ewma_control_chart").builder(spark, sf_small).collect()
    }
    for r in rows:
        assert r.ewma == ew[(r.stream_name, r.window_start_s)], r


def test_shard_iterator_semantics_no_join_and_lattice_consistent(spark, sf_small):
    """One scan + stack melt + one keyed agg — no join anywhere; and the
    iterator lattice must hold: LATEST is a subset of TRIM_HORIZON,
    AT_SEQUENCE reads exactly one more record than AFTER_SEQUENCE, and the
    pre-retention AT_TIMESTAMP clamps to the trim horizon."""
    plan = plan_of(spark, sf_small, "shard_iterator_semantics")
    assert "Join" not in plan, plan
    rows = QUERIES["shard_iterator_semantics"].builder(spark, sf_small).collect()
    by = {(r.shard_id, r.iterator_type): r for r in rows}
    shards = {s for s, _ in by}
    for s in shards:
        assert by[(s, "LATEST")].n_readable < by[(s, "TRIM_HORIZON")].n_readable
        assert (
            by[(s, "AT_SEQUENCE_NUMBER")].n_readable
            == by[(s, "AFTER_SEQUENCE_NUMBER")].n_readable + 1
        )
        at_ts = by[(s, "AT_TIMESTAMP")]
        assert at_ts.starts_at_trim and at_ts.n_readable == by[(s, "TRIM_HORIZON")].n_readable


def test_producer_retry_dedup_accounting(spark, sf_small):
    """Every duplicate must trace to exactly one retried record, and the
    idempotent dedup must recover the original cardinality."""
    plan = plan_of(spark, sf_small, "producer_retry_dedup")
    assert "Join" not in plan, plan
    for r in QUERIES["producer_retry_dedup"].builder(spark, sf_small).collect():
        assert r.retry_accounting_ok, r
        assert r.n_duplicates == r.n_retried, r
        assert r.n_put_attempts == r.n_unique_records + r.n_duplicates, r


def test_conformal_threshold_monotone_in_alpha(spark, sf_small):
    """A stricter alpha (5%) can only raise the conformal threshold vs 10%,
    and the plan must keep every join broadcast (the raw stream is never
    shuffled onto the tiny rank/threshold tables)."""
    plan = plan_of(spark, sf_small, "conformal_lag_bound")
    assert "SortMergeJoin" not in plan, plan
    rows = QUERIES["conformal_lag_bound"].builder(spark, sf_small).collect()
    q = {(r.stream_name, r.alpha_ppm): r for r in rows}
    for (stream, alpha), r in q.items():
        if alpha == 50000:
            assert r.q_lag_threshold >= q[(stream, 100000)].q_lag_threshold, r
        assert r.k_rank <= r.n_cal, r
        assert 0 <= r.covered_ppm <= 1000000, r


def test_copeland_matches_python_model(spark, sf_small):
    """Recompute the duel tournament with an independent Python model from
    the raw parquet and compare Copeland scores exactly."""
    import collections
    import duckdb
    import math

    con = duckdb.connect()
    rows = con.execute(
        f"SELECT user_id, event_type, value FROM read_parquet('{sf_small}/events.parquet')"
    ).fetchall()
    totals = collections.defaultdict(int)
    for u, et, v in rows:
        totals[(u, et)] += math.floor(v * 1000)
    by_user = collections.defaultdict(dict)
    for (u, et), t in totals.items():
        by_user[u][et] = t
    wins = collections.Counter()
    duels = collections.Counter()
    for u, ets in by_user.items():
        keys = sorted(ets)
        for i, a in enumerate(keys):
            for b in keys[i + 1 :]:
                duels[(a, b)] += 1
                if ets[a] > ets[b]:
                    wins[(a, b)] += 1
                elif ets[b] > ets[a]:
                    wins[(b, a)] += 1
    types = sorted({et for _, et in totals})
    expect = {}
    for t in types:
        score = 0
        for o in types:
            if o == t:
                continue
            pair = (min(t, o), max(t, o))
            n = duels[pair]
            if n == 0:
                continue
            w_t, w_o = wins[(t, o)], wins[(o, t)]
            if 2 * w_t > n:
                score += 2
            elif 2 * w_o <= n:
                score += 1
        expect[t] = score
    got = {
        r.event_type: r.copeland_2x
        for r in QUERIES["preference_copeland_rank"].builder(spark, sf_small).collect()
    }
    assert got == expect, (got, expect)


def test_boilerplate_scrub_detects_planted_lines(spark, sf_small):
    """The planted header must be flagged in every source, at least one
    boilerplate occurrence per doc must be removed, and no source loses
    all its characters; the lines must come from ONE documents scan."""
    plan = plan_of(spark, sf_small, "boilerplate_line_scrub")
    # the hashed-lines table is checkpoint-pinned: both consumers (the
    # doc-frequency aggregate and the join-back) read it, so the final
    # plan re-scans no parquet at all.
    assert plan.count("Scan parquet") == 0, plan
    for r in QUERIES["boilerplate_line_scrub"].builder(spark, sf_small).collect():
        assert r.header_detected, r
        assert r.n_boiler_occurrences >= r.n_docs, r
        assert 0 < r.chars_removed < r.chars_total, r


def test_entity_resolution_tiers_partition_truth(spark, sf_small):
    """Tier truth counts must partition the full truth set, the match tier
    must be impostor-free (names are unique keys), and the m/u stats must
    come from one aggregation broadcast back (no SortMergeJoin)."""
    plan = plan_of(spark, sf_small, "entity_resolution_fs")
    assert "SortMergeJoin" not in plan, plan
    rows = QUERIES["entity_resolution_fs"].builder(spark, sf_small).collect()
    import duckdb

    n_cust = duckdb.connect().execute(
        f"SELECT count(*) FROM read_parquet('{sf_small}/customer.parquet')"
    ).fetchone()[0]
    assert sum(r.n_true_pairs for r in rows) == n_cust, rows
    for r in rows:
        if r.tier == "match":
            assert r.precision_ppm == 1000000, r


def test_ips_matches_python_model(spark, sf_small):
    """Independent Python recomputation of the collapsed IPS estimator."""
    import collections
    import duckdb
    import math

    rows = duckdb.connect().execute(
        f"SELECT user_id, event_type, value FROM read_parquet('{sf_small}/events.parquet')"
    ).fetchall()
    r_sa = collections.Counter()
    n_sa = collections.Counter()
    for u, et, v in rows:
        seg = u % 4
        r_sa[(seg, et)] += math.floor(v * 1000)
        n_sa[(seg, et)] += 1
    segs = {s for s, _ in n_sa}
    expect = {}
    for s in segs:
        acts = [a for (sg, a) in n_sa if sg == s]
        k = len(acts)
        expect[s] = sum((1000 * r_sa[(s, a)]) // (k * n_sa[(s, a)]) for a in acts)
    got = {
        r.segment: r.v_ips_micro
        for r in QUERIES["ips_offpolicy_eval"].builder(spark, sf_small).collect()
    }
    assert got == expect, (got, expect)


def test_anonymization_ladder_monotone(spark, sf_small):
    """Coarsening can only shrink the cell count and raise the minima; at
    most one level is chosen per stream and a chosen level passes."""
    rows = QUERIES["anonymization_ladder"].builder(spark, sf_small).collect()
    import collections

    by_stream = collections.defaultdict(list)
    for r in rows:
        by_stream[r.event_type].append(r)
    for rs in by_stream.values():
        rs.sort(key=lambda r: r.level)
        assert [r.level for r in rs] == [1, 2, 3]
        for a, b in zip(rs, rs[1:]):
            assert a.n_cells >= b.n_cells, (a, b)
            assert a.min_cell_rows <= b.min_cell_rows, (a, b)
        chosen = [r for r in rs if r.chosen]
        assert len(chosen) <= 1
        for c in chosen:
            assert c.passes
            assert all(not r.passes for r in rs if r.level < c.level)


def test_cdc_apply_agrees_with_direct_state(spark, sf_small):
    """The arg-max-by-version apply must equal the closed-form state for
    every key, and live + deleted must partition the key set."""
    for r in QUERIES["cdc_apply_changelog"].builder(spark, sf_small).collect():
        assert r.applied_equals_direct, r
        assert r.n_keys == r.n_live + r.n_deleted, r
        assert r.n_changelog_rows >= r.n_keys, r


def test_forecast_backtest_python_naive_model(spark, sf_small):
    """Recompute the naive forecaster's MAE independently in Python from
    the raw parquet (dense day grid, zeros filled) and match exactly;
    every stream must carry all three models over the same eval days."""
    import collections
    import datetime as dt
    import duckdb

    rows = QUERIES["forecast_backtest"].builder(spark, sf_small).collect()
    by_stream = collections.defaultdict(dict)
    for r in rows:
        by_stream[r.stream_name][r.model] = r
    raw = duckdb.connect().execute(
        f"SELECT event_type, CAST(date_trunc('day', ts) AS DATE), count(*) "
        f"FROM read_parquet('{sf_small}/events.parquet') GROUP BY 1, 2"
    ).fetchall()
    counts = {(s, d): c for s, d, c in raw}
    days = sorted({d for _, d, _ in raw})
    lo, hi = days[0], days[-1]
    grid = [lo + dt.timedelta(days=i) for i in range((hi - lo).days + 1)]
    for stream, models in by_stream.items():
        assert set(models) == {"naive", "ma3", "drift"}
        assert len({m.n_eval_days for m in models.values()}) == 1
        assert any(m.best_mae for m in models.values())
        series = [counts.get((stream, d), 0) for d in grid]
        errs = [
            abs(1000 * series[i] - 1000 * series[i - 1])
            for i in range(3, len(series))
        ]
        assert models["naive"].mae_milli == sum(errs) // len(errs), stream


def test_sprt_decision_consistent_with_walk(spark, sf_small):
    """The decision must match the sign of the LLR at first crossing, and
    an independent Python replay of the millibit walk must agree on the
    decision point."""
    import collections
    import duckdb

    rows = {r.stream_name: r for r in
            QUERIES["sprt_sequential_test"].builder(spark, sf_small).collect()}
    raw = duckdb.connect().execute(
        f"SELECT event_type, date_trunc('minute', ts) AS m, count(*),"
        f" sum(CASE WHEN value > 50 THEN 1 ELSE 0 END)"
        f" FROM read_parquet('{sf_small}/events.parquet') GROUP BY 1, 2 ORDER BY 2"
    ).fetchall()
    walks = collections.defaultdict(list)
    for s, m, n, su in raw:
        walks[s].append((m, int(n), int(su)))
    for stream, r in rows.items():
        llr, trials, hit = 0, 0, None
        for m, n, su in walks[stream]:
            llr += 290 * (2 * su - n)
            trials += n
            if abs(llr) >= 4248:
                hit = (m, llr, trials)
                break
        if hit is None:
            assert r.decision == "continue", r
        else:
            want = "accept_h1" if hit[1] >= 4248 else "accept_h0"
            assert r.decision == want, (r, hit)
            assert r.trials_at_decision == hit[2], (r, hit)
            assert r.llr_at_decision_mbits == hit[1], (r, hit)


def test_shadow_diff_bounds_and_single_scan(spark, sf_small):
    """Both variants must read ONE pinned decode (no parquet re-scan), and
    the diff arithmetic must respect its own bounds: shared periods within
    both presence counts, alarm flips only where values differ, and the
    max delta bounded by skew + window width."""
    plan = plan_of(spark, sf_small, "shadow_pipeline_diff")
    assert plan.count("Scan parquet") == 0, plan
    for r in QUERIES["shadow_pipeline_diff"].builder(spark, sf_small).collect():
        assert r.n_shared <= min(r.n_periods_new, r.n_periods_old), r
        assert r.n_value_diffs <= r.n_shared, r
        assert r.n_alarm_flips <= r.n_value_diffs, r
        assert r.max_abs_delta_s is None or r.max_abs_delta_s <= 45 + 59, r


def test_psi_flags_planted_dims_and_matches_python(spark, sf_small):
    """The +0.25-shifted dims must classify as drifted and the untouched
    dims stable; an independent Python replay of the binning, Laplace
    shares, and LUT log2 must reproduce every PSI value exactly."""
    import collections
    import duckdb
    import math

    rows = {r.dim: r for r in
            QUERIES["embedding_drift_psi"].builder(spark, sf_small).collect()}
    for d, r in rows.items():
        assert r.planted == (d < 2), r
        if r.planted:
            assert r.drift_class in ("moderate", "major"), r
        else:
            assert r.drift_class == "stable", r

    raw = duckdb.connect().execute(
        f"SELECT vec_id, embedding FROM read_parquet('{sf_small}/embeddings.parquet')"
    ).fetchall()
    lut = (0, 87, 170, 248, 322, 392, 459, 524, 585, 644, 700, 755, 807, 858, 907, 954)

    def log2m(x):
        bits = x.bit_length() - 1
        mant = ((x * 16) >> bits) - 16
        return 1000 * bits + (lut[mant] if 0 <= mant < 16 else 0)

    import hashlib

    def is_late(vid):
        return int(hashlib.md5(str(vid).encode()).hexdigest()[:8], 16) % 2 == 1

    for d in range(4):
        bins = collections.defaultdict(lambda: [0, 0])
        for vid, emb in raw:
            milli = math.floor(float(emb[d]) * 1000)
            if is_late(vid) and d < 2:
                milli += 250
            b = min(7, max(0, (milli + 4000) * 8 // 8000))
            bins[b][1 if is_late(vid) else 0] += 1
        na = sum(v[0] for v in bins.values())
        nb = sum(v[1] for v in bins.values())
        psi = 0
        for a, b_ in bins.values():
            pa = (a + 1) * 1000000 // (na + 8)
            pb = (b_ + 1) * 1000000 // (nb + 8)
            lr = log2m(max(1, pa * 1000000 // pb)) - log2m(1000000)
            # Spark/DuckDB integer `div` truncates toward zero; Python //
            # floors — match the engines' semantics for negative products.
            prod = (pa - pb) * lr
            psi += abs(prod) // 1000000 * (1 if prod >= 0 else -1)
        assert rows[d].psi_millibits == psi, (d, rows[d].psi_millibits, psi)


def test_streaming_forecast_equals_batch(spark, sf_small):
    """The online drive must reproduce the batch backtest table exactly —
    cross-batch state continuity is load-bearing (the 4-chunk feed slices
    every stream's history across triggers)."""
    got = {
        (r.stream_name, r.model): (r.n_eval_days, r.mae_milli, r.pinball90_milli, r.best_mae)
        for r in QUERIES["streaming_forecast_residuals"].builder(spark, sf_small).collect()
    }
    want = {
        (r.stream_name, r.model): (r.n_eval_days, r.mae_milli, r.pinball90_milli, r.best_mae)
        for r in QUERIES["forecast_backtest"].builder(spark, sf_small).collect()
    }
    assert got == want


def test_exact_substring_window_partitions_by_anchor(spark, sf_small):
    """The one wide stage is the suffix sort WITHIN anchor groups — the
    window must partition by the 8-gram anchor hash (group sizes = shingle
    occurrence counts, the documented skew knob), never globally; the
    identity join-back must not be a cartesian and the suffix explode must
    stay codegen'd (no Python workers in this query at all)."""
    plan = plan_of(spark, sf_small, "dedup_exact_substring")
    specs = re.findall(r"windowspecdefinition\(([^,]+),", plan)
    assert specs, plan
    assert all("anchor" in s for s in specs), plan
    assert "CartesianProduct" not in plan, plan
    for marker in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
        assert marker not in plan, plan


def test_isotonic_fit_stays_on_broadcast_joins(spark, sf_small):
    """The PAV stage must not add any wide construct: its self-joins on the
    <=8-row bin table are broadcast-nested-loop (range predicates can't
    hash), never cartesian, and the fit introduces no window/sort — at
    100 TB the only full-scale work remains the upstream NB aggregation."""
    plan = plan_of(spark, sf_small, "isotonic_margin_fit")
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" in plan, plan
    assert "windowspecdefinition" not in plan, plan


def test_bradley_terry_iteration_never_touches_events(spark, sf_small):
    """The MM fit runs on collected BOUNDED matchup metadata; the Spark
    plan must therefore contain exactly the Copeland-shaped work — one
    per-user duel self-join, per-type aggregates, a broadcast attach of
    the fitted strengths, and the bounded rank window — with no cartesian
    and no Python workers."""
    plan = plan_of(spark, sf_small, "bradley_terry_rank")
    assert "CartesianProduct" not in plan, plan
    for marker in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
        assert marker not in plan, plan
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan, plan


def test_exact_substring_scrub_windows_bounded(spark, sf_small):
    """The scrub adds only doc_id-partitioned interval-merge windows
    (bounded by document length) on top of the shared anchor-partitioned
    suffix sort — no global window, no cartesian, no Python workers."""
    plan = plan_of(spark, sf_small, "exact_substring_scrub")
    specs = re.findall(r"windowspecdefinition\(([^,]+),", plan)
    assert specs, plan
    assert all("anchor" in s or "doc_id" in s for s in specs), plan
    assert "CartesianProduct" not in plan, plan
    for marker in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
        assert marker not in plan, plan


def test_unigram_lm_fold_has_no_joins_in_hot_loop(spark, sf_small):
    """The Viterbi DP must be ONE codegen'd aggregate fold per word type —
    no per-step joins, no Python workers, no windows; the vocabulary cost
    attach broadcasts; nothing shuffles except the word/piece-keyed
    aggregations."""
    plan = plan_of(spark, sf_small, "unigram_lm_viterbi")
    assert "CartesianProduct" not in plan, plan
    assert "windowspecdefinition" not in plan, plan
    for marker in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
        assert marker not in plan, plan
    # The fold itself sits behind the em localCheckpoint boundary and is
    # invisible to the formatted plan; its single-expression shape is
    # pinned structurally instead: the builder source contains exactly one
    # aggregate() fold and no join inside the segmentation stage.
    import inspect

    from amazon_kinesis_data_streams_health_check_spark.plans import (
        mining_queries as mq,
    )

    src = inspect.getsource(mq._ug_spark_fold)
    assert "aggregate(" in src and "join" not in src


def test_journey_surprisal_broadcasts_edge_costs(spark, sf_small):
    """The scoring pass must join the bounded transition-cost matrix as a
    BROADCAST (hot edges like view->view would pile onto one reducer in a
    shuffle join); the only window partitions by user_id."""
    plan = plan_of(spark, sf_small, "journey_markov_surprisal")
    assert "CartesianProduct" not in plan, plan
    for spec in re.findall(r"windowspecdefinition\(([^,]+),", plan):
        assert "user_id" in spec, plan
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan


def test_domain_mw_reweight_is_broadcast_only(spark, sf_small):
    """One corpus-scale scoring pass with the Heaps-bounded vocabulary
    broadcast; the MW step itself runs on the |sources|-row aggregate with
    1-row broadcast attaches — no sort-merge join, no window, no
    cartesian."""
    plan = plan_of(spark, sf_small, "domain_mw_reweight")
    assert "CartesianProduct" not in plan, plan
    assert "windowspecdefinition" not in plan, plan
    assert "SortMergeJoin" not in plan, plan
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan, plan


def test_lpa_rounds_are_pregel_by_joins(spark, sf_small):
    """Each LPA round must be join + keyed aggregation over the pinned edge
    set — no cartesian, no window beyond the kNN top-k's per-query rank,
    no Python workers; the argmax is a string min() (order-free)."""
    plan = plan_of(spark, sf_small, "knn_label_propagation")
    assert "CartesianProduct" not in plan, plan
    for marker in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
        assert marker not in plan, plan
    for spec in re.findall(r"windowspecdefinition\(([^,]+),", plan):
        assert "query_id" in spec or "vec_id" in spec, plan


def test_mmr_single_corpus_pass_then_pool_sized(spark, sf_small):
    """One corpus-scale relevance pass (broadcast query set — BNL, never a
    CartesianProduct); everything after the rank <= POOL cut is pool-sized:
    windows partition by query_id only, no Python workers, no sort-merge
    join."""
    plan = plan_of(spark, sf_small, "mmr_diversified_topk")
    assert "CartesianProduct" not in plan, plan
    assert "SortMergeJoin" not in plan, plan
    for marker in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
        assert marker not in plan, plan
    for spec in re.findall(r"windowspecdefinition\(([^,]+),", plan):
        assert "query_id" in spec, plan


def test_pass_at_k_single_aggregation_no_joins(spark, sf_small):
    """One user-keyed aggregation builds the task table; the k-legs are
    arithmetic projections — no joins, no windows, no Python workers."""
    plan = plan_of(spark, sf_small, "pass_at_k_eval")
    assert "Join" not in plan, plan
    assert "windowspecdefinition" not in plan, plan
    for marker in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
        assert marker not in plan, plan


def test_cosine_dup_curve_broadcasts_digest_and_fit(spark, sf_small):
    """The md5 digest attaches broadcast; pair generation stays the
    label-blocked join; the PAV stage is broadcast-nested-loop on the
    <=10-bin table — no sort-merge join anywhere."""
    plan = plan_of(spark, sf_small, "isotonic_cosine_dup_curve")
    assert "CartesianProduct" not in plan, plan
    assert "SortMergeJoin" not in plan, plan
    assert "BroadcastNestedLoopJoin" in plan, plan


def test_length_emd_windows_bounded_by_source(spark, sf_small):
    """All work after the one (source, bin)-keyed corpus aggregation runs
    on the bounded grid: windows partition by source over 32-row frames,
    every dimension join broadcasts, no cartesian."""
    plan = plan_of(spark, sf_small, "length_emd_drift")
    assert "CartesianProduct" not in plan, plan
    assert "SortMergeJoin" not in plan, plan
    for spec in re.findall(r"windowspecdefinition\(([^,]+),", plan):
        assert "source" in spec, plan


def test_absorbing_funnel_iteration_never_touches_events(spark, sf_small):
    """Same contract as Bradley-Terry: the sweeps run on collected bounded
    matrix metadata, so the Spark plan is one user window + bounded-key
    aggregates + a broadcast attach — no cartesian, no Python workers."""
    plan = plan_of(spark, sf_small, "funnel_absorbing_markov")
    assert "CartesianProduct" not in plan, plan
    for marker in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
        assert marker not in plan, plan
    for spec in re.findall(r"windowspecdefinition\(([^,]+),", plan):
        assert "user_id" in spec, plan


def test_source_containment_has_no_shingle_self_join(spark, sf_small):
    """Pair counts must come from the counted source-set combos, never a
    shingle self-join: exactly zero non-broadcast joins on the shingle
    column, no cartesian, and the only windows (none expected) would be
    bounded."""
    plan = plan_of(spark, sf_small, "source_containment_matrix")
    assert "CartesianProduct" not in plan, plan
    assert "windowspecdefinition" not in plan, plan
    assert "SortMergeJoin" not in plan, plan


def test_semantic_dedup_broadcasts_centroids_no_cartesian(spark, sf_small):
    """SemDeDup's within-cluster pair stage must be an equi-join on the
    cluster id, never a CartesianProduct and never a global sort. (The
    centroid-assignment BroadcastNestedLoopJoin sits behind the ranked
    localCheckpoint barrier, so it is pinned structurally instead: the
    checkpointed plan must contain no join at all beyond the pair/size
    joins — a non-broadcast assignment would surface here as an extra
    shuffle join on vec_id.)"""
    plan = plan_of(spark, sf_small, "dedup_semantic_clusters")
    assert "CartesianProduct" not in plan, plan
    assert "Exchange rangepartitioning" not in plan, plan


def test_gopher_rules_single_codegen_scan(spark, sf_small):
    """The quality battery must be pure scan+project work: no join, no
    shuffle beyond parallel_scan's single deliberate round-robin (the
    CPU-parallelism device for unsplittable small files — a no-op at real
    scale). The ideal 100 TB filter stage."""
    plan = plan_of(spark, sf_small, "gopher_quality_rules")
    assert "Join" not in plan, plan
    assert "RoundRobinPartitioning" in plan, plan
    assert "hashpartitioning" not in plan and "rangepartitioning" not in plan, plan


def test_dsir_buckets_broadcast_back(spark, sf_small):
    """DSIR's 1024-row delta table must ride a broadcast back onto the
    exploded bigram stream — a shuffle join on the bucket key would move
    the whole token stream twice."""
    plan = plan_of(spark, sf_small, "dsir_importance_weights")
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastHashJoin" in plan, plan


def test_pack_audit_single_window_pass(spark, sf_small):
    """The budget sweep must ride ONE window cumsum over the 4x broadcast
    cross join — one Window operator, no rangepartitioning beyond it, no
    sort-merge joins."""
    plan = plan_of(spark, sf_small, "pack_efficiency_audit")
    assert "CartesianProduct" not in plan, plan
    assert "SortMergeJoin" not in plan, plan
    assert plan.count("Window") >= 1, plan


def test_ccnet_window_partitions_by_lang(spark, sf_small):
    """The tercile window must partition by language (a bounded dimension),
    never a global sort."""
    plan = plan_of(spark, sf_small, "ccnet_perplexity_buckets")
    assert "CartesianProduct" not in plan, plan
    import re as _re

    m = _re.search(r"ntile.*?windowspecdefinition\((\w+)", plan)
    assert m and m.group(1).startswith("lang"), plan


def test_neardup_decontamination_broadcasts_eval_index(spark, sf_small):
    """The decontamination probe must ride broadcasts of the bounded eval
    side (band index + eval shingle sets) — a shuffle join on band keys
    would move the full training band stream; a CartesianProduct anywhere
    is a blocking bug."""
    plan = plan_of(spark, sf_small, "eval_decontamination_neardup")
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastHashJoin" in plan, plan


def test_semantic_blocking_recall_no_cartesian(spark, sf_small):
    """The audit's quadratic truth leg must be the broadcast theta-join on
    the BOUNDED md5 sample (BroadcastNestedLoop over ~target rows), never a
    CartesianProduct over unbroadcast sides, and nothing may global-sort."""
    plan = plan_of(spark, sf_small, "semantic_blocking_recall")
    assert "CartesianProduct" not in plan, plan
    assert "Exchange rangepartitioning" not in plan, plan


def test_bloom_dedup_fpr_audit_broadcasts_filter(spark, sf_small):
    """The Bloom filter's position set is bounded by m_bits rows — the
    entire point of the design — so the probe must ride a BroadcastHashJoin
    against it; a CartesianProduct anywhere (the config/scalar cross-joins
    must stay broadcast nested loops over literal-sized sides) or a global
    sort is a blocking bug."""
    plan = plan_of(spark, sf_small, "bloom_dedup_fpr_audit")
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastHashJoin" in plan, plan
    assert "Exchange rangepartitioning" not in plan, plan


def test_contamination_span_stats_broadcasts_eval_grams(spark, sf_small):
    """Span matching must ride a broadcast of the bounded eval-gram index
    over the narrow positional explode — a shuffle join on gram strings
    would move the full training gram stream; a CartesianProduct anywhere
    is a blocking bug; the per-doc windows must not induce a global sort."""
    plan = plan_of(spark, sf_small, "contamination_span_stats")
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastHashJoin" in plan, plan
    assert "Exchange rangepartitioning" not in plan, plan
