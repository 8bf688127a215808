"""Partition-layout invariance: the 100 TB reproducibility contract.

A correct distributed query returns byte-identical results whatever the
physical layout — shuffle-partition count, input split sizing, executor
count. Every decision in these queries is keyed on data (md5 hashes,
integer arithmetic, unique sort keys), never on partition ids or float
accumulation order, so re-running under a different layout must reproduce
the exact rows. This is the property that makes training-data pipelines
re-runnable: a cluster resize can't silently change the corpus.

Representative queries across the mechanism families:
- two-phase top-k merges (locals differ per layout, merge must not),
- iterative integer PageRank (sum order changes, BIGINTs don't care),
- deterministic-shuffle packing (md5 order, not scan order),
- windowed interpolation (growing frames over explicit sort keys).
"""

from __future__ import annotations

import pytest

from amazon_kinesis_data_streams_health_check_spark.plans.registry import all_queries

QUERIES = all_queries()

INVARIANT = [
    "skipgram_pairs",
    "pagerank_knn",
    "curation_pack_sequences",
    "metric_anomaly_flags",
    "substring_dup_frac",
    # round-3 additions: lake-probe dedup (persisted index + verify joins),
    # mergeable CM sketch (bucket-grid sums), graph census (edge-join
    # closure) — each a distinct mechanism family
    "incremental_minhash_index",
    "sketch_heavy_hitters",
    "triangle_count_knn",
    # this session's additions: prefix-bucket global indexing (per-bucket
    # ranks + broadcast offsets must recompose identically under any
    # layout), banded phash pairing, integer surprisal scoring
    "epoch_global_index",
    "media_phash_dedup",
    "doc_surprisal_score",
    # lossless prefix-filter join: rarity regroup (array_sort over structs)
    # and candidate distinct must reproduce under any shuffle layout
    "dedup_jaccard_allpairs",
    # continuation additions: narrow basket-pair generation + broadcast
    # dimensions, exact-integer centroid keep rule, two-term join-delta fold
    "market_basket_rules",
    "dedup_semantic",
    "incremental_join_maintenance",
    # this session: positional gaps-and-islands over shared shingles (window
    # ids must not depend on scan order), integer power-iteration PCA (gram
    # sum order changes under layout, the BIGINT iteration must not)
    "dup_span_stats",
    "embedding_pca_project",
    # pointer-jumping ancestor composition must resolve identically whatever
    # the join layout; the OLS moment sums are exact integers by design
    "bom_ancestor_paths",
    "grouped_linear_fit",
    # journey strings and the Holt fold both build per-group sorted arrays
    # narrowly (layout changes the collect order, array_sort restores it);
    # interval islands ride running-max windows over explicit sort keys;
    # the skyline's prefix max lives on a bounded broadcast dimension
    "event_journey_patterns",
    "holt_forecast_daily",
    "interval_coalesce_activity",
    "pareto_skyline_parts",
    # Lloyd rounds: float centroids would drift with partition order and
    # compound across iterations; the integer pipeline must not
    "kmeans_lloyd_exact",
    # round-4 third session: md5-decided acceptance (per-doc hash against
    # bounded count products — MUST not depend on which partition counted),
    # pad-to-max batch membership (row_number over explicit total orders),
    # tie-group rank sums (cumulative window over the aggregated relation)
    "quality_matched_resample",
    "padded_batch_waste",
    "auc_rank_exact",
    # round-4 fourth session: two-phase MaxSim merge (locals differ per
    # layout, the integer merge must not), pool-rank lease assignment
    # (row_number over explicit shard keys feeding offset-aligned takes),
    # rank-formula Gini (per-stream ranks over an aggregated relation)
    "maxsim_late_interaction",
    "kcl_lease_rebalance",
    "gini_concentration",
    # round-6: SemDeDup's integer k-means + rank-ordered prune (float
    # centroids or unordered pruning would drift per layout); the e2e
    # cascade's md5-canonical and dominance stages; CCNet terciles over
    # (micro_bits, doc_id) explicit total orders
    "dedup_semantic_clusters",
    "curation_pipeline_e2e",
    "ccnet_perplexity_buckets",
    # round-8: the sampled-fit SemDeDup twin (same total-order guarantees
    # as the full fit; the md5 sample is layout-independent by key)
    "dedup_semantic_sampled",
]


def _rows(df):
    return sorted(tuple(str(v) for v in r) for r in df.collect())


@pytest.mark.parametrize("name", INVARIANT)
def test_result_invariant_under_partitioning(spark, sf_small, name):
    q = QUERIES[name]
    baseline = _rows(q.builder(spark, sf_small))
    saved = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "3")
        assert _rows(q.builder(spark, sf_small)) == baseline
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", saved)
