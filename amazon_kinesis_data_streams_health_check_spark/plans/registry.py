"""Named query registry — the engine's public query surface.

Each :class:`Query` pairs a Spark DataFrame builder with (where expressible)
an equivalent DuckDB SQL string over the same parquet tables; the driver's
correctness gate runs both at sf0.01 and hash-compares results
(``__spark_entry__.py`` contract). Column names/aliases are kept identical on
both sides; float aggregates are rounded identically so value hashes are
stable across engines.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class Query:
    name: str
    builder: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # DuckDB SQL twin; None => rows-only check
    doc: str = ""
    tags: tuple[str, ...] = field(default_factory=tuple)


_REGISTRY: dict[str, Query] = {}

#: Explicit surfacing order for the registry. The driver's correctness gate
#: checks the FIRST 50 entries of ``queries()``; registration order is a
#: byproduct of module import order, so the window is pinned here.
#:
#: Rotation policy (round 3 onward): the reference-parity healthcheck core
#: and the LLM-pipeline block stay pinned every round (PINNED, 32 slots);
#: the remaining 18 slots (ROTATION) cycle through queries that have never
#: had a driver CORRECTNESS row, so cumulative driver coverage grows round
#: over round. Everything rotated OUT keeps its green row from an earlier
#: round and remains covered by the sf0.001/sf0.01 oracle-parity suites
#: (tests/test_oracle_parity.py). Names not listed follow in registration
#: order; a listed-but-unregistered name — and a ROTATION slot burned on an
#: already-green query while never-checked ones remain — are errors caught
#: by tests/test_registry.py against the CORRECTNESS_r*.json history.
PINNED: tuple[str, ...] = (
    # healthcheck core (reference parity) — pinned permanently
    "health_lag_alarm",
    "tracer_produce",
    "consumer_metrics",
    "first_record_parity",
    "arn_parse",
    "alarm_nofm",
    "missing_periods",
    "alarm_transitions",
    # LLM-pipeline: text / dedup / ANN / multimodal / sketches — pinned
    "text_quality",
    "lang_id_confusion",
    "doc_fingerprints",
    "dedup_exact_summary",
    "dedup_keep_list",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "dedup_ngram_jaccard",
    "embedding_near_dups",
    "ann_topk_bruteforce",
    "ann_lsh_bucketed",
    "embedding_quantization",
    "repetition_stats",
    "substring_dup_frac",
    "split_assign",
    "knn_graph_lsh",
    "hybrid_search",
    "media_stats",
    "media_features",
    "media_frame_sample",
    "sketch_rollup_merge",
    "doc_chunks",
    "tfidf_top_terms",
    "inverted_index",
)

#: Round-4 rotation — 18 never-driver-checked queries (first-ever rows):
#: the judge's candidate list (lake/streaming/embedding/kinesis blocks),
#: the three heavy LLM-pipeline queries newly promoted to the bench set,
#: and the K1 put-sink legs.
ROTATION: tuple[str, ...] = (
    "lake_bloom_skip",
    "dup_span_stats",
    "streaming_lake_ingest",  # W2 checkpoint-restart driven for real
    "embedding_pca_project",
    "shard_reshard_routing",
    "kmeans_lloyd_exact",
    "dedup_jaccard_allpairs",
    "dedup_lsh_recall",
    "bm25_topk",
    "cusum_changepoint",
    "streaming_cusum",
    "dedup_fuzzy_edit",  # bench headline (round-4 addition)
    "bpe_merge_learn",  # bench headline (round-4 addition)
    "doc_bigram_surprisal",  # bench headline (round-4 addition)
    "kinesis_put_sink_roundtrip",
    "kinesis_kpl_deaggregate",  # KPL aggregated wire (round-4 addition)
    "streaming_trigger_cadence",  # W1 driver-visible (round-4 addition)
    "shard_order_audit",  # X2 driver-visible (round-4 addition)
)

_PRIORITY: tuple[str, ...] = PINNED + ROTATION


def register(
    name: str,
    oracle: str | None,
    doc: str = "",
    tags: tuple[str, ...] = (),
) -> Callable[[Callable[[SparkSession, str], DataFrame]], Callable[[SparkSession, str], DataFrame]]:
    """Decorator: register a (spark, sf_dir) -> DataFrame builder."""

    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        _REGISTRY[name] = Query(name=name, builder=fn, oracle=oracle, doc=doc or fn.__doc__ or "", tags=tags)
        return fn

    return deco


def all_queries() -> dict[str, Query]:
    # Import side-effect modules that populate the registry.
    from amazon_kinesis_data_streams_health_check_spark.plans import (  # noqa: F401
        healthcheck_queries,
        relational_queries,
        tpch_queries,
        curation_queries,
        ext_queries,
        textpipe_queries,
        corpus_queries,
        behavior_queries,
        lake_queries,
        mining_queries,
        streaming_queries,
    )

    ordered: dict[str, Query] = {}
    for name in _PRIORITY:
        if name in _REGISTRY:
            ordered[name] = _REGISTRY[name]
    for name, q in _REGISTRY.items():
        if name not in ordered:
            ordered[name] = q
    return ordered


def get(name: str) -> Query:
    return all_queries()[name]
