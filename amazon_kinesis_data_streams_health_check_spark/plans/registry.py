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

#: Round-5 rotation — 18 never-driver-checked queries (first-ever rows):
#: the round-4 verdict's candidate list, with two batch picks
#: (auc_rank_exact, prefix_cache_hit_estimate — deferred to round 6)
#: swapped for two more streaming state-store twins so the window carries
#: >=4 streaming first-ever rows (round-4 verdict item 4).
ROTATION: tuple[str, ...] = (
    "kinesis_e2e_pipeline",  # produce->shard->consume->alarm, end to end
    "kcl_subsequence_checkpoint",  # KCL (seq, subseq) resume over KPL blobs
    "streaming_schema_drift",  # streaming twin: payload-evolution monitor
    "wordpiece_segment",  # top-down subword tokenizer (vs bottom-up BPE)
    "span_corruption_plan",  # T5 span-corruption planning, md5-reproducible
    "nb_margin_calibration",  # Naive-Bayes margin vs accuracy calibration
    "quality_matched_resample",  # distribution-matched importance resample
    "kneser_ney_bigram",  # interpolated KN bigram LM, exact integer core
    "media_interleave_pack",  # MMC4-style multimodal sequence packing
    "streaming_ewma_chart",  # streaming twin: EWMA control chart state
    "ngram_novelty_decay",  # first-occurrence novelty, bench headline
    "streaming_forecast_residuals",  # streaming twin: forecast residuals
    "shard_autoscale_plan",  # split/merge planning vs real key distribution
    "json_schema_drift",  # batch payload-evolution monitor
    "streaming_kpl_consume",  # streaming twin: KPL deaggregation consume
    "consumer_dlq_replay",  # F4 extension: DLQ routing + replay
    "maxsim_late_interaction",  # ColBERT-style MaxSim retrieval
    "lake_dpp_join",  # dynamic partition pruning join audit
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
