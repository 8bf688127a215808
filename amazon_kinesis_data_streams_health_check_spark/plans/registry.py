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

#: Round-6 rotation — 18 never-driver-checked queries (first-ever rows):
#: the round-5 verdict's candidate list (its 22 names trimmed to the 18-slot
#: window by deferring length_emd_drift and 3 overflow picks to round 7),
#: carrying all FOUR streaming state-store twins so the window satisfies
#: the standing >=4-streaming quota (round-5 verdict items 1 and 6).
ROTATION: tuple[str, ...] = (
    "dedup_exact_substring",  # suffix-array exact-substring dedup (Lee 2022)
    "exact_substring_scrub",  # cut sheet: merged >=16-token dup intervals
    "exact_substring_ingest_probe",  # persisted suffix index incremental probe
    "unigram_lm_viterbi",  # SentencePiece unigram-LM hard-EM round 1
    "unigram_lm_em2",  # second Viterbi EM round over refit costs
    "isotonic_margin_fit",  # PAV isotonic calibration of NB margins
    "isotonic_cosine_dup_curve",  # PAV cosine->dup-probability curve
    "bradley_terry_rank",  # BT preference MLE, fixed-point integer MM
    "funnel_absorbing_markov",  # absorbing-chain funnel conversion
    "journey_markov_surprisal",  # per-user journey surprisal vs fitted chain
    "domain_mw_reweight",  # DoReMi-style multiplicative-weights domains
    "knn_label_propagation",  # community labels via Pregel-by-joins
    "mmr_diversified_topk",  # MMR diversified retrieval
    "pass_at_k_eval",  # unbiased hypergeometric pass@k
    "streaming_journey_surprisal",  # streaming twin: journey surprisal state
    "streaming_pack_assign",  # streaming twin: online sequence packing
    "streaming_control_ensemble",  # streaming twin: control-chart ensemble
    "streaming_rate_limit",  # streaming twin: token-bucket rate limiting
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
