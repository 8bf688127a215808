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
#: Rotation policy (round 7 onward, per the round-6 verdict item 1): only
#: the reference-parity healthcheck core plus the two bench flagships stay
#: pinned every round (PINNED, 10 slots) — the old 24-query LLM block had
#: been driver-green 5-6 consecutive rounds and re-checking it bought
#: nothing. The remaining 40 slots (ROTATION) cycle through queries that
#: have never had a driver CORRECTNESS row, so cumulative driver coverage
#: grows ~40/round against the 201-query backlog. Everything rotated OUT
#: keeps its green row from an earlier round and remains covered by the
#: sf0.001/sf0.01 oracle-parity suites (tests/test_oracle_parity.py).
#: Names not listed follow in registration order; a listed-but-unregistered
#: name — and a ROTATION slot burned on an already-green query while
#: never-checked ones remain — are errors caught by tests/test_registry.py
#: against the CORRECTNESS_r*.json history.
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
    # bench flagships — pinned so the driver always re-checks the two
    # queries the per-round benchmark leans on hardest
    "text_quality",
    "dedup_minhash_lsh",
)

#: Round-7 rotation — 40 never-driver-checked queries (first-ever rows):
#: six streaming state-store twins (standing >=4-streaming quota), the
#: full never-checked dedup/contamination family, the curation cascade +
#: Gopher/DSIR/CCNet block (incl. the two queries that took round-6 ADVICE
#: fixes this round: curation_pipeline_e2e oracle coalesce,
#: simhash_blocking_recall derived sample mod), the ANN recall-audit
#: family, multimodal, and breadth picks (relational skew / lake merge /
#: corpus stats).
ROTATION: tuple[str, ...] = (
    # streaming twins (6)
    "streaming_late_data_audit",  # watermark late/dropped-row audit
    "streaming_lease_rebalance",  # KCL lease steal/rebalance state
    "streaming_novelty_ingest",  # per-batch novel-ngram rate vs history
    "streaming_dedup_index_ingest",  # incremental exact-dup index probe
    "streaming_sprt_monitor",  # sequential probability-ratio monitor
    "streaming_quality_gate",  # streaming Gopher quality gate
    # dedup / contamination family (12)
    "dedup_containment",  # asymmetric containment dedup
    "dedup_exact_groups",  # exact-hash group detail
    "dedup_method_agreement",  # MinHash vs SimHash vs exact agreement
    "dedup_semantic",  # eps-cosine semantic dup pairs
    "dedup_semantic_clusters",  # SemDeDup k-means cluster prune
    "dedup_survivorship_audit",  # survivor-pick policy audit
    "dedup_threshold_pr_curve",  # Jaccard threshold precision/recall
    "lsh_s_curve_validation",  # banding S-curve vs measured candidates
    "contamination_check",  # train/eval n-gram overlap
    "eval_contamination_13gram",  # GPT-3/PaLM 13-gram decontamination
    "winnowing_fingerprints",  # Schleimer 2003 winnowing/MOSS
    "simhash_blocking_recall",  # band-pair blocking recall audit
    # curation block (8)
    "gopher_quality_rules",  # Rae 2021 A1.1 rule battery
    "curation_pipeline_e2e",  # FineWeb-style 4-stage cascade
    "dsir_importance_weights",  # Xie 2023 hashed-bigram DSIR
    "ccnet_perplexity_buckets",  # Wenzek 2020 per-lang terciles
    "boilerplate_line_scrub",  # repeated-line boilerplate removal
    "pii_redaction_stats",  # PII pattern redaction accounting
    "token_budget_waterfill",  # per-source token water-filling
    "leakage_safe_split",  # cluster-aware train/test split
    # ANN recall audits (5)
    "ann_ivf_recall",  # IVF probe recall vs brute truth
    "ann_ivfpq_recall",  # IVF-PQ/ADC recall
    "ann_matryoshka_recall",  # prefix-dim recall curve
    "ann_pq_adc_recall",  # PQ asymmetric-distance recall
    "retrieval_ndcg_mrr",  # nDCG@k + MRR integer-discount eval
    # multimodal (3)
    "media_phash_dedup",  # pHash hamming near-dup images
    "media_resize",  # stub-decoder resize plumbing
    "media_audio_windows",  # audio frame windowing stats
    # breadth (6)
    "source_containment_matrix",  # bench query: cross-source containment
    "heldout_unigram_perplexity",  # heldout LM perplexity
    "collocation_pmi",  # PMI collocation mining
    "zipf_law_fit",  # Zipf rank-frequency fit
    "skew_salted_join",  # salted skew-join audit
    "lake_merge_upsert",  # MERGE upsert semantics
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
