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

#: Round-8 rotation — 40 never-driver-checked queries (first-ever rows):
#: the 10 round-7 additions named in the handoff (incl. the two sf100
#: redesign targets dedup_simhash_verified / streaming_curation_cascade,
#: which land this round with the 128-bit / adaptive-banding fixes), 4
#: more streaming twins (8 streaming total, quota >=4 met with margin),
#: and breadth picks across the healthcheck-metrics, relational, ANN,
#: corpus-stats, behavior, and lake families from COVERAGE.md's
#: 171-query never-checked pool.
ROTATION: tuple[str, ...] = (
    # round-7 handoff candidates (10; 4 streaming)
    "dedup_simhash_verified",  # centered-SimHash full-threshold + verify
    "streaming_curation_cascade",  # per-batch FineWeb cascade vs history
    "streaming_semantic_ingest",  # SemDeDup bootstrap-fit + batch assign
    "semantic_blocking_recall",  # k-means cell blocking recall audit
    "fuzzy_blocking_recall",  # Manku band blocking recall audit
    "eval_decontamination_neardup",  # Llama-2/GPT-4 fuzzy decontam rule
    "streaming_decontamination_gate",  # ingest-time eval-gram probe
    "bloom_dedup_fpr_audit",  # Dolma fixed-memory Bloom FPR audit
    "contamination_span_stats",  # GPT-3 appx-C span accounting
    "streaming_bloom_ingest",  # first-setter Bloom crawl gate
    # streaming extras (4)
    "streaming_put_sink",  # streaming Kinesis put-sink roundtrip
    "streaming_corpus_quality",  # per-batch corpus quality rollup
    "streaming_trending_terms",  # windowed trending-term extraction
    "streaming_hysteresis_alarm",  # two-threshold streaming alarm
    # healthcheck / metrics (7)
    "metric_gap_interpolation",  # gap fill over period grid
    "composite_alarm",  # AND/OR alarm-rule composition
    "slo_burn_rate_alarm",  # multi-window SLO burn rate
    "hysteresis_alarm",  # two-threshold batch alarm
    "ewma_control_chart",  # EWMA control limits
    "kinesis_cost_units",  # shard-hour / PUT-payload cost model
    "consumer_iterator_age",  # iterator-age percentile audit
    # relational (5)
    "revenue_cube",  # CUBE grouping
    "revenue_grouping_sets",  # GROUPING SETS
    "dq_violations",  # data-quality rule violations
    "lineitem_corr_exact",  # exact Pearson corr via integer sums
    "market_basket_rules",  # association rules support/confidence
    # ANN / embedding (4)
    "ann_lsh_recall",  # LSH-bucket recall vs brute truth
    "ann_ivf_flat",  # IVF-Flat top-k search
    "sketch_heavy_hitters",  # misra-gries style heavy hitters
    "incremental_minhash_index",  # incremental band-index maintenance
    # corpus / mining (4)
    "vocab_stats",  # corpus vocabulary statistics
    "heaps_law_fit",  # Heaps vocab-growth law fit
    "rrf_fusion_search",  # reciprocal-rank-fusion retrieval
    "filter_agreement_kappa",  # Cohen kappa between quality filters
    # behavior (3)
    "funnel_stages",  # ordered funnel stage conversion
    "session_concurrency",  # interval-overlap concurrency
    "kaplan_meier_survival",  # KM survival estimate
    # lake (3)
    "lake_bucketed_join",  # bucketed co-located join
    "lake_time_travel_asof",  # snapshot as-of read
    "cdc_apply_changelog",  # CDC changelog apply
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
