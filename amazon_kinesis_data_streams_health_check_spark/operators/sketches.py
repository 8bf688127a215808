"""Mergeable-sketch rollups: Datasketches HLL / KLL / theta over events.

THE pre-aggregation pattern for 100 TB analytics: sketch each partition (day,
hour, stream) once at ingest; answer any-range distinct/quantile queries by
UNIONING the stored sketches — cost proportional to the number of buckets,
never a raw-data rescan. Spark 4 ships Apache DataSketches natives
(``hll_sketch_agg`` / ``hll_union_agg`` / ``kll_sketch_*``) which are
deterministic for a given input multiset and parameters, so "merge of parts
== sketch of whole" is an exact invariant we pin in tests — not an
approximation claim.

No DuckDB oracle: DuckDB's approx algorithms are different implementations
(rows-only check for the registry entry; the merge==direct invariant and
error bounds are pinned in tests/test_sketches.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: lgK for HLL (2^12 buckets — DataSketches default, ~1.6% rse).
HLL_LGK = 12


def daily_sketch_rollup(
    events: DataFrame,
    key_col: str = "event_type",
    user_col: str = "user_id",
    value_col: str = "value",
) -> DataFrame:
    """events -> one row per (key, day) carrying mergeable sketch blobs.

    This is the ingest-side materialization: binary HLL (distinct users),
    KLL (value quantiles) per bucket. At scale this lands in the partitioned
    lake next to the raw data, ~KB per bucket.
    """
    return events.groupBy(
        F.col(key_col).alias("key"), F.to_date("ts").alias("day")
    ).agg(
        F.hll_sketch_agg(user_col, F.lit(HLL_LGK)).alias("users_hll"),
        F.kll_sketch_agg_double(value_col).alias("value_kll"),
        F.count(F.lit(1)).alias("n_rows"),
    )


def merge_rollup(daily: DataFrame) -> DataFrame:
    """Union the per-day sketches per key -> whole-range estimates.

    ``hll_union_agg`` / ``kll_sketch_merge_double`` are the query-side half:
    any date range folds its buckets in one tiny aggregation.
    """
    # KLL has no native union AGGREGATE (only the binary merge), so fold the
    # per-day blobs: collect_list is bounded by buckets-per-key (days), a few
    # KB each — driver-safe at any event volume.
    kll_fold = (
        "aggregate(slice(klls, 2, size(klls) - 1), klls[0], "
        "(acc, x) -> kll_sketch_merge_double(acc, x))"
    )
    return (
        daily.groupBy("key")
        .agg(
            F.hll_sketch_estimate(
                F.hll_union_agg("users_hll", F.lit(False))
            ).alias("est_distinct_users"),
            F.collect_list("value_kll").alias("klls"),
            F.sum("n_rows").alias("n_rows"),
        )
        .select(
            "key",
            "est_distinct_users",
            F.expr(f"kll_sketch_get_quantile_double({kll_fold}, 0.5D)").alias(
                "value_p50"
            ),
            F.expr(f"kll_sketch_get_quantile_double({kll_fold}, 0.99D)").alias(
                "value_p99"
            ),
            "n_rows",
        )
    )


def direct_sketch(
    events: DataFrame,
    key_col: str = "event_type",
    user_col: str = "user_id",
    value_col: str = "value",
) -> DataFrame:
    """Single-pass whole-range sketch (no daily buckets) — the reference
    point for the merge==direct determinism invariant."""
    return events.groupBy(F.col(key_col).alias("key")).agg(
        F.hll_sketch_estimate(F.hll_sketch_agg(user_col, F.lit(HLL_LGK))).alias(
            "est_distinct_users"
        ),
        F.kll_sketch_get_quantile_double(
            F.kll_sketch_agg_double(value_col), F.lit(0.5)
        ).alias("value_p50"),
    )
