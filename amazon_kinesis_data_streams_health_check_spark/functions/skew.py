"""Skew-mitigation building blocks: salted two-phase aggregation.

AQE's skew-join splitting (enabled in session.BUILD_CONFS) covers joins at
runtime; salting is the complementary technique for *aggregations* whose key
distribution is pathological (one key holding a large fraction of all rows —
e.g. a `count_distinct` per domain where one domain dominates a crawl).

The pattern: phase 1 aggregates on (key, salt) so the hot key's rows spread
over ``salt_buckets`` reducers; phase 2 merges the per-salt partials on the
key alone — by then each key is a handful of rows. Results are identical to
the direct aggregation for any merge-associative aggregate; the helpers below
cover counts, sums, and count-distinct (distinct first within (key, salt,
value), then counted per key — exact, not a sketch).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_SALT_BUCKETS = 64


def with_salt(df: DataFrame, salt_buckets: int = DEFAULT_SALT_BUCKETS) -> DataFrame:
    """Deterministic salt derived from the whole row (not rand(): results
    must be reproducible and oracle-comparable). xxhash64 over all columns
    spreads rows uniformly; any stable per-row expression works."""
    return df.withColumn(
        "_salt", F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(salt_buckets))
    )


def salted_agg(
    df: DataFrame,
    keys: Sequence[str],
    partial_aggs: Sequence[Column],
    final_aggs: Sequence[Column],
    salt_buckets: int = DEFAULT_SALT_BUCKETS,
) -> DataFrame:
    """Two-phase salted aggregation.

    ``partial_aggs`` aggregate within (keys, salt); ``final_aggs`` merge the
    partials per key. Example — skew-proof row count and sum::

        salted_agg(df, ["k"],
                   [F.count(F.lit(1)).alias("c"), F.sum("v").alias("s")],
                   [F.sum("c").alias("n_rows"), F.sum("s").alias("total")])
    """
    keys = list(keys)
    salted = with_salt(df, salt_buckets)
    partial = salted.groupBy(*keys, "_salt").agg(*partial_aggs)
    return partial.groupBy(*keys).agg(*final_aggs)


def salted_count_distinct(
    df: DataFrame,
    keys: Sequence[str],
    value_col: str,
    out_col: str = "n_distinct",
    salt_buckets: int = DEFAULT_SALT_BUCKETS,
) -> DataFrame:
    """Exact per-key count-distinct that never concentrates a hot key on one
    reducer.

    Salting by the VALUE (not the whole row) keeps correctness trivial: every
    occurrence of a (key, value) pair lands in the same salt bucket, so the
    phase-1 ``collect_set``-free distinct is local, and phase-2 sums disjoint
    per-bucket distinct counts.
    """
    keys = list(keys)
    salted = df.withColumn(
        "_salt", F.pmod(F.xxhash64(F.col(value_col)), F.lit(salt_buckets))
    )
    per_bucket = salted.groupBy(*keys, "_salt").agg(
        F.countDistinct(value_col).alias("_d")
    )
    return per_bucket.groupBy(*keys).agg(F.sum("_d").cast("long").alias(out_col))


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    on: Sequence[str],
    salt_buckets: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Skew-proof shuffle join: spread each hot join key over
    ``salt_buckets`` reducers by salting the fact side and REPLICATING the
    dim side across every salt value.

    For a dim too large to broadcast but far smaller than the fact (the only
    regime where this wins: replication costs |dim| x salt_buckets), a plain
    shuffle join sends every fact row of a hot key to one task; salting
    re-keys the shuffle to (key, salt) so the hot key parallelizes
    ``salt_buckets`` ways. The join RESULT is identical to the unsalted join
    for any salt assignment — each fact row still meets exactly one replica
    of its dim row — so correctness is independent of the salt expression.
    AQE's skew split covers sort-merge joins at runtime; explicit salting
    also covers shuffled-hash joins and pre-partitioned reuse.
    """
    on = list(on)
    f = fact.withColumn(
        "_salt",
        F.pmod(F.xxhash64(*[F.col(c) for c in fact.columns]), F.lit(salt_buckets)),
    )
    d = dim.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1)))
    )
    # shuffle_hash hint: without it Catalyst would broadcast a small dim and
    # the salt would be dead weight (broadcast joins don't shuffle at all).
    return f.join(d.hint("shuffle_hash"), on + ["_salt"], how).drop("_salt")
