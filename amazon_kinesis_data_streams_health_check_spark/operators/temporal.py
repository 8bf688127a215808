"""Temporal join operators Spark lacks as built-ins: as-of join and
bucketized range join.

The reference never correlates its producer and consumer legs (it recomputes
lag locally, HealthCheckConsumerHandler.java:71); these operators are the
canonical way to do that correlation at scale (SURVEY.md §2.9 notes as-of as
an explicit absence), and they generalize to any event-stream analytics.

Scale design:

- ``asof_join`` is the union + sorted-window formulation: ONE shuffle on the
  key columns, a per-key sort, and a ``last(ignorenulls)`` propagation — the
  same cost class as a sort-merge join, with no range-condition row
  explosion. This beats the naive ``join on key AND r.ts <= l.ts`` +
  ``row_number`` approach, which materializes every (left, earlier-right)
  pair before pruning.
- ``range_join_buckets`` turns a pure range predicate (no equi key, or a
  low-selectivity one) into an equi-join on a coarse time bucket: the probe
  side explodes to the (at most two) buckets its window can overlap, the
  build side keeps its single bucket, and the exact predicate filters after
  the hash join. Shuffle volume is linear in input; Spark's fallback for
  inequality-only joins is a broadcast-nested-loop, which is quadratic.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_cols: Sequence[str] = (),
) -> DataFrame:
    """Backward as-of join: for each left row, attach the most recent right
    row with ``right_ts <= left_ts`` and equal ``on`` keys (left-outer: left
    rows with no prior right row keep NULLs).

    Output: all ``left`` columns plus ``right_cols`` (prefixed ``asof_``)
    and ``asof_ts`` (the matched right timestamp).
    """
    on = list(on)
    right_cols = list(right_cols)

    payload = F.struct(
        F.col(right_ts).alias("_ts"), *[F.col(c).alias(c) for c in right_cols]
    )
    r = right.select(
        *on,
        F.col(right_ts).alias("_evt_ts"),
        F.lit(0).alias("_side"),
        payload.alias("_r"),
    )
    left_fields = [c for c in left.columns]
    l = left.select(
        *on,
        F.col(left_ts).alias("_evt_ts"),
        F.lit(1).alias("_side"),
        F.lit(None).cast(r.schema["_r"].dataType).alias("_r"),
        F.struct(*[F.col(c) for c in left_fields]).alias("_l"),
    )
    r = r.withColumn("_l", F.lit(None).cast(l.schema["_l"].dataType))

    unioned = l.select(*on, "_evt_ts", "_side", "_r", "_l").unionByName(
        r.select(*on, "_evt_ts", "_side", "_r", "_l")
    )
    # Right rows sort before left rows at equal timestamps (_side 0 < 1), so
    # a right row AT the left timestamp is visible — inclusive <= semantics.
    w = (
        Window.partitionBy(*on)
        .orderBy("_evt_ts", "_side")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    matched = unioned.withColumn("_match", F.last("_r", ignorenulls=True).over(w))
    out = matched.filter(F.col("_side") == 1).select(
        *[F.col("_l")[c].alias(c) for c in left_fields],
        F.col("_match")["_ts"].alias("asof_ts"),
        *[F.col("_match")[c].alias(f"asof_{c}") for c in right_cols],
    )
    return out


def range_join_buckets(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    window_seconds: int = 600,
) -> DataFrame:
    """Forward range join: pairs where ``left_ts <= right_ts <= left_ts +
    window_seconds`` and equal ``on`` keys, via a bucketized equi-join.

    The left side explodes to the two ``window_seconds``-wide epoch buckets
    its window can overlap; the right side carries its single bucket; the
    hash join on (keys, bucket) is exact after the final range filter —
    each true pair matches in exactly one bucket (the right row's own), so
    no dedup is needed.

    Output: all left columns, all right columns (suffixed ``_r`` on
    collision), plus nothing synthetic — callers project.
    """
    on = list(on)
    lb = F.floor(F.unix_timestamp(F.col(left_ts)) / window_seconds).cast("long")
    rb = F.floor(F.unix_timestamp(F.col(right_ts)) / window_seconds).cast("long")

    overlap = {c for c in right.columns if c in set(left.columns) and c not in on}
    rsel = [
        F.col(c).alias(f"{c}_r") if c in overlap else F.col(c) for c in right.columns
    ]

    l2 = left.withColumn("_bkt", F.explode(F.array(lb, lb + 1)))
    # Bucket BEFORE the collision rename: with the (default) shared timestamp
    # name, selecting the renamed columns first would leave ``rb``'s
    # F.col(right_ts) unresolvable.
    r2 = right.withColumn("_bkt", rb).select(*rsel, F.col("_bkt"))

    rts = f"{right_ts}_r" if right_ts in overlap else right_ts
    # Full-precision bound (epoch-floor comparison would admit rows up to
    # 1s past the window edge).
    cond = (F.col(rts) >= F.col(left_ts)) & (
        F.col(rts) <= F.col(left_ts) + F.expr(f"INTERVAL {window_seconds} SECONDS")
    )
    return l2.join(r2, on + ["_bkt"]).filter(cond).drop("_bkt")
