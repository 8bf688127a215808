"""Data-quality expectations: declarative row rules -> violation metrics.

The ingest-gate pattern (Delta Live Tables expectations, Great Expectations):
each rule is a boolean SQL predicate that every row should satisfy; one narrow
pass computes per-rule violation counts and rates, and `quarantine` splits the
frame into (clean, violating) halves without a second scan of the predicate
logic.

Scale shape: rules compile to a single projection of boolean columns folded
into one partial-aggregating `groupBy()` — no shuffle beyond the final
single-row (or per-group) merge, no UDFs. At 100 TB this is strictly
scan-bound.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def check_expectations(
    df: DataFrame, rules: dict[str, Column | str], group_by: list[str] | None = None
) -> DataFrame:
    """One row per rule (x group): rows checked, violations, violation rate.

    ``rules`` maps rule name -> boolean predicate (Column or SQL string) that
    is True for GOOD rows; NULL predicate results count as violations (a rule
    that cannot evaluate did not pass).
    """
    preds = {
        name: (F.expr(rule) if isinstance(rule, str) else rule)
        for name, rule in rules.items()
    }
    keys = group_by or []
    flags = df.select(
        *keys,
        *[
            F.coalesce(pred.cast("boolean"), F.lit(False)).alias(f"_ok_{i}")
            for i, pred in enumerate(preds.values())
        ],
    )
    agg = flags.groupBy(*keys).agg(
        F.count(F.lit(1)).alias("n_rows"),
        *[
            F.sum(F.when(F.col(f"_ok_{i}"), 0).otherwise(1))
            .cast("long")
            .alias(f"_viol_{i}")
            for i in range(len(preds))
        ],
    )
    per_rule = [
        agg.select(
            *keys,
            F.lit(name).alias("rule"),
            F.col("n_rows"),
            F.col(f"_viol_{i}").alias("n_violations"),
            F.round(F.col(f"_viol_{i}") / F.col("n_rows"), 6).alias("violation_rate"),
        )
        for i, name in enumerate(preds)
    ]
    out = per_rule[0]
    for p in per_rule[1:]:
        out = out.unionByName(p)
    return out


def quarantine(
    df: DataFrame, rules: dict[str, Column | str]
) -> tuple[DataFrame, DataFrame]:
    """Split into (clean, violating): a row is clean iff EVERY rule passes.
    Both halves are filters over the same scan — Catalyst reuses the plan;
    no aggregation, no shuffle."""
    preds = [
        F.coalesce(
            (F.expr(r) if isinstance(r, str) else r).cast("boolean"), F.lit(False)
        )
        for r in rules.values()
    ]
    all_ok = preds[0]
    for p in preds[1:]:
        all_ok = all_ok & p
    return df.filter(all_ok), df.filter(~all_ok)
