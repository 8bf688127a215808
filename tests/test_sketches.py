"""Mergeable-sketch invariants: merge-of-parts == sketch-of-whole (exact,
both algorithms are deterministic), and estimates land inside published
error bounds vs exact answers."""

from __future__ import annotations

from pyspark.sql import functions as F

from amazon_kinesis_data_streams_health_check_spark.operators.sketches import (
    daily_sketch_rollup,
    direct_sketch,
    merge_rollup,
)
from amazon_kinesis_data_streams_health_check_spark.sources.tables import load_table


def test_merged_daily_sketches_equal_direct(spark, sf_small):
    events = load_table(spark, sf_small, "events")
    merged = {r.key: r for r in merge_rollup(daily_sketch_rollup(events)).collect()}
    direct = {r.key: r for r in direct_sketch(events).collect()}
    assert set(merged) == set(direct)
    for k in direct:
        # HLL union is order-insensitive: merge-of-parts == sketch-of-whole
        # EXACTLY (same registers). KLL compaction depends on ingest order,
        # so merged vs direct may differ within the sketch's error bound —
        # assert closeness, not identity.
        assert merged[k].est_distinct_users == direct[k].est_distinct_users, k
        rel = abs(merged[k].value_p50 - direct[k].value_p50) / max(
            abs(direct[k].value_p50), 1e-9
        )
        assert rel < 0.05, (k, merged[k].value_p50, direct[k].value_p50)


def test_hll_estimate_within_error_bounds(spark, sf_small):
    events = load_table(spark, sf_small, "events")
    est = {r.key: r.est_distinct_users
           for r in merge_rollup(daily_sketch_rollup(events)).collect()}
    exact = {
        r.key: r.exact
        for r in events.groupBy(F.col("event_type").alias("key"))
        .agg(F.count_distinct("user_id").alias("exact"))
        .collect()
    }
    for k, ex in exact.items():
        # lgK=12 => rse ~1.6%%; allow 5 sigma plus integer slack.
        assert abs(est[k] - ex) <= max(3, 0.08 * ex), (k, est[k], ex)


def test_kll_quantiles_bracket_exact_percentiles(spark, sf_small):
    events = load_table(spark, sf_small, "events")
    merged = {r.key: r for r in merge_rollup(daily_sketch_rollup(events)).collect()}
    exact = {
        r.key: r
        for r in events.groupBy(F.col("event_type").alias("key"))
        .agg(
            F.expr("percentile(value, 0.40)").alias("p40"),
            F.expr("percentile(value, 0.60)").alias("p60"),
            F.min("value").alias("lo"),
            F.max("value").alias("hi"),
        )
        .collect()
    }
    for k, r in merged.items():
        e = exact[k]
        # KLL default k: p50 within the exact p40..p60 envelope; p99 <= max.
        assert e.p40 <= r.value_p50 <= e.p60, (k, r.value_p50, e.p40, e.p60)
        assert e.lo <= r.value_p99 <= e.hi


def test_rollup_row_counts_partition_correctly(spark, sf_small):
    events = load_table(spark, sf_small, "events")
    daily = daily_sketch_rollup(events)
    assert daily.agg(F.sum("n_rows")).collect()[0][0] == events.count()
