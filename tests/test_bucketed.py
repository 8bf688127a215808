"""Bucketed co-located join: the write-once-shuffle-never contract, asserted
on the physical plan (no shuffle Exchange on either join side)."""

from __future__ import annotations

import contextlib
import io

import pytest
from pyspark.sql import functions as F

from amazon_kinesis_data_streams_health_check_spark.sources.bucketed import (
    co_located_join,
    write_bucketed,
)
from amazon_kinesis_data_streams_health_check_spark.sources.tables import load_table


def _plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain()
    return buf.getvalue()


@pytest.fixture()
def no_broadcast(spark):
    # Force the non-broadcast path so assertions are about bucketing, not
    # about tiny test tables fitting in a broadcast.
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    yield
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_bucketed_join_has_no_shuffle(spark, sf_small, no_broadcast):
    orders = load_table(spark, sf_small, "orders").withColumnRenamed(
        "o_orderkey", "orderkey"
    )
    lineitem = load_table(spark, sf_small, "lineitem").withColumnRenamed(
        "l_orderkey", "orderkey"
    )
    write_bucketed(orders, "orders_b", ["orderkey"], 8, sort_cols=["orderkey"])
    write_bucketed(lineitem, "lineitem_b", ["orderkey"], 8, sort_cols=["orderkey"])
    try:
        joined = co_located_join(spark, "orders_b", "lineitem_b", on=["orderkey"])
        plan = _plan(joined)
        assert "SortMergeJoin" in plan
        # Bucketed scans feed the join directly: no shuffle exchange anywhere.
        assert "Exchange hashpartitioning" not in plan
        assert joined.count() == lineitem.count()  # every lineitem has its order
    finally:
        spark.sql("DROP TABLE IF EXISTS orders_b")
        spark.sql("DROP TABLE IF EXISTS lineitem_b")


def test_unbucketed_join_does_shuffle(spark, sf_small, no_broadcast):
    # Control: the same join over plain parquet reads requires exchanges.
    orders = load_table(spark, sf_small, "orders")
    lineitem = load_table(spark, sf_small, "lineitem")
    plan = _plan(orders.join(lineitem, F.col("o_orderkey") == F.col("l_orderkey")))
    assert "Exchange hashpartitioning" in plan


def test_snapshot_publish_bucketed_join_has_no_shuffle(spark, tmp_path, no_broadcast):
    """Lake + layout composition (join axis): two snapshot-lake tables
    published as same-bucket-count catalog tables join with zero exchange."""
    from amazon_kinesis_data_streams_health_check_spark.sources.bucketed import (
        snapshot_as_bucketed_table,
    )
    from amazon_kinesis_data_streams_health_check_spark.sources.snapshots import (
        snapshot_overwrite,
    )

    left = spark.range(0, 2000).select(
        F.col("id").alias("key"),
        F.to_date(F.lit("2024-01-01")).alias("metric_date"),
        (F.col("id") * 2).alias("lv"),
    )
    right = spark.range(0, 6000).select(
        (F.col("id") % 2000).alias("key"),
        F.to_date(F.lit("2024-01-01")).alias("metric_date"),
        (F.col("id") * 3).alias("rv"),
    )
    lpath, rpath = str(tmp_path / "lsnap"), str(tmp_path / "rsnap")
    snapshot_overwrite(spark, left, lpath)
    snapshot_overwrite(spark, right, rpath)
    snapshot_as_bucketed_table(spark, lpath, "lsnap_b", ["key"], 8, sort_cols=["key"])
    snapshot_as_bucketed_table(spark, rpath, "rsnap_b", ["key"], 8, sort_cols=["key"])
    try:
        joined = co_located_join(spark, "lsnap_b", "rsnap_b", on=["key"])
        plan = _plan(joined)
        assert "SortMergeJoin" in plan
        assert "Exchange hashpartitioning" not in plan
        assert joined.count() == 6000
    finally:
        spark.sql("DROP TABLE IF EXISTS lsnap_b")
        spark.sql("DROP TABLE IF EXISTS rsnap_b")


def test_clustered_snapshot_zone_maps_prune_and_stay_exact(spark, tmp_path):
    """Lake + layout composition (scan axis): a range-clustered snapshot
    commit yields near-disjoint manifest zone maps, so a cluster-key range
    read skips most files while returning exactly the full-scan result."""
    from amazon_kinesis_data_streams_health_check_spark.sources.layout import (
        overlap_count,
    )
    from amazon_kinesis_data_streams_health_check_spark.sources.snapshots import (
        read_snapshot,
        read_snapshot_pruned,
        snapshot_overwrite_clustered,
    )

    df = spark.range(0, 20000).select(
        F.col("id").alias("key"),
        F.to_date(F.lit("2024-01-01")).alias("metric_date"),
        (F.col("id") % 97).alias("v"),
    )
    path = str(tmp_path / "csnap")
    snapshot_overwrite_clustered(
        spark, df, path, cluster_cols=["key"], num_files=10
    )
    pruned, io_stats = read_snapshot_pruned(spark, path, "key", 3000, 4999)
    assert io_stats["files_total"] >= 8
    # Disjoint key slices: the 2k-row range lives in ~1-2 of ~10 files.
    assert io_stats["files_read"] <= max(2, io_stats["files_total"] // 3)
    full = read_snapshot(spark, path).filter(F.col("key").between(3000, 4999))
    assert pruned.count() == 2000
    assert {r.key for r in pruned.collect()} == {r.key for r in full.collect()}
    # Zone-map quality measured from the manifest itself: file key ranges
    # overlap (near-)zero times, the property pruning depends on.
    from amazon_kinesis_data_streams_health_check_spark.sources.snapshots import (
        snapshot_history,
    )

    stats = snapshot_history(spark, path)[0]["stats"]
    report = sorted(
        (rel, s["key"][0], s["key"][1]) for rel, s in stats.items() if "key" in s
    )
    report = sorted(report, key=lambda t: t[1])
    assert overlap_count(report) <= 1
