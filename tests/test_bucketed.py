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
