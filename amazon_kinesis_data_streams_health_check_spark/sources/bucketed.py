"""Bucketed-table storage: shuffle-free co-located joins.

At 100 TB the orders<->lineitem class of join is the dominant exchange: both
sides shuffle on the join key every query. Bucketing pays that shuffle ONCE
at write time — both tables are hash-partitioned into the same number of
buckets on the join key, so every later equi-join (and aggregation on the
key) reads co-located buckets and skips the exchange entirely; ``sortBy``
additionally pre-sorts bucket files so sort-merge joins skip the sort.

This is Spark's native bucketing (``DataFrameWriter.bucketBy`` +
``saveAsTable``); reads require ``spark.sql.sources.bucketing.enabled``
(default true) and matching bucket counts on both sides.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: Sequence[str],
    num_buckets: int = 32,
    sort_cols: Sequence[str] | None = None,
) -> None:
    """Persist ``df`` as a bucketed (optionally bucket-sorted) parquet table
    in the session catalog's warehouse."""
    writer = (
        df.write.format("parquet")
        .mode("overwrite")
        .bucketBy(num_buckets, *bucket_cols)
    )
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table)


def co_located_join(
    spark: SparkSession, left_table: str, right_table: str, on: Sequence[str]
) -> DataFrame:
    """Equi-join two same-bucket-count tables on their bucket key: the plan
    contains no shuffle Exchange on either side."""
    return spark.table(left_table).join(spark.table(right_table), list(on))


def snapshot_as_bucketed_table(
    spark: SparkSession,
    path: str,
    table: str,
    bucket_cols: Sequence[str],
    num_buckets: int = 32,
    sort_cols: Sequence[str] | None = None,
    version: int | None = None,
) -> None:
    """Publish a snapshot-lake version (sources/snapshots.py) into the
    catalog as a bucketed table — the lake + layout composition for the
    JOIN axis.

    The snapshot lake optimizes for isolation/time travel (explicit file
    lists); Spark's native bucketing needs catalog metadata the manifest
    cannot carry. Publishing is an explicit one-shuffle materialization:
    every subsequent equi-join or keyed aggregation between same-bucketed
    publishes runs with NO exchange. At 100 TB this is the serving-layout
    step a warehouse runs after ingest compaction — pay the hash shuffle
    once per published version, never again per query.
    """
    from amazon_kinesis_data_streams_health_check_spark.sources.snapshots import (
        read_snapshot,
    )

    write_bucketed(
        read_snapshot(spark, path, version=version),
        table,
        bucket_cols,
        num_buckets=num_buckets,
        sort_cols=sort_cols,
    )
