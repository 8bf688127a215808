"""Date-partitioned lakehouse sink for the metrics table.

The K2 metrics stream accumulates forever; the 100 TB layout is hive-style
date partitioning so every alarm backfill / dashboard query over a time range
prunes to the touched partitions at file-listing time (``PartitionFilters``
on the scan — zero IO for untouched days). Writes use dynamic partition
overwrite so a re-run of one day replaces exactly that day.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_metrics_partitioned(metrics: DataFrame, path: str, mode: str = "append") -> None:
    """Append/overwrite metric rows as parquet partitioned by ``metric_date``.

    With ``mode='overwrite'`` only the partitions present in ``metrics`` are
    replaced (dynamic partition overwrite), which makes per-day backfills
    idempotent.
    """
    (
        metrics.withColumn("metric_date", F.to_date("ts"))
        .write.mode(mode)
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("metric_date")
        .parquet(path)
    )


def read_metrics_range(
    spark: SparkSession, path: str, start_date: str, end_date: str
) -> DataFrame:
    """Scan only the partitions inside [start_date, end_date] — the filter is
    on the partition column, so it prunes directories instead of reading
    files (verify with ``.explain``: ``PartitionFilters`` non-empty,
    ``PushedFilters`` empty for these two predicates)."""
    return spark.read.parquet(path).filter(
        (F.col("metric_date") >= F.lit(start_date))
        & (F.col("metric_date") <= F.lit(end_date))
    )
