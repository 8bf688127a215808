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


def merge_upsert_partitioned(
    spark: SparkSession,
    updates: DataFrame,
    path: str,
    key_cols: list[str],
    version_col: str,
    partition_col: str = "metric_date",
) -> None:
    """Delta-style MERGE (latest-wins upsert by key) on a plain parquet lake.

    Partition-scoped read-merge-rewrite:

    1. prune the existing table to ONLY the partitions the update batch
       touches (collect of the batch's distinct partition values — a handful
       of dates, never data rows);
    2. union + per-key latest-wins (max ``version_col``, deterministic
       tiebreak on current-vs-incoming) via one window;
    3. dynamic-partition-overwrite exactly those partitions.

    Cost scales with the touched partitions, not the table — the same
    contract a Delta/Iceberg MERGE gives, minus the transaction log (single
    writer assumed; the streaming checkpoint provides the idempotence story
    end-to-end). Re-running the same batch is a no-op by construction.
    """
    from pyspark.sql import Window

    updates = updates.withColumn(partition_col, F.to_date("ts"))
    try:
        existing = spark.read.parquet(path)
    except Exception:  # first write: nothing to merge
        updates.write.mode("overwrite").option(
            "partitionOverwriteMode", "dynamic"
        ).partitionBy(partition_col).parquet(path)
        return
    touched = [r[0] for r in updates.select(partition_col).distinct().collect()]
    current = existing.filter(F.col(partition_col).isin(touched)).withColumn(
        "_is_new", F.lit(0)
    )
    merged = current.unionByName(updates.withColumn("_is_new", F.lit(1)))
    w = Window.partitionBy(*key_cols).orderBy(
        F.desc(version_col), F.desc("_is_new")
    )
    resolved = (
        merged.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn", "_is_new")
    )
    resolved.write.mode("overwrite").option(
        "partitionOverwriteMode", "dynamic"
    ).partitionBy(partition_col).parquet(path)


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
