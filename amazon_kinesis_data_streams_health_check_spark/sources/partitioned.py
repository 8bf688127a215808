"""Date-partitioned lakehouse sink for the metrics table.

The K2 metrics stream accumulates forever; the 100 TB layout is hive-style
date partitioning so every alarm backfill / dashboard query over a time range
prunes to the touched partitions at file-listing time (``PartitionFilters``
on the scan — zero IO for untouched days). Writes use dynamic partition
overwrite so a re-run of one day replaces exactly that day.
"""

from __future__ import annotations

import urllib.parse

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

    1. find the touched partitions: the update batch's own partition values
       UNION the partitions of existing rows whose keys the batch updates —
       an update that moves a key to a new ``to_date(ts)`` must retire the
       stored row in its OLD partition, or the lake silently keeps two rows
       per key (r01 advice). The key probe is one semi-join of the table
       against the (small, broadcast) distinct update keys — the same
       source-matches-target lookup a real Delta/Iceberg MERGE performs,
       where file-level key stats would prune it further;
    2. union the touched slice with the updates + per-key latest-wins (max
       ``version_col``, deterministic tiebreak on current-vs-incoming) via
       one window;
    3. dynamic-partition-overwrite the touched partitions; a touched
       partition whose rows ALL migrated elsewhere has no output rows for
       the dynamic overwrite to replace, so it is deleted explicitly.

    Only the collected partition VALUES (a handful of dates) and the final
    resolved rows of touched partitions move through the driver/shuffle —
    never untouched data. Re-running the same batch is a no-op by
    construction.
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
    upd_keys = updates.select(*key_cols).distinct()
    touched_df = (
        updates.select(partition_col)
        .unionByName(
            existing.join(F.broadcast(upd_keys), key_cols, "leftsemi").select(
                partition_col
            )
        )
        .distinct()
    )
    touched = [r[0] for r in touched_df.collect()]
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
    ).localCheckpoint(eager=True)  # the writes below must not re-read `path` mid-rewrite
    kept = {r[0] for r in resolved.select(partition_col).distinct().collect()}
    # Partitions emptied by key migration: no output rows => dynamic
    # overwrite will leave them behind; resolve their ON-DISK directory
    # names now (file-metadata column — Spark escapes special characters in
    # partition paths, so hand-formatting f"{col}={value}" would miss them)
    # while the files still exist, and drop the directories after the write.
    emptied = [v for v in touched if v not in kept]
    emptied_dirs = (
        [
            urllib.parse.unquote(r[0])
            for r in existing.withColumn(
                "_pdir",
                F.element_at(F.split(F.col("_metadata.file_path"), "/"), -2),
            )
            .filter(F.col(partition_col).isin(emptied))
            .select("_pdir")
            .distinct()
            .collect()
        ]
        if emptied
        else []
    )
    resolved.write.mode("overwrite").option(
        "partitionOverwriteMode", "dynamic"
    ).partitionBy(partition_col).parquet(path)
    jvm = spark._jvm
    hconf = spark._jsc.hadoopConfiguration()
    for d in emptied_dirs:
        p = jvm.org.apache.hadoop.fs.Path(f"{path}/{d}")
        fs = p.getFileSystem(hconf)
        fs.delete(p, True)


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
