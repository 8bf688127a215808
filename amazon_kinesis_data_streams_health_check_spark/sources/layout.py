"""Cluster-ordered lake layout: range partitioning + in-file sort so parquet
row-group statistics actually prune.

At 100 TB the cheapest query is the one that never reads the bytes: a filter
on the cluster key skips whole files via footer min/max before any IO, and
skips row groups inside the files it does open. That only happens if the
writer LAYS OUT data so key ranges are disjoint across files —
``repartitionByRange`` (global range exchange) + ``sortWithinPartitions``
(row-group-level order) is the Spark-native way to get there (the same
mechanism a Delta OPTIMIZE ZORDER approximates for multi-key cases).

``clustering_report`` measures the result from the parquet footers (via
pyarrow) instead of trusting the plan: per-file min/max of the cluster key
and the overlap count between files. Tests assert near-disjointness — the
property pruning depends on.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, functions as F


def write_clustered(
    df: DataFrame,
    path: str,
    cluster_cols: list[str],
    num_files: int | None = None,
) -> None:
    """Write parquet range-clustered on ``cluster_cols``.

    ``repartitionByRange`` samples the key distribution and assigns disjoint
    key ranges to output partitions (one file each); the within-partition
    sort orders pages/row-groups inside the file so even partial-file reads
    prune. Skew in the key is absorbed by the range sampler, not by hand
    tuning.
    """
    cols = [F.col(c) for c in cluster_cols]
    n = num_files or df.sparkSession.sparkContext.defaultParallelism
    (
        df.repartitionByRange(n, *cols)
        .sortWithinPartitions(*cols)
        .write.mode("overwrite")
        .parquet(path)
    )


def clustering_report(path: str, column: str) -> list[tuple[str, object, object]]:
    """Read per-file (min, max) of ``column`` straight from parquet footers.

    Returns [(file, min, max)] sorted by min — ground truth for how well the
    layout prunes (no Spark session involved; this is what the scanner's
    file-skipping sees).
    """
    import pyarrow.parquet as pq

    out = []
    for name in sorted(os.listdir(path)):
        if not name.endswith(".parquet"):
            continue
        md = pq.ParquetFile(os.path.join(path, name)).metadata
        schema_idx = md.schema.to_arrow_schema().get_field_index(column)
        mins, maxs = [], []
        for rg in range(md.num_row_groups):
            stats = md.row_group(rg).column(schema_idx).statistics
            if stats is not None and stats.has_min_max:
                mins.append(stats.min)
                maxs.append(stats.max)
        if mins:
            out.append((name, min(mins), max(maxs)))
    return sorted(out, key=lambda t: t[1])


def overlap_count(report: list[tuple[str, object, object]]) -> int:
    """Number of file pairs whose [min, max] key ranges overlap — 0 for a
    perfectly clustered layout, O(n^2) for a random one."""
    n = 0
    for i in range(len(report)):
        for j in range(i + 1, len(report)):
            lo = max(report[i][1], report[j][1])
            hi = min(report[i][2], report[j][2])
            if lo <= hi:
                n += 1
    return n
