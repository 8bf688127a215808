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


def zorder_key(
    df: DataFrame, cols: list[str], bits: int = 16, key_col: str = "_zkey"
) -> DataFrame:
    """Add a Z-order (Morton) key: per-column min-max rank scaled to
    ``bits`` bits, then bit-interleaved across columns.

    Lexicographic range clustering only prunes predicates on the LEADING
    column; the Morton curve keeps locality in every dimension, so a range
    predicate on ANY of ``cols`` maps to a bounded set of key ranges — the
    property behind Delta/Iceberg OPTIMIZE ZORDER. All arithmetic is
    integer expressions inside codegen; the per-column min/max is one tiny
    aggregate broadcast back (at 100 TB: a metadata-only pass when footers
    are available).
    """
    aggs = []
    for c in cols:
        aggs += [F.min(c).alias(f"_mn_{c}"), F.max(c).alias(f"_mx_{c}")]
    bounds = df.agg(*aggs)
    out = df.crossJoin(F.broadcast(bounds))
    scaled = []
    for c in cols:
        span = F.col(f"_mx_{c}").cast("double") - F.col(f"_mn_{c}").cast("double")
        frac = F.when(span > 0, (F.col(c).cast("double") - F.col(f"_mn_{c}")) / span).otherwise(
            F.lit(0.0)
        )
        scaled.append(F.floor(frac * ((1 << bits) - 1)).cast("long"))
    z = F.lit(0).cast("long")
    n = len(cols)
    for b in range(bits):
        for i, s in enumerate(scaled):
            z = z + F.shiftleft(
                F.shiftright(s, b).bitwiseAND(F.lit(1)), b * n + i
            )
    return out.withColumn(key_col, z).drop(
        *[f"_mn_{c}" for c in cols], *[f"_mx_{c}" for c in cols]
    )


def write_zordered(
    df: DataFrame,
    path: str,
    cluster_cols: list[str],
    num_files: int | None = None,
    bits: int = 16,
) -> None:
    """Write parquet Z-order-clustered on ``cluster_cols``: range-partition
    and sort by the Morton key, so every file owns a compact curve segment
    and its footer min/max for EACH cluster column is tight — multi-column
    zone-map pruning from one layout."""
    keyed = zorder_key(df, cluster_cols, bits=bits)
    n = num_files or df.sparkSession.sparkContext.defaultParallelism
    (
        keyed.repartitionByRange(n, F.col("_zkey"))
        .sortWithinPartitions("_zkey")
        .drop("_zkey")
        .write.mode("overwrite")
        .parquet(path)
    )
