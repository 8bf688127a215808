"""Clustered-layout invariants, measured from parquet footers (pyarrow),
not inferred from plans: range clustering must yield (near-)disjoint
per-file key ranges — the property file-skipping depends on at 100 TB."""

from __future__ import annotations

from pyspark.sql import functions as F

from amazon_kinesis_data_streams_health_check_spark.sources.layout import (
    clustering_report,
    overlap_count,
    write_clustered,
)
from amazon_kinesis_data_streams_health_check_spark.sources.tables import load_table


def test_clustered_write_has_disjoint_file_ranges(spark, sf_small, tmp_path):
    events = load_table(spark, sf_small, "events").select("event_id", "user_id", "value")
    clustered = str(tmp_path / "clustered")
    write_clustered(events, clustered, ["user_id"], num_files=8)

    rep = clustering_report(clustered, "user_id")
    assert len(rep) >= 4  # really produced a multi-file layout
    # Range partitioner boundaries may duplicate a single boundary key at
    # file edges; allow adjacent-pair touching but nothing worse.
    assert overlap_count(rep) <= len(rep) - 1, rep

    # Contrast: a round-robin layout of the same data overlaps massively.
    messy = str(tmp_path / "messy")
    events.repartition(8).write.mode("overwrite").parquet(messy)
    messy_rep = clustering_report(messy, "user_id")
    assert overlap_count(messy_rep) > overlap_count(rep)
    # Every file spans ~the whole key range in the messy layout.
    assert overlap_count(messy_rep) >= len(messy_rep) * (len(messy_rep) - 1) // 2 - 1


def test_clustered_scan_prunes_files(spark, sf_small, tmp_path):
    """A tight key filter over the clustered layout must plan fewer scanned
    files than the layout holds (static pruning via footer stats shows up in
    the scan's 'number of files read' metric after execution)."""
    events = load_table(spark, sf_small, "events").select("event_id", "user_id", "value")
    clustered = str(tmp_path / "clustered")
    write_clustered(events, clustered, ["user_id"], num_files=8)

    lo = events.agg(F.min("user_id")).collect()[0][0]
    df = spark.read.parquet(clustered).filter(F.col("user_id") == lo)
    rows = df.collect()
    assert len(rows) >= 1
    # The pushed filter reaches the scan...
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    assert "PushedFilters" in plan and "user_id" in plan.split("PushedFilters")[1][:200]
    # ...and row-group stats keep the result exact (sanity on values).
    assert all(r.user_id == lo for r in rows)


def test_zorder_prunes_on_every_cluster_column(spark, tmp_path):
    """Z-order vs lexicographic: a range predicate on the SECOND cluster
    column prunes files under the Morton layout but touches (nearly) every
    file under leading-column range clustering — the multi-dimensional
    locality claim, measured from parquet footers."""
    from amazon_kinesis_data_streams_health_check_spark.sources.layout import (
        write_zordered,
    )

    n = 64
    grid = spark.range(0, n * n).select(
        (F.col("id") % n).alias("x"),
        (F.col("id") / n).cast("long").alias("y"),
        F.col("id").alias("payload"),
    )

    def touching(path: str, col: str, lo: int, hi: int) -> tuple[int, int]:
        rep = clustering_report(path, col)
        hit = sum(1 for _, mn, mx in rep if not (mx < lo or mn > hi))
        return hit, len(rep)

    linear = str(tmp_path / "linear")
    write_clustered(grid, linear, ["x", "y"], num_files=16)
    zord = str(tmp_path / "zorder")
    write_zordered(grid, zord, ["x", "y"], num_files=16)

    lo, hi = 4, 11  # a y-slab covering 1/8 of the domain
    lin_hit, lin_total = touching(linear, "y", lo, hi)
    z_hit, z_total = touching(zord, "y", lo, hi)
    assert lin_total >= 12 and z_total >= 12
    # Leading-column clustering can't skip on y; the Morton curve can.
    assert lin_hit == lin_total, (lin_hit, lin_total)
    assert z_hit <= z_total // 2, (z_hit, z_total)
    # And the x axis still prunes under z-order too.
    zx_hit, zx_total = touching(zord, "x", lo, hi)
    assert zx_hit <= zx_total // 2, (zx_hit, zx_total)
    # Layout changes bytes placement, never results.
    zdf = spark.read.parquet(zord).filter(F.col("y").between(lo, hi))
    assert zdf.count() == n * (hi - lo + 1)
