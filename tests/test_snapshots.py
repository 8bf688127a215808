"""Snapshot-isolated lake (sources/snapshots.py): MERGE parity with the
in-place sink, time travel, as-of reads, rollback, and vacuum."""

from __future__ import annotations

import os
import time

import pytest
from pyspark.sql import functions as F

from amazon_kinesis_data_streams_health_check_spark.sources.snapshots import (
    read_snapshot,
    rollback_snapshot,
    snapshot_history,
    snapshot_merge,
    snapshot_overwrite,
    vacuum_snapshots,
)

SCHEMA = "key string, ts string, version int, payload string"


def _df(spark, rows):
    return spark.createDataFrame(rows, SCHEMA).withColumn("ts", F.to_timestamp("ts"))


def _content(df):
    return {
        (r.key, str(r.metric_date), r.version, r.payload)
        for r in df.select("key", "metric_date", "version", "payload").collect()
    }


BASE = [
    ("k1", "2024-01-01 10:00:00", 1, "old-day1"),
    ("k2", "2024-01-01 11:00:00", 1, "keep-me"),
    ("k3", "2024-01-02 10:00:00", 1, "day2"),
]
UPD1 = [
    ("k1", "2024-01-01 10:00:00", 2, "v2-new"),   # higher version wins
    ("k2", "2024-01-01 11:00:00", 0, "stale"),    # lower version loses
    ("k4", "2024-01-01 12:00:00", 1, "insert"),   # brand-new key
]
UPD2 = [
    ("k3", "2024-01-03 09:00:00", 2, "moved"),    # key migrates 01-02 -> 01-03
]


def test_snapshot_merge_matches_in_place_merge(spark, tmp_path):
    """Same update sequence through snapshot_merge and the in-place
    merge_upsert_partitioned lands on identical content."""
    from amazon_kinesis_data_streams_health_check_spark.sources.partitioned import (
        merge_upsert_partitioned,
    )

    snap, plain = str(tmp_path / "snap"), str(tmp_path / "plain")
    for batch in (BASE, UPD1, UPD2):
        snapshot_merge(spark, _df(spark, batch), snap, ["key"], "version")
        merge_upsert_partitioned(spark, _df(spark, batch), plain, ["key"], "version")
    assert _content(read_snapshot(spark, snap)) == _content(spark.read.parquet(plain))
    # The migrated-away partition is empty in the live view...
    assert ("k3", "2024-01-02", 1, "day2") not in _content(read_snapshot(spark, snap))
    # ...but v2 still serves it: nothing was deleted (snapshot isolation).
    assert ("k3", "2024-01-02", 1, "day2") in _content(
        read_snapshot(spark, snap, version=2)
    )


def test_time_travel_and_as_of(spark, tmp_path):
    path = str(tmp_path / "snap")
    v1 = snapshot_merge(spark, _df(spark, BASE), path, ["key"], "version")
    t_between = time.time()
    time.sleep(0.01)
    v2 = snapshot_merge(spark, _df(spark, UPD1), path, ["key"], "version")
    assert (v1, v2) == (1, 2)

    assert _content(read_snapshot(spark, path, version=1)) == _content(
        _df(spark, BASE).withColumn("metric_date", F.to_date("ts"))
    )
    assert _content(read_snapshot(spark, path, as_of=t_between)) == _content(
        read_snapshot(spark, path, version=1)
    )
    assert _content(read_snapshot(spark, path, as_of=time.time())) == _content(
        read_snapshot(spark, path, version=2)
    )
    hist = snapshot_history(spark, path)
    assert [m["version"] for m in hist] == [1, 2]
    assert hist[1]["parent"] == 1 and hist[1]["operation"] == "merge"


def test_rollback_is_a_new_commit(spark, tmp_path):
    path = str(tmp_path / "snap")
    snapshot_merge(spark, _df(spark, BASE), path, ["key"], "version")
    snapshot_merge(spark, _df(spark, UPD1), path, ["key"], "version")
    v3 = rollback_snapshot(spark, path, 1)
    assert v3 == 3
    assert _content(read_snapshot(spark, path)) == _content(
        read_snapshot(spark, path, version=1)
    )
    # History is append-only: v2 still readable after the rollback.
    assert ("k1", "2024-01-01", 2, "v2-new") in _content(
        read_snapshot(spark, path, version=2)
    )


def test_overwrite_then_vacuum(spark, tmp_path):
    path = str(tmp_path / "snap")
    snapshot_merge(spark, _df(spark, BASE), path, ["key"], "version")
    snapshot_merge(spark, _df(spark, UPD1), path, ["key"], "version")
    snapshot_overwrite(spark, _df(spark, UPD2), path)
    before = _content(read_snapshot(spark, path))

    # An orphan from a "crashed" write (data file, no manifest) gets cleaned.
    orphan = os.path.join(path, "data", "metric_date=2024-01-09")
    os.makedirs(orphan)
    with open(os.path.join(orphan, "part-orphan.parquet"), "w") as f:
        f.write("junk")

    deleted = vacuum_snapshots(spark, path, keep_last=1)
    assert deleted > 0
    assert not os.path.exists(os.path.join(orphan, "part-orphan.parquet"))
    assert _content(read_snapshot(spark, path)) == before
    assert [m["version"] for m in snapshot_history(spark, path)] == [3]
    with pytest.raises(FileNotFoundError, match="vacuumed"):
        read_snapshot(spark, path, version=1)


def test_reader_gets_manifest_file_list_not_directory_listing(spark, tmp_path):
    """The scan's file index must come from the manifest: after a merge, the
    data dir holds BOTH old and new files for a touched partition, but the
    live read sees exactly one row per live key (no double-reads)."""
    path = str(tmp_path / "snap")
    snapshot_merge(spark, _df(spark, BASE), path, ["key"], "version")
    snapshot_merge(spark, _df(spark, UPD1), path, ["key"], "version")
    day1 = os.path.join(path, "data", "metric_date=2024-01-01")
    parquet_files = [f for f in os.listdir(day1) if f.endswith(".parquet")]
    assert len(parquet_files) > 1  # append-only: old + rewritten files coexist
    live = read_snapshot(spark, path)
    assert live.filter(F.col("metric_date") == "2024-01-01").count() == 3  # k1 k2 k4
