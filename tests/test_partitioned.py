"""Date-partitioned metrics sink: partition pruning asserted on the plan,
dynamic-overwrite idempotence, and the K3 alerts foreachBatch leg."""

from __future__ import annotations

import contextlib
import io
import json

from pyspark.sql import functions as F

from amazon_kinesis_data_streams_health_check_spark.sources.partitioned import (
    read_metrics_range,
    write_metrics_partitioned,
)


def _metrics(spark, day: int, value: float):
    return spark.createDataFrame(
        [(f"2024-03-{day:02d} 12:00:00", "ns", "m", "s1", value)],
        "ts string, namespace string, metric_name string, stream_name string, value double",
    ).withColumn("ts", F.to_timestamp("ts"))


def test_partition_pruning_and_dynamic_overwrite(spark, tmp_path):
    path = str(tmp_path / "metrics")
    for day in (1, 2, 3):
        write_metrics_partitioned(_metrics(spark, day, 1.0), path)

    ranged = read_metrics_range(spark, path, "2024-03-02", "2024-03-03")
    assert ranged.count() == 2

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        ranged.explain("formatted")
    plan = buf.getvalue()
    # The date predicates prune partitions at listing time, not via parquet
    # row-group filters.
    assert "PartitionFilters" in plan
    pf_line = next(l for l in plan.splitlines() if "PartitionFilters" in l)
    assert "metric_date" in pf_line

    # Dynamic overwrite replaces exactly the touched day.
    write_metrics_partitioned(_metrics(spark, 2, 9.0), path, mode="overwrite")
    after = {
        (str(r.metric_date), r.value)
        for r in spark.read.parquet(path).select("metric_date", "value").collect()
    }
    assert after == {("2024-03-01", 1.0), ("2024-03-02", 9.0), ("2024-03-03", 1.0)}


def test_alerts_foreach_batch_sink(spark, tmp_path):
    """K3: only transition rows reach the alerts table."""
    from amazon_kinesis_data_streams_health_check_spark.streaming.pipeline import (
        alerts_foreach_batch_sink,
    )

    src = tmp_path / "alerts_src"
    src.mkdir()
    rows = [
        {"stream_name": "s", "window_start": "2024-01-01T00:00:00Z", "state": "ALARM",
         "prev_state": "OK", "transitioned": True},
        {"stream_name": "s", "window_start": "2024-01-01T00:01:00Z", "state": "ALARM",
         "prev_state": "ALARM", "transitioned": False},
    ]
    (src / "b.json").write_text("\n".join(json.dumps(r) for r in rows))
    stream = spark.readStream.schema(
        "stream_name string, window_start timestamp, state string, "
        "prev_state string, transitioned boolean"
    ).json(str(src))
    out = str(tmp_path / "alerts")
    q = alerts_foreach_batch_sink(stream, out, str(tmp_path / "ckpt"))
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    alerts = spark.read.parquet(out).collect()
    assert len(alerts) == 1
    assert alerts[0].state == "ALARM" and alerts[0].prev_state == "OK"


def test_merge_upsert_latest_wins_and_partition_scoped(spark, tmp_path):
    """MERGE contract: per-key latest version wins, incoming wins version
    ties, untouched partitions are not rewritten."""
    import os
    import pyspark.sql.functions as F

    from amazon_kinesis_data_streams_health_check_spark.sources.partitioned import (
        merge_upsert_partitioned,
    )

    path = str(tmp_path / "lake")
    base = spark.createDataFrame(
        [
            ("k1", "2024-01-01 10:00:00", 1, "v1-old"),
            ("k2", "2024-01-01 11:00:00", 1, "keep-me"),
            ("k3", "2024-01-02 10:00:00", 1, "other-day"),
        ],
        "key string, ts string, version int, payload string",
    ).withColumn("ts", F.to_timestamp("ts"))
    merge_upsert_partitioned(spark, base, path, ["key"], "version")

    day2_files = set(os.listdir(os.path.join(path, "metric_date=2024-01-02")))

    updates = spark.createDataFrame(
        [
            ("k1", "2024-01-01 10:00:00", 2, "v2-new"),   # higher version wins
            ("k2", "2024-01-01 11:00:00", 0, "stale"),    # lower version loses
            ("k4", "2024-01-01 12:00:00", 1, "insert"),   # brand-new key
        ],
        "key string, ts string, version int, payload string",
    ).withColumn("ts", F.to_timestamp("ts"))
    merge_upsert_partitioned(spark, updates, path, ["key"], "version")

    got = {r.key: (r.version, r.payload) for r in spark.read.parquet(path).collect()}
    assert got == {
        "k1": (2, "v2-new"),
        "k2": (1, "keep-me"),
        "k3": (1, "other-day"),
        "k4": (1, "insert"),
    }
    # Day-2 partition untouched by a day-1-only batch: same files on disk.
    assert set(os.listdir(os.path.join(path, "metric_date=2024-01-02"))) == day2_files

    # Idempotence: re-running the same batch changes nothing.
    merge_upsert_partitioned(spark, updates, path, ["key"], "version")
    again = {r.key: (r.version, r.payload) for r in spark.read.parquet(path).collect()}
    assert again == got


def test_merge_upsert_key_moving_partitions_retires_stale_row(spark, tmp_path):
    """An update that carries a key to a NEW date must retire the stored row
    in its old partition (r01 advice: it silently survived), including when
    the old partition empties entirely."""
    import os
    import pyspark.sql.functions as F

    from amazon_kinesis_data_streams_health_check_spark.sources.partitioned import (
        merge_upsert_partitioned,
    )

    path = str(tmp_path / "lake")
    base = spark.createDataFrame(
        [
            ("k1", "2024-01-01 10:00:00", 1, "old-day1"),
            ("k2", "2024-01-02 10:00:00", 1, "day2"),
        ],
        "key string, ts string, version int, payload string",
    ).withColumn("ts", F.to_timestamp("ts"))
    merge_upsert_partitioned(spark, base, path, ["key"], "version")

    # k1 moves 01-01 -> 01-03; 01-01 becomes empty and must disappear.
    updates = spark.createDataFrame(
        [("k1", "2024-01-03 09:00:00", 2, "new-day3")],
        "key string, ts string, version int, payload string",
    ).withColumn("ts", F.to_timestamp("ts"))
    merge_upsert_partitioned(spark, updates, path, ["key"], "version")

    rows = spark.read.parquet(path).collect()
    got = {(r.key, str(r.metric_date), r.version, r.payload) for r in rows}
    assert got == {
        ("k1", "2024-01-03", 2, "new-day3"),
        ("k2", "2024-01-02", 1, "day2"),
    }
    assert not os.path.exists(os.path.join(path, "metric_date=2024-01-01"))

    # Stale (lower-version) cross-partition update must NOT move the row.
    stale = spark.createDataFrame(
        [("k2", "2024-01-05 09:00:00", 0, "stale-move")],
        "key string, ts string, version int, payload string",
    ).withColumn("ts", F.to_timestamp("ts"))
    merge_upsert_partitioned(spark, stale, path, ["key"], "version")
    after = {(r.key, str(r.metric_date), r.version) for r in spark.read.parquet(path).collect()}
    assert ("k2", "2024-01-02", 1) in after and len(after) == 2
