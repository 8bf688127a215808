"""Edge-case pins for the temporal join operators (asof_join,
range_join_buckets) and resize plumbing — hand-computed expectations on tiny
fixtures; the sf-scale behavior is oracle-checked via the registry."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from amazon_kinesis_data_streams_health_check_spark.operators.temporal import (
    asof_join,
    range_join_buckets,
)

UTC = dt.timezone.utc


def _ts(minute: float) -> dt.datetime:
    whole = int(minute)
    return dt.datetime(2024, 1, 1, 12, whole, int((minute - whole) * 60), tzinfo=UTC)


def test_asof_basic_and_left_outer(spark):
    left = spark.createDataFrame(
        [("u1", _ts(10), "p1"), ("u1", _ts(20), "p2"), ("u2", _ts(5), "p3")],
        "k string, ts timestamp, pid string",
    )
    right = spark.createDataFrame(
        [("u1", _ts(9), "v1"), ("u1", _ts(15), "v2"), ("u3", _ts(1), "v3")],
        "k string, ts timestamp, vid string",
    )
    out = {
        r.pid: r
        for r in asof_join(left, right, on=["k"], right_cols=["vid"]).collect()
    }
    assert out["p1"].asof_vid == "v1"  # most recent prior, not just any prior
    assert out["p2"].asof_vid == "v2"
    assert out["p3"].asof_vid is None  # left-outer: no right rows for u2
    assert out["p3"].asof_ts is None


def test_asof_equal_timestamp_is_inclusive(spark):
    left = spark.createDataFrame(
        [("u1", _ts(10), "p1")], "k string, ts timestamp, pid string"
    )
    right = spark.createDataFrame(
        [("u1", _ts(10), "v_same")], "k string, ts timestamp, vid string"
    )
    [row] = asof_join(left, right, on=["k"], right_cols=["vid"]).collect()
    assert row.asof_vid == "v_same"  # right_ts <= left_ts, not <


def test_asof_does_not_look_forward(spark):
    left = spark.createDataFrame(
        [("u1", _ts(10), "p1")], "k string, ts timestamp, pid string"
    )
    right = spark.createDataFrame(
        [("u1", _ts(11), "v_future")], "k string, ts timestamp, vid string"
    )
    [row] = asof_join(left, right, on=["k"], right_cols=["vid"]).collect()
    assert row.asof_vid is None


def test_range_join_window_boundaries(spark):
    views = spark.createDataFrame(
        [("u1", _ts(10), "v1")], "k string, vts timestamp, vid string"
    )
    purchases = spark.createDataFrame(
        [
            ("u1", _ts(10), "p_same"),       # gap 0: included
            ("u1", _ts(20), "p_edge"),       # exactly +10 min: included
            ("u1", _ts(20.5), "p_late"),     # past the window: excluded
            ("u1", _ts(9), "p_before"),      # before the view: excluded
            ("u2", _ts(11), "p_otheruser"),  # key mismatch: excluded
        ],
        "k string, pts timestamp, pid string",
    )
    out = range_join_buckets(
        views, purchases, on=["k"], left_ts="vts", right_ts="pts", window_seconds=600
    )
    pids = sorted(r.pid for r in out.collect())
    assert pids == ["p_edge", "p_same"]


def test_range_join_no_duplicate_pairs_across_buckets(spark):
    # A right row whose ts sits in the left row's second overlapped bucket
    # must still match exactly once.
    views = spark.createDataFrame(
        [("u1", _ts(9.9), "v1")], "k string, vts timestamp, vid string"
    )
    purchases = spark.createDataFrame(
        [("u1", _ts(15), "p1")], "k string, pts timestamp, pid string"
    )
    out = range_join_buckets(
        views, purchases, on=["k"], left_ts="vts", right_ts="pts", window_seconds=600
    ).collect()
    assert len(out) == 1


def test_range_join_shared_timestamp_column_name(spark):
    """The default left_ts=right_ts='ts' path: the right bucket must be
    computed before the collision rename (r01 advice: it resolved against the
    renamed column and failed with AnalysisException)."""
    left = spark.createDataFrame(
        [("u1", _ts(10), "l1")], "k string, ts timestamp, lid string"
    )
    right = spark.createDataFrame(
        [
            ("u1", _ts(12), "r_in"),
            ("u1", _ts(25), "r_out"),
        ],
        "k string, ts timestamp, rid string",
    )
    out = range_join_buckets(left, right, on=["k"], window_seconds=600)
    rows = out.collect()
    assert [r.rid for r in rows] == ["r_in"]
    # Collision rename preserved both timestamps.
    assert {"ts", "ts_r"} <= set(out.columns)


def test_resize_dims_and_bytes(spark):
    from amazon_kinesis_data_streams_health_check_spark.operators.multimodal import (
        resize_media,
    )

    media = spark.createDataFrame(
        [
            (1, "image", b"x" * 10_000, 640, 480, 0),
            (2, "image", b"y" * 10, 32, 16, 0),   # already under max_dim
            (3, "video", b"z" * 500, 640, 480, 0),  # non-image: filtered out
        ],
        "media_id long, kind string, payload binary, width long, height long, duration_ms long",
    )
    rows = {r.media_id: r for r in resize_media(media, max_dim=64).collect()}
    assert set(rows) == {1, 2}
    assert (rows[1].new_width, rows[1].new_height) == (64, 48)
    assert rows[1].n_bytes == 64 * 48
    assert len(bytes(rows[1].payload)) == 64 * 48
    assert (rows[2].new_width, rows[2].new_height) == (32, 16)
    assert rows[2].n_bytes == 10  # payload smaller than target: untouched


def test_salted_aggregation_matches_direct(spark):
    from pyspark.sql import functions as F

    from amazon_kinesis_data_streams_health_check_spark.functions.skew import (
        salted_agg,
        salted_count_distinct,
    )

    # Pathological skew: one key holds 90% of rows.
    rows = [("hot", i % 7) for i in range(900)] + [
        (f"k{i % 20}", i % 13) for i in range(100)
    ]
    df = spark.createDataFrame(rows, "k string, v int")

    direct = {
        (r.k): (r.n, r.d)
        for r in df.groupBy("k")
        .agg(F.count(F.lit(1)).alias("n"), F.countDistinct("v").alias("d"))
        .collect()
    }
    salted_counts = {
        r.k: r.n
        for r in salted_agg(
            df, ["k"], [F.count(F.lit(1)).alias("c")], [F.sum("c").alias("n")]
        ).collect()
    }
    salted_distinct = {
        r.k: r.n_distinct
        for r in salted_count_distinct(df, ["k"], "v").collect()
    }
    assert salted_counts == {k: n for k, (n, _) in direct.items()}
    assert salted_distinct == {k: d for k, (_, d) in direct.items()}
