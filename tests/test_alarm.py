"""Alarm-semantics unit tests on hand fixtures (FIXTURES.md section 7,
reference semantics KinesisHealthCheckStack.java:165-183)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql.types import (
    DoubleType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from amazon_kinesis_data_streams_health_check_spark.operators.alarm import (
    alarm_pipeline,
    transitions_only,
)

SCHEMA = StructType(
    [
        StructField("ts", TimestampType()),
        StructField("stream_name", StringType()),
        StructField("value", DoubleType()),
    ]
)

T0 = dt.datetime(2022, 10, 17, 10, 0, 0)


def _m(minute: int, value: float, stream: str = "s", second: int = 30):
    return (T0 + dt.timedelta(minutes=minute, seconds=second), stream, value)


def _alerts(spark, rows, **kw):
    df = spark.createDataFrame(rows, SCHEMA)
    return {
        (r.stream_name, r.window_start.minute): r
        for r in alarm_pipeline(df, **kw).collect()
    }


def test_metric_gap_breaches(spark):
    # FIXTURES.md edge 4: datapoints at t0, t0+1m, t0+3m — the t0+2m hole
    # must surface as ALARM (TreatMissingData.BREACHING,
    # KinesisHealthCheckStack.java:179).
    out = _alerts(spark, [_m(0, 0.5), _m(1, 0.5), _m(3, 0.5)])
    assert len(out) == 4
    assert out[("s", 2)].state == "ALARM"
    assert out[("s", 2)].max_lag is None
    assert out[("s", 2)].n_datapoints == 0
    for m in (0, 1, 3):
        assert out[("s", m)].state == "OK"


def test_threshold_is_strictly_greater(spark):
    # FIXTURES.md edge 5: exactly 1.0 -> OK (GREATER_THAN_THRESHOLD,
    # KinesisHealthCheckStack.java:175,177); 1.01 -> ALARM.
    out = _alerts(spark, [_m(0, 1.0), _m(1, 1.01)])
    assert out[("s", 0)].state == "OK"
    assert out[("s", 1)].state == "ALARM"


def test_flap_two_transitions(spark):
    # FIXTURES.md edge 6: OK, ALARM, ALARM, OK -> exactly two transitions.
    rows = [_m(0, 0.5), _m(1, 5.0), _m(2, 5.0), _m(3, 0.5)]
    df_alerts = _alerts(spark, rows)
    trans = [k for k, r in df_alerts.items() if r.transitioned]
    assert sorted(trans) == [("s", 1), ("s", 3)]


def test_max_statistic_over_window(spark):
    # Two datapoints in one period: max wins (statistic("max"),
    # KinesisHealthCheckStack.java:169-170).
    out = _alerts(spark, [_m(0, 0.2, second=10), _m(0, 3.0, second=50)])
    assert out[("s", 0)].max_lag == 3.0
    assert out[("s", 0)].n_datapoints == 2
    assert out[("s", 0)].state == "ALARM"


def test_n_of_m_evaluation(spark):
    # A3 generalized: 2-of-3 — a single breach among 3 trailing periods is
    # not enough; two are.
    rows = [_m(0, 5.0), _m(1, 0.5), _m(2, 5.0), _m(3, 5.0)]
    out = _alerts(spark, rows, evaluation_periods=3, datapoints_to_alarm=2)
    assert out[("s", 0)].state == "OK"  # 1 breach of trailing [w0]
    assert out[("s", 1)].state == "OK"  # 1 breach of trailing [w0,w1]
    assert out[("s", 2)].state == "ALARM"  # w0,w2 breach => 2 of 3
    assert out[("s", 3)].state == "ALARM"  # w2,w3 breach


def test_treat_missing_not_breaching(spark):
    out = _alerts(
        spark, [_m(0, 0.5), _m(2, 0.5)], treat_missing="notBreaching"
    )
    assert out[("s", 1)].state == "OK"


def test_treat_missing_ignore_holds_state(spark):
    # Missing period inherits the previous resolved state.
    out = _alerts(
        spark, [_m(0, 5.0), _m(2, 0.5)], treat_missing="ignore"
    )
    assert out[("s", 0)].state == "ALARM"
    assert out[("s", 1)].state == "ALARM"  # held
    assert out[("s", 2)].state == "OK"


def test_treat_missing_missing_is_insufficient(spark):
    out = _alerts(
        spark, [_m(0, 0.5), _m(2, 0.5)], treat_missing="missing"
    )
    assert out[("s", 1)].state == "INSUFFICIENT_DATA"


def test_per_stream_isolation(spark):
    # Dimension grouping (A2): stream `a` breaching must not alarm stream `b`.
    out = _alerts(spark, [_m(0, 5.0, "a"), _m(0, 0.5, "b"), _m(1, 5.0, "a"), _m(1, 0.5, "b")])
    assert out[("a", 0)].state == "ALARM"
    assert out[("b", 0)].state == "OK"


def test_transitions_only_filter(spark):
    rows = [_m(0, 0.5), _m(1, 5.0), _m(2, 5.0)]
    df = spark.createDataFrame(rows, SCHEMA)
    alerts = alarm_pipeline(df)
    assert transitions_only(alerts).count() == 1


def test_null_key_rows_keep_a_grid_row(spark):
    # Round-9 ADVICE: collect_set(key) silently dropped NULL dimension keys
    # from the period grid, where the pre-round-9 distinct() kept them (a
    # NULL-key stream gets all-missing-period rows -> ALARM under
    # treat_missing='breaching' because the grid join never matches NULL).
    # The struct-wrapped key set restores that behavior.
    out = _alerts(spark, [_m(0, 0.5), _m(1, 0.5), _m(0, 9.9, None)])
    # NULL-key rows surface as their own grid key with NULL max_lag
    # (the equi-join cannot match NULL), evaluated as missing-breaching.
    assert (None, 0) in out and (None, 1) in out
    assert out[(None, 0)].state == "ALARM"
    assert out[(None, 0)].max_lag is None
    assert out[("s", 0)].state == "OK"
