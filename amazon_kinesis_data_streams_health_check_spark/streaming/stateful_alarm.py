"""W4/W6: the stateful heartbeat-timeout alarm — the one genuinely stateful
piece of streaming engineering in the pipeline (SURVEY.md section 4).

CloudWatch's ``TreatMissingData.BREACHING`` (KinesisHealthCheckStack.java:179)
fires the alarm when metrics STOP ARRIVING — a negative condition no
per-record operator can produce. Streaming form: ``applyInPandasWithState``
keyed by stream_name with a processing-time timeout approximately equal to
the alarm period; when a key's timeout expires with no new data, a synthetic
breaching row is emitted and the alarm transitions to ALARM
(state machine per KinesisHealthCheckStack.java:172-183: OK/ALARM, actions on
transition only).

State is one tiny tuple per stream key — state-store pressure is O(streams),
independent of event volume, so this scales to any input rate.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    BooleanType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

#: Output row shape (mirrors the batch alert shape, FIXTURES.md section 5,
#: with processing-time semantics).
ALARM_OUTPUT_SCHEMA = StructType(
    [
        StructField("stream_name", StringType()),
        StructField("reason", StringType()),  # 'data' | 'timeout'
        StructField("max_lag", DoubleType()),
        StructField("state", StringType()),
        StructField("prev_state", StringType()),
        StructField("transitioned", BooleanType()),
    ]
)

#: Persisted state: current alarm state + datapoints seen.
ALARM_STATE_SCHEMA = StructType(
    [
        StructField("cur_state", StringType()),
        StructField("n_seen", LongType()),
    ]
)


def make_alarm_fn(threshold: float = 1.0, timeout_ms: int = 60_000):
    """Build the applyInPandasWithState function for a given threshold/period."""

    def alarm_fn(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        stream_name = key[0]
        prev_state, n_seen = state.get if state.exists else ("OK", 0)

        if state.hasTimedOut:
            # Heartbeat stopped: missing data => BREACHING => ALARM.
            new_state = "ALARM"
            out = pd.DataFrame(
                {
                    "stream_name": [stream_name],
                    "reason": ["timeout"],
                    "max_lag": [None],
                    "state": [new_state],
                    "prev_state": [prev_state],
                    "transitioned": [new_state != prev_state],
                }
            )
            state.update((new_state, n_seen))
            state.setTimeoutDuration(timeout_ms)
            yield out
            return

        max_lag = None
        for pdf in pdfs:
            if len(pdf):
                m = pdf["value"].max()
                max_lag = m if max_lag is None else max(max_lag, m)
                n_seen += len(pdf)
        new_state = "ALARM" if (max_lag is not None and max_lag > threshold) else "OK"
        state.update((new_state, n_seen))
        state.setTimeoutDuration(timeout_ms)
        yield pd.DataFrame(
            {
                "stream_name": [stream_name],
                "reason": ["data"],
                "max_lag": [None if max_lag is None else float(max_lag)],
                "state": [new_state],
                "prev_state": [prev_state],
                "transitioned": [new_state != prev_state],
            }
        )

    return alarm_fn


def alarm_state_stream(
    metrics: DataFrame,
    threshold: float = 1.0,
    timeout_ms: int = 60_000,
) -> DataFrame:
    """metric rows (stream_name, value, ...) -> continuous alarm-state rows
    with heartbeat-timeout detection."""
    return metrics.groupBy("stream_name").applyInPandasWithState(
        make_alarm_fn(threshold=threshold, timeout_ms=timeout_ms),
        outputStructType=ALARM_OUTPUT_SCHEMA,
        stateStructType=ALARM_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )


#: Event-time variant state: alarm state + datapoints + max event time (ms).
ALARM_STATE_SCHEMA_ET = StructType(
    [
        StructField("cur_state", StringType()),
        StructField("n_seen", LongType()),
        StructField("max_ts_ms", LongType()),
    ]
)


def make_event_time_alarm_fn(threshold: float = 1.0, gap_ms: int = 60_000):
    """applyInPandasWithState function using EVENT-time timeouts: a key goes
    BREACHING when the stream's watermark (not the wall clock) passes its last
    event time + ``gap_ms``."""

    def alarm_fn(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        stream_name = key[0]
        prev_state, n_seen, max_ts_ms = (
            state.get if state.exists else ("OK", 0, 0)
        )

        if state.hasTimedOut:
            new_state = "ALARM"
            out = pd.DataFrame(
                {
                    "stream_name": [stream_name],
                    "reason": ["gap"],
                    "max_lag": [None],
                    "state": [new_state],
                    "prev_state": [prev_state],
                    "transitioned": [new_state != prev_state],
                }
            )
            # No new data: leave the silence armed one gap further out so a
            # still-dead stream re-fires as the watermark keeps advancing.
            state.update((new_state, n_seen, max_ts_ms))
            state.setTimeoutTimestamp(state.getCurrentWatermarkMs() + gap_ms)
            yield out
            return

        max_lag = None
        for pdf in pdfs:
            if len(pdf):
                m = pdf["value"].max()
                max_lag = m if max_lag is None else max(max_lag, m)
                n_seen += len(pdf)
                batch_max_ms = int(pdf["ts"].max().value // 1_000_000)
                max_ts_ms = max(max_ts_ms, batch_max_ms)
        new_state = "ALARM" if (max_lag is not None and max_lag > threshold) else "OK"
        state.update((new_state, n_seen, max_ts_ms))
        # Deterministic on replay: the deadline is data-derived (last event
        # time + gap), clamped above the current watermark as the API requires.
        state.setTimeoutTimestamp(
            max(max_ts_ms + gap_ms, state.getCurrentWatermarkMs() + 1)
        )
        yield pd.DataFrame(
            {
                "stream_name": [stream_name],
                "reason": ["data"],
                "max_lag": [None if max_lag is None else float(max_lag)],
                "state": [new_state],
                "prev_state": [prev_state],
                "transitioned": [new_state != prev_state],
            }
        )

    return alarm_fn


def alarm_state_stream_event_time(
    metrics: DataFrame,
    threshold: float = 1.0,
    gap_ms: int = 60_000,
    watermark: str = "0 seconds",
) -> DataFrame:
    """W4 with event-time semantics: absence is judged against the WATERMARK,
    so a replayed/backfilled run produces byte-identical alarms — the
    processing-time variant (``alarm_state_stream``) depends on wall-clock
    batch pacing instead. ``metrics`` needs (stream_name, ts, value)."""
    return (
        metrics.withWatermark("ts", watermark)
        .groupBy("stream_name")
        .applyInPandasWithState(
            make_event_time_alarm_fn(threshold=threshold, gap_ms=gap_ms),
            outputStructType=ALARM_OUTPUT_SCHEMA,
            stateStructType=ALARM_STATE_SCHEMA_ET,
            outputMode="update",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
