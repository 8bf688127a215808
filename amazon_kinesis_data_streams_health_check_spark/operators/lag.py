"""Lag / staleness computation — the consumer leg's core measurement.

The reference consumer computes
``Duration.between(Instant.parse(toISO8601UTC(arrival)), Instant.now()).toSeconds()``
(HealthCheckConsumerHandler.java:67-71): arrival truncated to whole seconds
(``:102-107``) BEFORE the subtraction, result truncated to a long. The
payload-timestamp path (``:68``) exists but is commented out; both are
supported here behind an event-time column choice (SURVEY.md F5).

Batch determinism: "now" is injected, never ``current_timestamp()``
(SURVEY.md section 7.4). Two deterministic choices are provided:

- a fixed ``now`` column/literal (parameter),
- the enclosing tumbling window's END — CloudWatch evaluates a period at its
  close, so "staleness at window close" is the batch-reproducible analogue of
  the consumer's processing-time lag.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from amazon_kinesis_data_streams_health_check_spark.functions import scalar


def event_time(arrival_ts: Column, payload_json: Column) -> Column:
    """F5: payload ``currentInstant`` when present/parseable, else arrival.

    The reference ships with the payload path disabled
    (HealthCheckConsumerHandler.java:67-68); the engine computes both and
    coalesces, which subsumes both modes (payload wins when present).
    """
    return F.coalesce(scalar.parse_instant(scalar.payload_instant(payload_json)), arrival_ts)


def staleness_at_window_close(
    df: DataFrame,
    ts_col: str = "ts",
    payload_col: str | None = "props",
    key_col: str = "event_type",
    period: str = "1 minute",
) -> DataFrame:
    """events-shaped rows -> per-event lag measured at the close of the
    event's tumbling period.

    ``lag_seconds = epoch(window_end) - epoch(trunc_to_second(event_ts))`` —
    the P9-truncate-then-P11-subtract order of the reference, with window_end
    standing in for ``Instant.now()``. Narrow (no shuffle): window assignment
    and the lag arithmetic are per-row expressions.
    """
    ts = F.col(ts_col)
    if payload_col is not None:
        ev = event_time(ts, F.col(payload_col))
    else:
        ev = ts
    w = F.window(ev, period)
    return df.select(
        F.col(key_col).alias("stream_name"),
        w["start"].alias("window_start"),
        w["end"].alias("window_end"),
        (
            F.unix_timestamp(w["end"])
            - F.unix_timestamp(scalar.truncate_to_second(ev))
        ).alias("lag_seconds"),
    )
