"""Consumer leg — decode, lag measurement, metric-row production.

Re-expresses HealthCheckConsumerHandler.java:58-94 as DataFrame transforms
over flattened kinesis records:

- P5/P6 base64 + UTF-8 decode of the payload (:65),
- P7/P8 payload ``currentInstant`` extraction/parse (the disabled-but-correct
  event-time path, :68) with arrival-time fallback (F5),
- P9 whole-second truncation BEFORE P11's subtraction (:102-107 then :71),
- P13 stream name from the eventSourceARN (:97-99),
- P15 constant metric identity (:73-81), P12 long->double value (:78).

``first_only`` reproduces the reference's record loop that returns after the
first record (F1, :64-86 — benign in prod only because ESM batchSize=1);
engine default processes every record.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from amazon_kinesis_data_streams_health_check_spark.functions import scalar
from amazon_kinesis_data_streams_health_check_spark.schemas import (
    METRIC_NAME,
    METRIC_NAMESPACE,
)


def decoded_records(records: DataFrame, strict_utf8: bool = False) -> DataFrame:
    """Add decoded payload + timestamp columns to flattened records.

    ``strict_utf8=True`` opts into the reference's throw-on-invalid decode
    contract (HealthCheckConsumerHandler.java:41,65); the default keeps the
    PERMISSIVE drop-the-record stance (F4)."""
    payload = scalar.utf8_decode(scalar.b64_decode(F.col("data")), strict=strict_utf8)
    arrival = scalar.epoch_seconds_to_ts(F.col("approximateArrivalTimestamp"))
    payload_ts = scalar.parse_instant(scalar.payload_instant(payload))
    return records.withColumns(
        {
            "payload_json": payload,
            "arrival_ts": arrival,
            "payload_ts": payload_ts,
            "stream_name": scalar.stream_name_from_arn(F.col("eventSourceARN")),
        }
    )


def metric_rows(
    decoded: DataFrame,
    now: Column,
    event_time_source: str = "coalesce",
    first_only: bool = False,
) -> DataFrame:
    """decoded records -> metric datum rows (FIXTURES.md section 4 shape).

    ``now`` is the injected processing-time stand-in (a Column, usually a
    broadcast scalar). ``event_time_source``: 'arrival' (reference shipped
    behavior), 'payload' (the commented-out correct path), 'coalesce'
    (engine default — payload when present, else arrival).
    """
    if event_time_source == "arrival":
        ev = F.col("arrival_ts")
    elif event_time_source == "payload":
        ev = F.col("payload_ts")
    elif event_time_source == "coalesce":
        ev = F.coalesce("payload_ts", "arrival_ts")
    else:
        raise ValueError(f"unknown event_time_source: {event_time_source}")

    df = decoded
    if first_only:
        # F1 parity: only record 0 of each batch/shard group is processed.
        w = Window.partitionBy("stream_name").orderBy("sequenceNumber")
        df = (
            df.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .drop("_rn")
        )

    ev_trunc = scalar.truncate_to_second(ev)
    return df.select(
        ev_trunc.alias("ts"),
        scalar.const("namespace", METRIC_NAMESPACE),
        scalar.const("metric_name", METRIC_NAME),
        F.col("stream_name"),
        scalar.as_metric_value(scalar.lag_seconds(ev, now)).alias("value"),
    ).filter(F.col("ts").isNotNull() & F.col("stream_name").isNotNull())
