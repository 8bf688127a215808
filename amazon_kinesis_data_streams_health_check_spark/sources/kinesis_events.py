"""Kinesis-event shaped sources.

Two ways to obtain the canonical consumer input (FIXTURES.md section 1):

- ``read_kinesis_events_json``: S3 — deserialize event JSON files with the
  explicit schema, PERMISSIVE + ``_corrupt_record`` (the test-harness path,
  consumer HandlerTest.java:58-63).
- ``synthesize_from_events``: build wire-faithful single-record batches from
  the driver's ``events`` table (ESM ``batchSize(1)`` parity,
  KinesisHealthCheckStack.java:157) so the full producer->wire->consumer
  round trip is exercised — and DuckDB-checkable — without AWS.

A production deployment would instead use a Kinesis Structured Streaming
connector (``spark.readStream.format("kinesis")``, S2) emitting this same
flattened schema; everything downstream is source-agnostic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from amazon_kinesis_data_streams_health_check_spark.functions import scalar
from amazon_kinesis_data_streams_health_check_spark.schemas import (
    KINESIS_EVENT_SCHEMA_PERMISSIVE,
)

ARN_PREFIX = "arn:aws:kinesis:us-east-1:123456789012:stream/"


def read_kinesis_events_json(spark: SparkSession, path: str) -> DataFrame:
    """S3: schema-on-read of Lambda-test-style event JSON (PERMISSIVE mode;
    malformed documents land in ``_corrupt_record`` instead of failing the
    scan — F4 swallow parity)."""
    return (
        spark.read.schema(KINESIS_EVENT_SCHEMA_PERMISSIVE)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .json(path)
    )


def synthesize_from_events(
    events: DataFrame,
    ts_col: str = "ts",
    stream_col: str = "event_type",
    id_col: str = "event_id",
) -> DataFrame:
    """events rows -> batched kinesis-event frames (one record per batch).

    The payload is a real tracer record built by the producer ops (P1-P4),
    so consumer-side decode genuinely round-trips the producer's bytes.
    ``sequenceNumber`` is zero-padded to 56 digits (kinesis-event.json:7);
    ``approximateArrivalTimestamp`` is epoch seconds (:9).
    """
    instant = scalar.instant_iso(F.col(ts_col))
    payload = scalar.tracer_json(instant)
    seq = F.lpad(F.col(id_col).cast("string"), 56, "0")
    record = F.struct(
        F.struct(
            F.lit("1.0").alias("kinesisSchemaVersion"),
            instant.alias("partitionKey"),
            seq.alias("sequenceNumber"),
            scalar.b64_encode(scalar.utf8_encode(payload)).alias("data"),
            # via TIMESTAMP first: parquet may carry TIMESTAMP_NTZ, which has
            # no direct NTZ->DOUBLE cast (session tz is UTC, so this is exact)
            F.col(ts_col).cast("timestamp").cast("double").alias("approximateArrivalTimestamp"),
        ).alias("kinesis"),
        F.lit("aws:kinesis").alias("eventSource"),
        F.lit("1.0").alias("eventVersion"),
        F.concat(F.lit("shardId-000000000000:"), seq).alias("eventID"),
        F.lit("aws:kinesis:record").alias("eventName"),
        F.lit("arn:aws:iam::123456789012:role/lambda-role").alias("invokeIdentityArn"),
        F.lit("us-east-1").alias("awsRegion"),
        F.concat(F.lit(ARN_PREFIX), F.col(stream_col)).alias("eventSourceARN"),
    )
    return events.select(F.array(record).alias("records"))


def explode_records(batches: DataFrame) -> DataFrame:
    """Flatten batched events to per-record rows (the consumer's record loop,
    HealthCheckConsumerHandler.java:64). ``explode`` drops empty batches —
    matching the loop body never running."""
    r = F.explode("records")
    return batches.select(r.alias("r")).select(
        F.col("r.kinesis.partitionKey").alias("partitionKey"),
        F.col("r.kinesis.sequenceNumber").alias("sequenceNumber"),
        F.col("r.kinesis.data").alias("data"),
        F.col("r.kinesis.approximateArrivalTimestamp").alias("approximateArrivalTimestamp"),
        F.col("r.eventID").alias("eventID"),
        F.col("r.eventSourceARN").alias("eventSourceARN"),
    )
