"""Canonical StructTypes for every record shape in the pipeline.

Derived from SURVEY.md section 1 / FIXTURES.md. The reference binds these
shapes via Jackson POJOs (EventBridgeTriggerEvent.java:10-15, the AWS
``KinesisEvent`` type consumed at HealthCheckConsumerHandler.java:58-67, and
the golden fixture kinesis-event.json:1-20); here they are explicit Spark
schemas with a PERMISSIVE ``_corrupt_record`` contract for malformed payloads
(the reference's catch-and-drop, HealthCheckConsumerHandler.java:87-93).
"""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    BooleanType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

# ---------------------------------------------------------------------------
# 1.1 EventBridge trigger event (producer input)
# Reference: EventBridgeTriggerEvent.java:10-15; constant instance authored at
# KinesisHealthCheckStack.java:106-108.
# ---------------------------------------------------------------------------
TRIGGER_EVENT_SCHEMA = StructType(
    [
        StructField("type", StringType()),
        StructField("streamName", StringType()),
    ]
)

#: The constant trigger row the CDK stack injects (KinesisHealthCheckStack.java:106-108).
CANARY_TRIGGER = {"type": "KinesisHealthCheckCanary", "streamName": "health-check-stream"}

# ---------------------------------------------------------------------------
# 1.2 Tracer record payload (producer output / consumer payload)
# Reference: HealthCheckProducerHandler.java:49-54; README.md:17.
# ---------------------------------------------------------------------------
TRACER_SCHEMA = StructType([StructField("currentInstant", StringType())])

# ---------------------------------------------------------------------------
# 1.3 Kinesis event (consumer input) — the richest schema.
# Reference: kinesis-event.json:1-20 consumed at HealthCheckConsumerHandler.java:58-67.
# ``data`` is base64 text on the wire; ``approximateArrivalTimestamp`` is epoch
# SECONDS (may carry a fractional part). ``sequenceNumber`` must stay STRING —
# 56 decimal digits overflows int64.
# ---------------------------------------------------------------------------
KINESIS_RECORD_DETAIL_SCHEMA = StructType(
    [
        StructField("kinesisSchemaVersion", StringType()),
        StructField("partitionKey", StringType()),
        StructField("sequenceNumber", StringType()),
        StructField("data", StringType()),
        StructField("approximateArrivalTimestamp", DoubleType()),
    ]
)

KINESIS_RECORD_SCHEMA = StructType(
    [
        StructField("kinesis", KINESIS_RECORD_DETAIL_SCHEMA),
        StructField("eventSource", StringType()),
        StructField("eventVersion", StringType()),
        StructField("eventID", StringType()),
        StructField("eventName", StringType()),
        StructField("invokeIdentityArn", StringType()),
        StructField("awsRegion", StringType()),
        StructField("eventSourceARN", StringType()),
    ]
)

KINESIS_EVENT_SCHEMA = StructType(
    [StructField("records", ArrayType(KINESIS_RECORD_SCHEMA))]
)

#: Same schema plus the PERMISSIVE corrupt-record column for schema-on-read.
KINESIS_EVENT_SCHEMA_PERMISSIVE = StructType(
    KINESIS_EVENT_SCHEMA.fields + [StructField("_corrupt_record", StringType())]
)

# ---------------------------------------------------------------------------
# 1.4 Metric datum (consumer output / alarm input)
# Reference: HealthCheckConsumerHandler.java:72-83; identity re-declared at
# KinesisHealthCheckStack.java:165-171.
# ---------------------------------------------------------------------------
METRIC_NAMESPACE = "KinesisServiceHealthCheck"
METRIC_NAME = "HealthCheckSinceSeconds"

METRIC_SCHEMA = StructType(
    [
        StructField("ts", TimestampType()),
        StructField("namespace", StringType()),
        StructField("metric_name", StringType()),
        StructField("stream_name", StringType()),
        StructField("value", DoubleType()),
    ]
)

# ---------------------------------------------------------------------------
# 1.5 Alert row (alarm output; FIXTURES.md section 5)
# Reference semantics: KinesisHealthCheckStack.java:172-183.
# ---------------------------------------------------------------------------
ALERT_SCHEMA = StructType(
    [
        StructField("window_start", TimestampType()),
        StructField("window_end", TimestampType()),
        StructField("stream_name", StringType()),
        StructField("max_lag", DoubleType()),
        StructField("state", StringType()),
        StructField("prev_state", StringType()),
        StructField("transitioned", BooleanType()),
    ]
)

# ---------------------------------------------------------------------------
# Multimodal extension: opaque binary payload + typed metadata (EXT; no
# reference citation — training-data-pipeline scope).
# ---------------------------------------------------------------------------
MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),  # image | audio | video
        StructField("payload", BinaryType()),
        StructField("mime_type", StringType()),
        StructField("width", LongType()),
        StructField("height", LongType()),
        StructField("duration_ms", LongType()),
    ]
)

MEDIA_FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),
        StructField("feature", ArrayType(FloatType())),
        StructField("n_bytes", LongType()),
    ]
)

MEDIA_RESIZE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("new_width", IntegerType()),
        StructField("new_height", IntegerType()),
        StructField("payload", BinaryType()),
        StructField("n_bytes", LongType()),
    ]
)

#: Driver-generated testdata tables (TESTDATA.md) — names only; schemas are
#: whatever the parquet carries (documented in FIXTURES.md section 6).
TESTDATA_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)
