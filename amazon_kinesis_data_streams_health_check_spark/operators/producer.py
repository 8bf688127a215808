"""Producer leg — tracer record generation (the write side of the canary).

Re-expresses HealthCheckProducerHandler.java:46-58 as a narrow DataFrame
transform: P1 timestamp -> P2/P3 singleton-struct JSON -> P4 UTF-8 bytes,
partition key = the tracer timestamp string itself (X1,
HealthCheckProducerHandler.java:53 — per-record-unique key => uniform shard
spread; Kinesis MD5-hashes the key to a shard, Spark's analogue is
``repartition(n, partition_key)``).

No shuffle, no UDFs: pure whole-stage-codegen expressions, so at 100 TB this
is scan-bound.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from amazon_kinesis_data_streams_health_check_spark.functions import scalar


def tracer_records(
    df: DataFrame,
    instant_col: Column,
    stream_col: Column,
) -> DataFrame:
    """rows -> (stream_name, partition_key, data_json, data_b64).

    ``instant_col`` is the injected deterministic stand-in for
    ``Instant.now()`` (SURVEY.md section 7.4: no wall clock inside
    oracle-checked queries); streaming callers pass
    ``scalar.current_instant_iso()`` built from the batch timestamp.
    """
    instant = scalar.instant_iso(instant_col) if not isinstance(instant_col, str) else F.col(instant_col)
    json_payload = scalar.tracer_json(instant)
    return df.select(
        stream_col.alias("stream_name"),
        instant.alias("partition_key"),  # HealthCheckProducerHandler.java:53
        json_payload.alias("data_json"),
        scalar.b64_encode(scalar.utf8_encode(json_payload)).alias("data_b64"),
    )


def to_kinesis_put_requests(tracers: DataFrame, num_shards: int = 4) -> DataFrame:
    """K1 shape: the PutRecordRequest triple (stream, partitionKey, data bytes)
    hash-placed by partition key (X1). ``repartition`` on the key reproduces
    Kinesis' per-key shard affinity for downstream per-partition writers."""
    return tracers.select(
        "stream_name",
        F.col("partition_key").alias("partitionKey"),
        scalar.utf8_encode(F.col("data_json")).alias("data"),
    ).repartition(num_shards, "partitionKey")
