"""Unit tests for the scalar op layer (SURVEY.md section 2.3) against
hand-computed expectations, incl. the FIXTURES.md section 7 edge cases."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructField, StructType, TimestampType

from amazon_kinesis_data_streams_health_check_spark.functions import scalar

UTC = dt.timezone.utc


def _one(spark, cols: dict):
    """Build a 1-row DataFrame and return its only row."""
    df = spark.range(1)
    for name, col in cols.items():
        df = df.withColumn(name, col)
    return df.collect()[0]


def test_tracer_json_exact_bytes(spark):
    # Producer parity: Jackson writeValueAsString of the singleton map
    # (HealthCheckProducerHandler.java:50,54) — compact, double-quoted.
    row = _one(spark, {"j": scalar.tracer_json(F.lit("2022-10-17T10:00:00Z"))})
    assert row.j == '{"currentInstant":"2022-10-17T10:00:00Z"}'


def test_b64_utf8_round_trip(spark):
    payload = '{"currentInstant":"2022-10-17T10:00:00Z"}'
    row = _one(
        spark,
        {"out": scalar.utf8_decode(scalar.b64_decode(scalar.b64_encode(scalar.utf8_encode(F.lit(payload)))))},
    )
    assert row.out == payload


def test_golden_fixture_payload_decodes(spark):
    # kinesis-event.json:8 carries this exact base64 payload.
    golden_b64 = "eyJjdXJyZW50SW5zdGFudCI6IjIwMjItMTAtMTdUMTA6MDA6MDBaIn0="
    row = _one(
        spark,
        {
            "payload": scalar.utf8_decode(scalar.b64_decode(F.lit(golden_b64))),
            "instant": scalar.payload_instant(scalar.utf8_decode(scalar.b64_decode(F.lit(golden_b64)))),
        },
    )
    assert row.payload == '{"currentInstant":"2022-10-17T10:00:00Z"}'
    assert row.instant == "2022-10-17T10:00:00Z"


def test_corrupt_payloads_null_not_crash(spark):
    # FIXTURES.md edge 3 / F4: malformed JSON, missing key, bad timestamp ->
    # NULL, never an exception.
    rows = _one(
        spark,
        {
            "bad_json": scalar.payload_instant(F.lit("{not json")),
            "missing_key": scalar.payload_instant(F.lit('{"other": 1}')),
            "bad_ts": scalar.parse_instant(F.lit("not-a-timestamp")),
        },
    )
    assert rows.bad_json is None
    assert rows.missing_key is None
    assert rows.bad_ts is None


def test_strict_utf8_decode_throws_like_reference(spark):
    """P6 opt-in strict mode: the reference's UTF_8.newDecoder() REPORTs on
    malformed input (HealthCheckConsumerHandler.java:41,65); strict=True
    must fail the job on the first invalid payload, and be a no-op on valid
    ones (including payloads that legitimately contain U+FFFD)."""
    import pytest
    from pyspark.errors.exceptions.base import PySparkException

    valid = spark.createDataFrame(
        [(bytearray("plain".encode()),), (bytearray("repl � ok".encode()),), (None,)],
        "b binary",
    )
    got = [
        r.s for r in valid.select(scalar.utf8_decode(F.col("b"), strict=True).alias("s")).collect()
    ]
    assert got == ["plain", "repl � ok", None]

    corrupt = spark.createDataFrame(
        [(bytearray(b"ok"),), (bytearray(b"\xff\xfe broken"),)], "b binary"
    )
    # Permissive: NULL on invalid (downstream null-out = the reference's
    # per-record catch-and-drop), never a throw, valid rows untouched.
    perm = {r.s for r in corrupt.select(scalar.utf8_decode(F.col("b")).alias("s")).collect()}
    assert perm == {"ok", None}
    with pytest.raises(PySparkException, match="MALFORMED_UTF8_PAYLOAD"):
        corrupt.select(scalar.utf8_decode(F.col("b"), strict=True).alias("s")).collect()


def test_strict_utf8_flows_through_decoded_records(spark):
    """The consumer decode leg exposes the strict switch end-to-end."""
    import base64

    import pytest
    from pyspark.errors.exceptions.base import PySparkException

    from amazon_kinesis_data_streams_health_check_spark.operators.consumer import (
        decoded_records,
    )

    bad_b64 = base64.b64encode(b"\xff\xfe").decode()
    records = spark.createDataFrame(
        [(bad_b64, 1666000000.0, "arn:aws:kinesis:us-east-1:123:stream/s")],
        "data string, approximateArrivalTimestamp double, eventSourceARN string",
    )
    # Default stays permissive: row survives with a NULL payload (F4 drop).
    decoded = decoded_records(records).select("payload_json").collect()
    assert len(decoded) == 1 and decoded[0].payload_json is None
    with pytest.raises(PySparkException, match="MALFORMED_UTF8_PAYLOAD"):
        decoded_records(records, strict_utf8=True).select("payload_json").collect()


def test_second_truncation_before_subtraction(spark):
    # FIXTURES.md edge 2: arrival 10:00:00.900, now 10:00:01.100 — true delta
    # is 0.2s, but the reference truncates arrival to 10:00:00 FIRST
    # (HealthCheckConsumerHandler.java:102-107), then Duration.toSeconds
    # truncates: floor(1.100) - 0 = 1, not 0.
    arrival = dt.datetime(2022, 10, 17, 10, 0, 0, 900000)
    now = dt.datetime(2022, 10, 17, 10, 0, 1, 100000)
    schema = StructType(
        [StructField("arrival", TimestampType()), StructField("now", TimestampType())]
    )
    df = spark.createDataFrame([(arrival, now)], schema)
    row = df.select(
        scalar.lag_seconds(F.col("arrival"), F.col("now")).alias("lag")
    ).collect()[0]
    assert row.lag == 1


def test_iso8601_utc_seconds_truncates(spark):
    ts = dt.datetime(2022, 10, 17, 13, 52, 50, 987654)
    df = spark.createDataFrame([(ts,)], StructType([StructField("t", TimestampType())]))
    row = df.select(scalar.iso8601_utc_seconds(F.col("t")).alias("s")).collect()[0]
    assert row.s == "2022-10-17T13:52:50Z"  # millis dropped, reference parity


def test_arn_parse_variants(spark):
    # FIXTURES.md edge 7 + golden fixture ARN (kinesis-event.json:17).
    df = spark.createDataFrame(
        [
            ("arn:aws:kinesis:us-east-2:123456789012:stream/lambda-stream",),
            ("arn:aws:kinesis:us-east-2:123456789012:stream/deep/extra/segments",),
            ("arn:aws:kinesis:short",),
            (None,),
        ],
        StructType([StructField("arn", StringType())]),
    )
    got = [r.name for r in df.select(scalar.stream_name_from_arn(F.col("arn")).alias("name")).collect()]
    assert got == ["lambda-stream", "deep", None, None]


def test_epoch_seconds_to_ts_golden(spark):
    # kinesis-event.json:9 -> 2022-10-17T13:52:50Z (README decoded form).
    row = _one(spark, {"t": scalar.epoch_seconds_to_ts(F.lit(1666014770.0))})
    assert row.t.replace(tzinfo=None) == dt.datetime(2022, 10, 17, 13, 52, 50)


def test_instant_iso_micros_format(spark):
    ts = dt.datetime(2024, 1, 1, 0, 9, 58, 778549)
    df = spark.createDataFrame([(ts,)], StructType([StructField("t", TimestampType())]))
    row = df.select(scalar.instant_iso(F.col("t")).alias("s")).collect()[0]
    assert row.s == "2024-01-01T00:09:58.778549Z"
