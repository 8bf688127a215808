"""Consumer-leg unit tests: golden fixture, multi-record batches, first-only
parity, corrupt data (FIXTURES.md sections 1 and 7)."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from amazon_kinesis_data_streams_health_check_spark.operators.consumer import (
    decoded_records,
    metric_rows,
)
from amazon_kinesis_data_streams_health_check_spark.schemas import (
    KINESIS_EVENT_SCHEMA_PERMISSIVE,
)
from amazon_kinesis_data_streams_health_check_spark.sources.kinesis_events import (
    read_kinesis_events_json,
)

GOLDEN = {
    "records": [
        {
            "kinesis": {
                "kinesisSchemaVersion": "1.0",
                "partitionKey": "2022-10-17T10:00:00Z",
                "sequenceNumber": "49545115243490985018280067714973144582180062593244200961",
                "data": "eyJjdXJyZW50SW5zdGFudCI6IjIwMjItMTAtMTdUMTA6MDA6MDBaIn0=",
                "approximateArrivalTimestamp": 1666014770.0,
            },
            "eventSource": "aws:kinesis",
            "eventVersion": "1.0",
            "eventID": "shardId-000000000000:49545115243490985018280067714973144582180062593244200961",
            "eventName": "aws:kinesis:record",
            "invokeIdentityArn": "arn:aws:iam::123456789012:role/lambda-role",
            "awsRegion": "us-east-2",
            "eventSourceARN": "arn:aws:kinesis:us-east-2:123456789012:stream/lambda-stream",
        }
    ]
}


def _records_df(spark, events: list[dict]):
    df = spark.createDataFrame(
        [(json.dumps(e),) for e in events], ["json"]
    ).select(
        F.from_json("json", KINESIS_EVENT_SCHEMA_PERMISSIVE).alias("e")
    ).select("e.records")
    from amazon_kinesis_data_streams_health_check_spark.sources.kinesis_events import (
        explode_records,
    )

    return explode_records(df)


def test_golden_fixture_full_consumer_path(spark):
    # The reference's unit test in spark form: golden event -> metric row
    # (consumer HandlerTest.java:31-42). Arrival is 2022-10-17T13:52:50Z;
    # payload instant is 10:00:00Z; with now = arrival+1s the payload-time lag
    # is 13920+1 seconds, the arrival-time lag is 1.
    recs = _records_df(spark, [GOLDEN])
    dec = decoded_records(recs)
    row = dec.collect()[0]
    assert row.stream_name == "lambda-stream"
    assert row.payload_json == '{"currentInstant":"2022-10-17T10:00:00Z"}'
    assert row.payload_ts.replace(tzinfo=None).isoformat() == "2022-10-17T10:00:00"

    now = F.to_timestamp(F.lit("2022-10-17 13:52:51"))
    arrival_mode = metric_rows(dec, now, event_time_source="arrival").collect()[0]
    assert arrival_mode.value == 1.0
    assert arrival_mode.namespace == "KinesisServiceHealthCheck"
    assert arrival_mode.metric_name == "HealthCheckSinceSeconds"
    payload_mode = metric_rows(dec, now, event_time_source="payload").collect()[0]
    assert payload_mode.value == 13971.0  # 3h52m51s


def test_first_only_parity_mode(spark):
    # F1: multi-record batch -> only the lowest sequence number produces a
    # metric in first_only mode; default mode processes all (SURVEY.md F1).
    def rec(seq: str, arrival: float):
        r = json.loads(json.dumps(GOLDEN["records"][0]))
        r["kinesis"]["sequenceNumber"] = seq
        r["kinesis"]["approximateArrivalTimestamp"] = arrival
        r["eventID"] = f"shardId-000000000000:{seq}"
        return r

    batch = {"records": [rec("03", 1666014772.0), rec("01", 1666014770.0), rec("02", 1666014771.0)]}
    dec = decoded_records(_records_df(spark, [batch]))
    now = F.to_timestamp(F.lit("2022-10-17 13:53:00"))
    all_rows = metric_rows(dec, now, event_time_source="arrival").collect()
    assert len(all_rows) == 3
    first = metric_rows(dec, now, event_time_source="arrival", first_only=True).collect()
    assert len(first) == 1
    assert first[0].value == 10.0  # seq 01, arrival :50 -> now :00


def test_corrupt_base64_and_json_dropped(spark):
    # FIXTURES.md edge 3: invalid base64 / malformed payload JSON / missing
    # key -> row filtered out (F4 drop-not-crash), valid rows survive.
    def with_data(data: str):
        r = json.loads(json.dumps(GOLDEN["records"][0]))
        r["kinesis"]["data"] = data
        return {"records": [r]}

    import base64

    bad = [
        with_data("!!!not-base64!!!"),
        with_data(base64.b64encode(b"{not json").decode()),
        with_data(base64.b64encode(b'{"other": 1}').decode()),
    ]
    dec = decoded_records(_records_df(spark, bad))
    now = F.to_timestamp(F.lit("2022-10-17 13:53:00"))
    # payload mode: corrupt payloads have no event time -> dropped
    assert metric_rows(dec, now, event_time_source="payload").count() == 0
    # coalesce mode: arrival time still valid -> all retained
    assert metric_rows(dec, now, event_time_source="coalesce").count() == 3


def test_permissive_json_source_corrupt_record(spark, tmp_path):
    # S3 source: malformed document lands in _corrupt_record, scan survives.
    p = tmp_path / "events.json"
    p.write_text(json.dumps(GOLDEN) + "\n" + "{broken json\n")
    df = read_kinesis_events_json(spark, str(p))
    rows = df.collect()
    assert len(rows) == 2
    corrupt = [r for r in rows if r._corrupt_record is not None]
    assert len(corrupt) == 1
    ok = [r for r in rows if r.records is not None]
    assert len(ok) == 1
    assert ok[0].records[0].eventSourceARN.endswith("lambda-stream")


def test_produce_consume_round_trip_lag_exact(spark):
    """SURVEY 7.3.3: producer bytes -> wire -> consumer decode -> lag, with
    the P9 second-truncation pinned end-to-end. Event produced at
    .900s, 'now' at +4.2s wall (=.100s) => lag is 5, not 4."""
    import datetime as dt

    from amazon_kinesis_data_streams_health_check_spark.operators.consumer import (
        decoded_records,
        metric_rows,
    )
    from amazon_kinesis_data_streams_health_check_spark.sources.kinesis_events import (
        explode_records,
        synthesize_from_events,
    )

    t0 = dt.datetime(2024, 1, 1, 12, 0, 0, 900_000, tzinfo=dt.timezone.utc)
    now = dt.datetime(2024, 1, 1, 12, 0, 5, 100_000, tzinfo=dt.timezone.utc)
    events = spark.createDataFrame(
        [(1, t0, "stream-a")], "event_id long, ts timestamp, event_type string"
    )
    decoded = decoded_records(explode_records(synthesize_from_events(events)))
    row = metric_rows(decoded, F.lit(now), event_time_source="payload").collect()[0]
    assert row.stream_name == "stream-a"
    assert row.value == 5.0  # floor(now) - floor(payload instant), not 4.2
    # and the payload genuinely round-tripped through base64/JSON
    assert row.ts == dt.datetime(2024, 1, 1, 12, 0, 0)  # second-truncated
