"""Put-records sink (sources/kinesis_put.py): md5 shard routing, the
task-commit publish protocol, and pending-debris isolation."""

from __future__ import annotations

import base64
import json
import os

from amazon_kinesis_data_streams_health_check_spark.sources.kinesis_put import (
    read_committed,
    register_kinesis_put,
    shard_for_key,
)


def test_put_sink_commit_protocol_and_routing(spark, tmp_path):
    register_kinesis_put(spark)
    dest = str(tmp_path / "sink")
    rows = [("s", f"key-{i}", f"payload-{i}".encode()) for i in range(20)]
    df = spark.createDataFrame(
        rows, "stream_name string, partitionKey string, data binary"
    ).repartition(3, "partitionKey")
    df.write.format("kinesis_put").option("path", dest).option(
        "numshards", 4
    ).mode("append").save()

    # Debris: a crashed/speculative task's pending file must stay invisible.
    os.makedirs(os.path.join(dest, "_pending"), exist_ok=True)
    with open(os.path.join(dest, "_pending", "zz-crashed.jsonl"), "w") as fh:
        fh.write(json.dumps({"shard_id": "shardId-000000000000",
                             "partition_key": "ghost", "data_b64": ""}) + "\n")

    got = {
        (r.partition_key, r.shard_id, r.data_b64)
        for r in read_committed(spark, dest).collect()
    }
    assert len(got) == 20 and not any(pk == "ghost" for pk, _, _ in got)
    for pk, shard_id, b64 in got:
        i = int(pk.split("-")[1])
        assert shard_id == f"shardId-{shard_for_key(pk, 4):012d}"
        assert base64.b64decode(b64) == f"payload-{i}".encode()

    # The manifest names exactly the committed files (3 writer tasks).
    manifest = json.load(open(os.path.join(dest, "_manifest.json")))
    assert sum(f["n_records"] for f in manifest["files"]) == 20
    committed = {f["rel"] for f in manifest["files"]}
    on_disk = set(os.listdir(os.path.join(dest, "records")))
    assert committed == on_disk


def test_stream_writer_replayed_batch_commits_nothing(spark, tmp_path):
    """A re-executed batchId (crash between sink commit and checkpoint
    advance) must publish nothing new and leave no pending debris."""
    import glob

    from amazon_kinesis_data_streams_health_check_spark.sources.kinesis_put import (
        KinesisPutStreamWriter,
        read_stream_committed,
    )

    dest = str(tmp_path / "stream_sink")
    w = KinesisPutStreamWriter({"path": dest, "numshards": 2})

    def fake_rows(n0, n1):
        from pyspark.sql import Row

        return iter(
            Row(stream_name="s", partitionKey=f"k{i}", data=f"d{i}".encode())
            for i in range(n0, n1)
        )

    m1 = w.write(fake_rows(0, 5))
    w.commit([m1], batchId=0)
    assert read_stream_committed(spark, dest).count() == 5

    # replay of batch 0: same data re-written by tasks, commit must drop it
    m1r = w.write(fake_rows(0, 5))
    w.commit([m1r], batchId=0)
    assert read_stream_committed(spark, dest).count() == 5
    assert glob.glob(os.path.join(dest, "_pending", "*")) == []

    m2 = w.write(fake_rows(5, 8))
    w.commit([m2], batchId=1)
    assert read_stream_committed(spark, dest).count() == 8
