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
