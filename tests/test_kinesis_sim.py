"""Custom Python DataSource (simulated Kinesis): wire contract, determinism,
shard-partition parallelism, streaming drain + paced modes."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from amazon_kinesis_data_streams_health_check_spark.sources.kinesis_sim import (
    register_kinesis_sim,
)


def _read(spark, **opts):
    register_kinesis_sim(spark)
    r = spark.read.format("kinesis_sim")
    for k, v in opts.items():
        r = r.option(k, v)
    return r.load()


def test_batch_wire_contract(spark):
    rows = _read(spark, numShards=2, recordsPerShard=3).collect()
    assert len(rows) == 6
    r0 = sorted(rows, key=lambda r: r.sequence_number)[0]
    assert r0.shard_id == "shardId-000000000000"
    assert len(r0.sequence_number) == 56  # kinesis-event.json:7 width
    payload = json.loads(bytes(r0.data).decode())
    assert payload["currentInstant"] == r0.partition_key  # producer contract
    assert r0.partition_key.endswith("Z")
    assert r0.event_source_arn.endswith("stream/health-check-stream")


def test_batch_is_deterministic_and_shard_parallel(spark):
    df1 = _read(spark, numShards=4, recordsPerShard=10)
    df2 = _read(spark, numShards=4, recordsPerShard=10)
    assert sorted(map(tuple, df1.collect())) == sorted(map(tuple, df2.collect()))
    assert df1.rdd.getNumPartitions() == 4  # one per shard
    # Per-shard sequence ordering is dense 0..n-1.
    seqs = [
        r.seq
        for r in df1.filter(F.col("shard_id") == "shardId-000000000002")
        .select(F.substring("sequence_number", 37, 20).cast("long").alias("seq"))
        .orderBy("seq")
        .collect()
    ]
    assert seqs == list(range(10))


def test_stream_drain_mode_consumes_backlog(spark, tmp_path):
    register_kinesis_sim(spark)
    q = (
        spark.readStream.format("kinesis_sim")
        .option("numShards", 3)
        .option("recordsPerShard", 7)
        .load()
        .writeStream.format("memory")
        .queryName("ks_drain")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.table("ks_drain")
    assert got.count() == 21
    # Streaming rows match the batch read exactly (same generator).
    batch = _read(spark, numShards=3, recordsPerShard=7)
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, batch.collect()))


def test_stream_paced_mode_advances_per_trigger(spark, tmp_path):
    register_kinesis_sim(spark)
    q = (
        spark.readStream.format("kinesis_sim")
        .option("numShards", 2)
        .option("recordsPerShard", 50)
        .option("recordsPerBatch", 5)
        .option("drain", "false")
        .load()
        .writeStream.format("memory")
        .queryName("ks_paced")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(processingTime="1 second")
        .start()
    )
    import time

    try:
        deadline = time.time() + 60
        while time.time() < deadline:
            n = spark.table("ks_paced").count()
            if n >= 20:
                break
            time.sleep(2)
    finally:
        q.stop()
    n = spark.table("ks_paced").count()
    # Paced admission: several triggers' worth, not the whole 100-row backlog
    # in one gulp (first trigger = 5/shard).
    assert 10 <= n <= 100 and n % 10 == 0, n
