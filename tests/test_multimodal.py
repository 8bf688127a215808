"""Multimodal plumbing: schema, Arrow batch shape, determinism, stub gating."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from amazon_kinesis_data_streams_health_check_spark.operators.multimodal import (
    FEATURE_DIM,
    decode_media,
    frame_sample,
    synthesize_media,
)
from amazon_kinesis_data_streams_health_check_spark.sources.tables import load_table


@pytest.fixture(scope="module")
def media(spark, sf_small):
    return synthesize_media(load_table(spark, sf_small, "documents"))


def test_media_schema_and_kinds(spark, media):
    assert [f.name for f in media.schema.fields] == [
        "media_id", "kind", "payload", "mime_type", "width", "height", "duration_ms",
    ]
    kinds = {r.kind for r in media.select("kind").distinct().collect()}
    assert kinds == {"image", "audio", "video"}
    assert dict(media.dtypes)["payload"] == "binary"


def test_fake_decode_shape_and_determinism(spark, media):
    feats = decode_media(media, decoder="fake")
    rows1 = {r.media_id: r for r in feats.collect()}
    rows2 = {r.media_id: r for r in decode_media(media, decoder="fake").collect()}
    assert len(rows1) == media.count()
    any_row = next(iter(rows1.values()))
    assert len(any_row.feature) == FEATURE_DIM
    assert all(rows1[k].feature == rows2[k].feature for k in rows1)  # deterministic
    # n_bytes matches the payload length (ASCII text -> n_chars)
    src = {r.media_id: r for r in media.collect()}
    assert all(rows1[k].n_bytes == len(bytes(src[k].payload)) for k in rows1)


def test_fake_decode_partition_independent(spark, media):
    # mapInPandas must not depend on batch/partition boundaries.
    one = {r.media_id: r.feature for r in decode_media(media.coalesce(1)).collect()}
    many = {r.media_id: r.feature for r in decode_media(media.repartition(7)).collect()}
    assert one == many


def test_real_decode_stub_raises(spark, media):
    with pytest.raises(Exception) as ei:
        decode_media(media.limit(3), decoder="real").collect()
    assert "NotImplementedError" in str(ei.value) or isinstance(
        ei.value, NotImplementedError
    )


def test_frame_sample_offsets(spark, media):
    frames = frame_sample(media, every_n_bytes=64, max_frames=8)
    rows = frames.collect()
    assert rows
    for r in rows[:50]:
        assert r.byte_offset == r.frame_idx * 64
        assert len(bytes(r.frame_bytes)) <= 64
    # only video rows
    vids = {r.media_id for r in media.filter(F.col("kind") == "video").collect()}
    assert {r.media_id for r in rows} <= vids
