"""KPL aggregation wire-format and operator tests.

The codec implements the PUBLIC KPL aggregated-record protocol
(awslabs/amazon-kinesis-producer aggregation-format.md): magic 0xF3899AC2,
hand-rolled protobuf AggregatedRecord, md5 trailer. These tests pin the
envelope bytes, the KCL passthrough semantics for every malformed class,
and the Spark pack/explode round trip.
"""

from __future__ import annotations

import hashlib

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from amazon_kinesis_data_streams_health_check_spark.functions.kpl import (
    KPL_MAGIC,
    deaggregate,
    decode_aggregated,
    encode_aggregated,
)


class TestCodec:
    def test_roundtrip_basic(self):
        recs = [("pk-a", b"hello"), ("pk-b", b"world"), ("pk-a", b"again")]
        assert decode_aggregated(encode_aggregated(recs)) == recs

    def test_envelope_shape(self):
        blob = encode_aggregated([("k", b"v")])
        assert blob.startswith(KPL_MAGIC)
        message = blob[len(KPL_MAGIC) : -16]
        assert blob[-16:] == hashlib.md5(message).digest()

    def test_partition_key_interning(self):
        # 3 records, 2 distinct keys -> the key appears once in the table;
        # total size must be smaller than naive per-record keys.
        recs = [("shared-key-xxxxxxxxxxxxxxxx", b"a")] * 3
        blob = encode_aggregated(recs)
        assert blob.count(b"shared-key-xxxxxxxxxxxxxxxx") == 1
        assert decode_aggregated(blob) == recs

    def test_unicode_partition_keys(self):
        recs = [("clé-中文", b"\x00\xff\x10")]
        assert decode_aggregated(encode_aggregated(recs)) == recs

    def test_empty_data_record(self):
        recs = [("k", b"")]
        assert decode_aggregated(encode_aggregated(recs)) == recs

    def test_zero_records_raises(self):
        with pytest.raises(ValueError):
            encode_aggregated([])

    def test_non_kpl_passthrough(self):
        assert deaggregate("pk", b'{"plain": "json"}') == [
            ("pk", b'{"plain": "json"}')
        ]

    def test_corrupt_checksum_passthrough(self):
        blob = bytearray(encode_aggregated([("k", b"v")]))
        blob[-1] ^= 0xFF
        assert deaggregate("orig-pk", bytes(blob)) == [("orig-pk", bytes(blob))]

    def test_truncated_passthrough(self):
        blob = encode_aggregated([("k", b"v")])
        for cut in (3, len(KPL_MAGIC), len(blob) - 1):
            trunc = blob[:cut]
            assert deaggregate("p", trunc) == [("p", trunc)]

    def test_corrupt_body_passthrough(self):
        blob = bytearray(encode_aggregated([("k", b"payload")]))
        # flip a byte inside the protobuf message -> md5 mismatch
        blob[len(KPL_MAGIC) + 2] ^= 0x55
        assert deaggregate("p", bytes(blob)) == [("p", bytes(blob))]

    @settings(max_examples=50, deadline=None)
    @given(
        st.lists(
            st.tuples(
                st.text(min_size=1, max_size=40),
                st.binary(min_size=0, max_size=200),
            ),
            min_size=1,
            max_size=20,
        )
    )
    def test_roundtrip_property(self, recs):
        assert decode_aggregated(encode_aggregated(recs)) == recs


class TestSparkOperators:
    @pytest.fixture(scope="class")
    def raw(self, spark):
        from amazon_kinesis_data_streams_health_check_spark.sources.kinesis_sim import (
            register_kinesis_sim,
        )

        register_kinesis_sim(spark)
        return (
            spark.read.format("kinesis_sim")
            .option("numShards", 2)
            .option("recordsPerShard", 23)  # deliberately not divisible by 5
            .load()
            .cache()
        )

    def test_pack_counts_and_tail_blob(self, raw):
        from amazon_kinesis_data_streams_health_check_spark.operators.kpl_agg import (
            pack_kpl,
        )

        packed = pack_kpl(raw, max_per_blob=5)
        rows = packed.collect()
        # 23 records -> 4 full blobs + 1 tail of 3, per shard
        assert len(rows) == 2 * 5
        per_shard = {}
        for r in rows:
            per_shard.setdefault(r.shard_id, []).append(r)
        for shard_rows in per_shard.values():
            sizes = [r.n_user_records for r in sorted(shard_rows, key=lambda r: r.agg_index)]
            assert sizes == [5, 5, 5, 5, 3]

    def test_pack_explode_roundtrip_multiset(self, raw, spark):
        from amazon_kinesis_data_streams_health_check_spark.operators.kpl_agg import (
            explode_kpl,
            kpl_pack_unpack_roundtrip_audit,
            pack_kpl,
        )

        packed = pack_kpl(raw, max_per_blob=5)
        exploded = explode_kpl(
            packed,
            pk_col="agg_partition_key",
            data_col="agg_data",
            keep_cols=("shard_id",),
        )
        audit = kpl_pack_unpack_roundtrip_audit(raw, exploded)
        assert audit.collect()[0].roundtrip_exact is True
        # exact multiset equality, not just checksums
        orig = sorted(
            (r.shard_id, r.partition_key, bytes(r.data)) for r in raw.collect()
        )
        back = sorted(
            (r.shard_id, r.user_partition_key, bytes(r.user_data))
            for r in exploded.collect()
        )
        assert orig == back

    def test_pack_deterministic_under_repartition(self, raw):
        from amazon_kinesis_data_streams_health_check_spark.operators.kpl_agg import (
            pack_kpl,
        )

        a = {
            (r.shard_id, r.agg_index): bytes(r.agg_data)
            for r in pack_kpl(raw, max_per_blob=5).collect()
        }
        b = {
            (r.shard_id, r.agg_index): bytes(r.agg_data)
            for r in pack_kpl(raw.repartition(7), max_per_blob=5).collect()
        }
        assert a == b

    def test_explode_passthrough_for_plain_records(self, raw):
        from amazon_kinesis_data_streams_health_check_spark.operators.kpl_agg import (
            explode_kpl,
        )

        # Raw (non-KPL) payloads pass through as single subsequence-0 rows.
        exploded = explode_kpl(raw, keep_cols=("shard_id", "sequence_number"))
        rows = exploded.collect()
        assert len(rows) == raw.count()
        assert {r.subsequence for r in rows} == {0}
        orig = {r.sequence_number: bytes(r.data) for r in raw.collect()}
        for r in rows:
            assert bytes(r.user_data) == orig[r.sequence_number]

    def test_audit_detects_loss(self, raw, spark):
        from amazon_kinesis_data_streams_health_check_spark.operators.kpl_agg import (
            explode_kpl,
            kpl_pack_unpack_roundtrip_audit,
            pack_kpl,
        )
        import pyspark.sql.functions as F

        packed = pack_kpl(raw, max_per_blob=5)
        exploded = explode_kpl(
            packed,
            pk_col="agg_partition_key",
            data_col="agg_data",
            keep_cols=("shard_id",),
        ).filter(F.col("subsequence") != 2)  # drop one record per full blob
        audit = kpl_pack_unpack_roundtrip_audit(raw, exploded)
        assert audit.collect()[0].roundtrip_exact is False


class TestSubsequenceCheckpointEdges:
    """KCL (sequence, subSequence) resume rule at the blob boundaries —
    the off-by-one classes a naive sequence-only resume gets wrong."""

    @pytest.fixture(scope="class")
    def packed(self, spark):
        from amazon_kinesis_data_streams_health_check_spark.operators.kpl_agg import (
            pack_kpl,
        )
        from amazon_kinesis_data_streams_health_check_spark.sources.kinesis_sim import (
            register_kinesis_sim,
        )

        register_kinesis_sim(spark)
        raw = (
            spark.read.format("kinesis_sim")
            .option("numShards", 1)
            .option("recordsPerShard", 20)
            .load()
        )
        return pack_kpl(raw, max_per_blob=5).cache()

    def _resume(self, spark, packed, cp_blob: int, cp_sub: int):
        from pyspark.sql import functions as F

        from amazon_kinesis_data_streams_health_check_spark.operators.kpl_agg import (
            explode_kpl,
        )

        refetched = packed.filter(F.col("agg_index") >= cp_blob)
        exploded = explode_kpl(
            refetched,
            pk_col="agg_partition_key",
            data_col="agg_data",
            keep_cols=("shard_id", "agg_index"),
        )
        return (
            exploded.filter(
                ~((F.col("agg_index") == cp_blob) & (F.col("subsequence") <= cp_sub))
            )
            .select("agg_index", "subsequence")
            .collect()
        )

    def test_mid_blob_checkpoint_resumes_within_blob(self, spark, packed):
        rows = self._resume(spark, packed, cp_blob=1, cp_sub=2)
        # blob 1 contributes subsequences 3..4; blobs 2..3 fully
        assert sorted((r.agg_index, r.subsequence) for r in rows) == [
            (1, 3), (1, 4),
            *[(b, s) for b in (2, 3) for s in range(5)],
        ]

    def test_last_member_checkpoint_skips_whole_blob(self, spark, packed):
        # checkpoint at the blob's LAST subsequence == blob fully processed:
        # resume must contribute nothing from it (the AFTER_SEQUENCE case)
        rows = self._resume(spark, packed, cp_blob=1, cp_sub=4)
        assert sorted({r.agg_index for r in rows}) == [2, 3]
        assert len(rows) == 10

    def test_sub_minus_one_reprocesses_whole_blob(self, spark, packed):
        # subSequence -1 (nothing of the blob processed) == AT_SEQUENCE of
        # the whole blob: all 5 members replay
        rows = self._resume(spark, packed, cp_blob=1, cp_sub=-1)
        assert len(rows) == 15
        assert sorted({r.agg_index for r in rows}) == [1, 2, 3]
