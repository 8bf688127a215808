"""KPL record aggregation / de-aggregation (the public KPL wire protocol).

Real Kinesis producers batch many *user records* into one *Kinesis record*
via the Kinesis Producer Library aggregation format, and every real consumer
must de-aggregate. The format is public (awslabs/amazon-kinesis-producer,
``aggregation-format.md``):

    0xF3 0x89 0x9A 0xC2 | protobuf(AggregatedRecord) | md5(protobuf) [16B]

with the protobuf message::

    message AggregatedRecord {
      repeated string partition_key_table     = 1;
      repeated string explicit_hash_key_table = 2;
      repeated Record records                 = 3;
    }
    message Record {
      required uint64 partition_key_index     = 1;
      optional uint64 explicit_hash_key_index = 2;
      required bytes  data                    = 3;
    }

The reference sidesteps aggregation entirely (ESM ``batchSize(1)``,
infrastructure/src/main/java/com/myorg/KinesisHealthCheckStack.java:157; the
consumer fixture carries exactly one user record per kinesis record,
kinesis-event.json:8), but any consumer pointed at a KPL producer needs this
path. The message is three fields of varints and length-delimited blobs, so
the wire codec is hand-rolled here (~60 lines) — no protobuf dependency,
and byte-compatible with records packed by the real KPL.

De-aggregation follows KCL semantics: a payload without the magic prefix,
with a short/invalid envelope, or with an md5 mismatch is treated as a
plain (non-aggregated) record and passed through unchanged.
"""

from __future__ import annotations

import hashlib

KPL_MAGIC = b"\xf3\x89\x9a\xc2"
_MD5_LEN = 16

# protobuf wire tags for the fields above (field_number << 3 | wire_type)
_AGG_PK_TABLE = (1 << 3) | 2  # length-delimited string
_AGG_EHK_TABLE = (2 << 3) | 2  # length-delimited string
_AGG_RECORD = (3 << 3) | 2  # embedded message
_REC_PK_INDEX = (1 << 3) | 0  # varint
_REC_EHK_INDEX = (2 << 3) | 0  # varint
_REC_DATA = (3 << 3) | 2  # bytes


def _encode_varint(n: int) -> bytes:
    if n < 0:
        raise ValueError("varint must be non-negative")
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _decode_varint(buf: bytes, pos: int) -> tuple[int, int]:
    result = 0
    shift = 0
    while True:
        if pos >= len(buf) or shift > 63:
            raise ValueError("truncated varint")
        b = buf[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not (b & 0x80):
            return result, pos
        shift += 7


def _ld(tag: int, payload: bytes) -> bytes:
    """One length-delimited protobuf field."""
    return _encode_varint(tag) + _encode_varint(len(payload)) + payload


def encode_aggregated(records: list[tuple[str, bytes]]) -> bytes:
    """Pack ``[(partition_key, data), ...]`` into one KPL aggregated record.

    Partition keys are interned into the key table in first-seen order,
    exactly as the KPL does; the envelope is magic + message + md5(message).
    """
    if not records:
        raise ValueError("cannot aggregate zero records")
    key_index: dict[str, int] = {}
    body = bytearray()
    recs = bytearray()
    for pk, data in records:
        if pk not in key_index:
            key_index[pk] = len(key_index)
            body += _ld(_AGG_PK_TABLE, pk.encode("utf-8"))
        rec = (
            _encode_varint(_REC_PK_INDEX)
            + _encode_varint(key_index[pk])
            + _ld(_REC_DATA, bytes(data))
        )
        recs += _ld(_AGG_RECORD, rec)
    message = bytes(body + recs)
    return KPL_MAGIC + message + hashlib.md5(message).digest()


def _decode_record(buf: bytes) -> tuple[int, bytes]:
    """Decode one Record message -> (partition_key_index, data)."""
    pos = 0
    pk_idx: int | None = None
    data: bytes | None = None
    while pos < len(buf):
        tag, pos = _decode_varint(buf, pos)
        if tag == _REC_PK_INDEX:
            pk_idx, pos = _decode_varint(buf, pos)
        elif tag == _REC_EHK_INDEX:
            _, pos = _decode_varint(buf, pos)
        elif tag == _REC_DATA:
            ln, pos = _decode_varint(buf, pos)
            if pos + ln > len(buf):
                raise ValueError("truncated record data")
            data = buf[pos : pos + ln]
            pos += ln
        else:
            raise ValueError(f"unknown Record field tag {tag}")
    if pk_idx is None or data is None:
        raise ValueError("Record missing required fields")
    return pk_idx, data


def decode_aggregated(blob: bytes) -> list[tuple[str, bytes]]:
    """Decode a KPL aggregated record -> ``[(partition_key, data), ...]``.

    Raises ``ValueError`` on anything that is not a checksum-valid KPL
    envelope (callers wanting KCL passthrough semantics use
    :func:`deaggregate`).
    """
    blob = bytes(blob)
    if len(blob) < len(KPL_MAGIC) + _MD5_LEN or not blob.startswith(KPL_MAGIC):
        raise ValueError("not a KPL aggregated record")
    message = blob[len(KPL_MAGIC) : -_MD5_LEN]
    if hashlib.md5(message).digest() != blob[-_MD5_LEN:]:
        raise ValueError("KPL md5 mismatch")
    pk_table: list[str] = []
    out: list[tuple[int, bytes]] = []
    pos = 0
    while pos < len(message):
        tag, pos = _decode_varint(message, pos)
        ln, pos = _decode_varint(message, pos)
        if pos + ln > len(message):
            raise ValueError("truncated field")
        payload = message[pos : pos + ln]
        pos += ln
        if tag == _AGG_PK_TABLE:
            pk_table.append(payload.decode("utf-8"))
        elif tag == _AGG_EHK_TABLE:
            pass  # explicit hash keys unused by this engine
        elif tag == _AGG_RECORD:
            out.append(_decode_record(payload))
        else:
            raise ValueError(f"unknown AggregatedRecord field tag {tag}")
    result = []
    for pk_idx, data in out:
        if pk_idx >= len(pk_table):
            raise ValueError("partition key index out of range")
        result.append((pk_table[pk_idx], data))
    return result


def deaggregate(partition_key: str, blob: bytes) -> list[tuple[str, bytes]]:
    """KCL-semantics de-aggregation: valid KPL envelope -> its user records;
    anything else (no magic, bad checksum, malformed message) -> the record
    itself, unchanged."""
    try:
        return decode_aggregated(blob)
    except ValueError:
        return [(partition_key, bytes(blob))]
