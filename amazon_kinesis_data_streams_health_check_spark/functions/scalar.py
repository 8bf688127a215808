"""Scalar expression operators P1-P15 (SURVEY.md section 2.3).

Every function returns a :class:`pyspark.sql.Column` built exclusively from
built-in ``pyspark.sql.functions`` — JVM-side, inside whole-stage codegen; no
Python UDFs anywhere in this module. Each docstring cites the reference
behavior it re-expresses (file:line into /root/reference).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: ISO-8601 with microsecond precision + 'Z' — Spark's closest analogue of
#: Instant.now().toString() (nanoseconds are not representable in Spark).
ISO_MICROS = "yyyy-MM-dd'T'HH:mm:ss.SSSSSSX"
#: Whole-second ISO-8601 UTC — the consumer's toISO8601UTC truncation
#: (HealthCheckConsumerHandler.java:102-107).
ISO_SECONDS = "yyyy-MM-dd'T'HH:mm:ss'Z'"


# -- P1: current-timestamp generation (HealthCheckProducerHandler.java:49) --
def current_instant_iso() -> Column:
    """ISO-8601 'now' string, microsecond precision, Z suffix.

    Reference: ``Instant.now().toString()`` (HealthCheckProducerHandler.java:49).
    Non-deterministic by nature — never used inside oracle-checked queries;
    deterministic queries inject ``now`` as a parameter (SURVEY.md section 7.4).
    """
    return F.date_format(F.current_timestamp(), ISO_MICROS)


def instant_iso(ts: Column) -> Column:
    """Deterministic variant: format an arbitrary timestamp column as the
    producer would format ``Instant.now()``."""
    return F.date_format(ts, ISO_MICROS)


# -- P2+P3: struct literal -> JSON serialize (HealthCheckProducerHandler.java:50,54) --
def tracer_json(current_instant: Column) -> Column:
    """``{"currentInstant": "<iso>"}`` — Jackson writeValueAsString of the
    singleton map (HealthCheckProducerHandler.java:50,54)."""
    return F.to_json(F.struct(current_instant.alias("currentInstant")))


# -- P4: UTF-8 encode (HealthCheckProducerHandler.java:54) --
def utf8_encode(s: Column) -> Column:
    """string -> BinaryType, the SdkBytes.fromString(json, UTF_8) step."""
    return F.encode(s, "UTF-8")


#: Structurally valid standard base64 (optional padding, no line breaks).
_B64_RE = "^(?:[A-Za-z0-9+/]{4})*(?:[A-Za-z0-9+/]{2}==|[A-Za-z0-9+/]{3}=)?$"


# -- P5: base64 decode (kinesis-event.json:8 -> HealthCheckConsumerHandler.java:65) --
def b64_decode(s: Column) -> Column:
    """Wire base64 text -> payload bytes; malformed input -> NULL.

    Spark's ``unbase64`` throws (JVM Base64 decoder) on structurally invalid
    input regardless of ANSI mode; the reference instead catches and drops the
    record (F4, HealthCheckConsumerHandler.java:87-89). A regex validity gate
    keeps the null-on-corrupt contract while staying inside codegen.
    """
    return F.when(s.rlike(_B64_RE), F.unbase64(s))


def b64_encode(b: Column) -> Column:
    """Inverse (producer->wire leg when synthesizing kinesis events)."""
    return F.base64(b)


# -- P6: UTF-8 decode (HealthCheckConsumerHandler.java:41,65) --
def utf8_decode(b: Column, strict: bool = False) -> Column:
    """bytes -> string.

    Default is permissive: invalid UTF-8 yields NULL, which downstream
    null-out turns into the reference's catch-and-drop of the record
    (F4, HealthCheckConsumerHandler.java:87-89). ``strict=True`` restores
    the raw decoder contract instead (UTF_8.newDecoder() REPORTs on
    malformed input): the first invalid payload fails the job.

    Spark 4's ``decode(..., 'UTF-8')`` throws MALFORMED_CHARACTER_CODING on
    invalid bytes regardless of ANSI mode, so neither semantic can use it
    directly. ``cast(binary AS string)`` is a byte-preserving reinterpret
    that never throws; gating it on ``is_valid_utf8`` gives null-on-invalid
    entirely inside whole-stage codegen — no UDF, no second scan.
    """
    s = b.cast("string")
    if not strict:
        return F.when(F.is_valid_utf8(s), s)  # no otherwise => NULL
    return F.when(b.isNull() | F.is_valid_utf8(s), s).otherwise(
        F.raise_error(F.concat(F.lit("MALFORMED_UTF8_PAYLOAD base64="), F.base64(b)))
    )


# -- P7: JSON path extraction — the disabled-but-correct event-time path
#    (HealthCheckConsumerHandler.java:68) --
def payload_instant(json_str: Column) -> Column:
    """Extract ``$.currentInstant`` from the tracer payload. Malformed JSON or
    a missing key yields NULL (PERMISSIVE stance, F4)."""
    return F.get_json_object(json_str, "$.currentInstant")


# -- P8: ISO-8601 string -> timestamp (HealthCheckConsumerHandler.java:71) --
def parse_instant(s: Column) -> Column:
    """Instant.parse analogue; Spark's default ISO parse accepts the
    second-precision and fractional forms the producer emits. Unparseable
    strings -> NULL (not an exception): F4 swallow parity (holds under ANSI
    mode too via the try_ variant)."""
    return F.try_to_timestamp(s)


# -- P9: timestamp -> ISO-8601 UTC at WHOLE-SECOND precision
#    (HealthCheckConsumerHandler.java:102-107) --
def iso8601_utc_seconds(ts: Column) -> Column:
    """SimpleDateFormat("yyyy-MM-dd'T'HH:mm:ss'Z'") parity — drops sub-second
    precision. The truncation is semantic: lag rounds down to whole seconds
    *before* the subtraction (SURVEY.md section 7.4)."""
    return F.date_format(ts, ISO_SECONDS)


def truncate_to_second(ts: Column) -> Column:
    """The same truncation kept in the timestamp domain (P9 before P11)."""
    return F.date_trunc("second", ts)


# -- P10: epoch seconds -> timestamp (kinesis-event.json:9) --
def epoch_seconds_to_ts(sec: Column) -> Column:
    """approximateArrivalTimestamp (epoch seconds, possibly fractional) ->
    TimestampType."""
    return F.timestamp_seconds(sec)


# -- P11: duration difference in whole seconds (HealthCheckConsumerHandler.java:71) --
def lag_seconds(event_ts: Column, now_ts: Column) -> Column:
    """``Duration.between(parse(ts), now).toSeconds()`` — truncating long.

    ``unix_timestamp`` floors both sides to whole seconds; combined with the
    P9 truncation of ``event_ts`` this reproduces the reference's
    floor-of-arrival-then-subtract semantics exactly (SURVEY.md section 7.4:
    lag is floor-to-second of arrival, not of the difference).
    """
    return F.unix_timestamp(now_ts) - F.unix_timestamp(truncate_to_second(event_ts))


# -- P12: long -> double (HealthCheckConsumerHandler.java:78) --
def as_metric_value(v: Column) -> Column:
    return v.cast("double")


# -- P13: ARN parse (HealthCheckConsumerHandler.java:97-99) --
def stream_name_from_arn(arn: Column) -> Column:
    """``arn.split(":")[5].split("/")[1]`` — resource part after the first '/'.

    element_at is 1-based; index 6 of the ':' split is the resource
    ("stream/<name>"), index 2 of its '/' split is the name. ARNs with extra
    '/' segments keep reference parity: only segment [1] is taken. try_
    variant: a short ARN yields NULL, not an out-of-bounds error (F4 parity).
    """
    return F.try_element_at(F.split(F.try_element_at(F.split(arn, ":"), F.lit(6)), "/"), F.lit(2))


# -- P14: scalar -> string (HealthCheckConsumerHandler.java:85) --
def value_of(v: Column) -> Column:
    return v.cast("string")


# -- P15: constant projections (HealthCheckConsumerHandler.java:73-81) --
def const(name: str, value: str) -> Column:
    return F.lit(value).alias(name)
