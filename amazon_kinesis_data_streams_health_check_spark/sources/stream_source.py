"""Streaming source selection: production Kinesis connector with hermetic
file-stream fallback.

The production deployment reads the health-check stream through a Kinesis
Structured Streaming connector (SURVEY.md S2: the Event Source Mapping
analogue, KinesisHealthCheckStack.java:149-162). No connector ships in this
environment, so the factory degrades explicitly: callers either pass a
connector format they have on the classpath (e.g. the spark-sql-kinesis
``kinesis`` format or the AWS ``aws-kinesis`` format) or use the file-stream
adapter that tests and backfills use (same downstream schema either way).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from amazon_kinesis_data_streams_health_check_spark.schemas import (
    KINESIS_EVENT_SCHEMA_PERMISSIVE,
)

#: Connector formats tried in order when none is specified.
KINESIS_FORMATS = ("aws-kinesis", "kinesis")


def open_kinesis_stream(
    spark: SparkSession,
    stream_name: str,
    region: str = "us-east-1",
    starting_position: str = "LATEST",
    connector_format: str | None = None,
) -> DataFrame:
    """readStream from a Kinesis connector (W2: startingposition=LATEST is
    the reference's no-replay semantics, KinesisHealthCheckStack.java:160).

    Raises RuntimeError with a clear message when no connector is on the
    classpath — use :func:`open_file_stream` for hermetic runs.
    """
    formats = (connector_format,) if connector_format else KINESIS_FORMATS
    last_err: Exception | None = None
    for fmt in formats:
        try:
            return (
                spark.readStream.format(fmt)
                .option("streamName", stream_name)
                .option("region", region)
                .option("startingposition", starting_position)
                .load()
            )
        except Exception as e:  # connector jar absent / option mismatch
            last_err = e
    raise RuntimeError(
        "no Kinesis streaming connector available on the classpath (tried "
        f"{', '.join(formats)}); run with --packages for a connector, or use "
        "open_file_stream() for the hermetic kinesis-event JSON path"
    ) from last_err


def open_file_stream(
    spark: SparkSession, events_dir: str, max_files_per_trigger: int = 1
) -> DataFrame:
    """Hermetic S2 stand-in: kinesis-event JSON file stream with
    ``maxFilesPerTrigger=1`` reproducing ESM batchSize=1
    (KinesisHealthCheckStack.java:157). Same schema as the connector path
    after normalization, so every downstream operator is source-agnostic."""
    return (
        spark.readStream.schema(KINESIS_EVENT_SCHEMA_PERMISSIVE)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .option("mode", "PERMISSIVE")
        .json(events_dir)
    )
