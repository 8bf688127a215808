"""PySpark-native stream-health analytics engine.

A from-scratch re-expression of the capabilities of the reference
``aws-samples/amazon-kinesis-data-streams-health-check`` (a serverless Kinesis
canary pipeline: heartbeat producer -> Kinesis -> lag-measuring consumer ->
CloudWatch windowed-max alarm -> SNS), built Spark-first:

- batch cores are pure ``DataFrame -> DataFrame`` functions so every operator
  has a DuckDB-checkable SQL twin,
- streaming lifts the same cores with Structured Streaming (watermarks,
  windowed aggregation, ``applyInPandasWithState`` heartbeat-timeout alarm),
- extension operators (dedup / similarity search / text analysis / multimodal
  plumbing) target large-scale training-data pipelines.

Layout (see SURVEY.md for the reference-derived blueprint):

- ``schemas``    -- StructTypes for every record shape (SURVEY.md section 1)
- ``functions``  -- scalar expression ops P1-P15 (SURVEY.md section 2.3)
- ``operators``  -- relational / alarm / dedup / similarity / text operators
- ``sources``    -- table loaders + kinesis-event shaped sources
- ``plans``      -- named query compositions exported via __spark_entry__
- ``streaming``  -- readStream/writeStream lifts of the batch cores
"""

from __future__ import annotations

from amazon_kinesis_data_streams_health_check_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
