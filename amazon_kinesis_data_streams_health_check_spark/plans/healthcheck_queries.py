"""Health-check query surface — the reference pipeline re-expressed batch-first.

The flagship ``health_lag_alarm`` composes the whole alarm path (SURVEY.md
section 7.2): event-time choice (F5) -> P9-truncated lag (P11) -> 1-minute
tumbling MAX per stream dimension (A1/A2) -> dense period grid with
missing=>breaching (F3) -> strict threshold (F2) -> transition detection
(WF2/W6). Deterministic: "now" for each period is the period's own close —
CloudWatch evaluates a period at its end, so no ``current_timestamp()``
appears anywhere (SURVEY.md section 7.4).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from amazon_kinesis_data_streams_health_check_spark.operators.alarm import (
    evaluate_alarm,
    with_period_grid,
)
from amazon_kinesis_data_streams_health_check_spark.operators.lag import (
    staleness_at_window_close,
)
from amazon_kinesis_data_streams_health_check_spark.plans.registry import register
from amazon_kinesis_data_streams_health_check_spark.session import configure_session
from amazon_kinesis_data_streams_health_check_spark.sources.tables import load_table

#: Alarm threshold for the flagship on the driver's ``events`` table. The
#: reference uses 1s against sub-second Kinesis lag (KinesisHealthCheckStack.java:175);
#: against 60s-period staleness the equivalent mid-scale cut is 30s (median of
#: the observed metric), which exercises both states and real transitions.
FLAGSHIP_THRESHOLD = 30.0

_FLAGSHIP_SQL = """
WITH base AS (
  SELECT event_type AS stream_name,
         COALESCE(TRY_CAST(json_extract_string(props, '$.currentInstant') AS TIMESTAMP), ts) AS ev
  FROM events
),
lagged AS (
  SELECT stream_name,
         date_trunc('minute', ev) AS window_start,
         CAST(epoch(date_trunc('minute', ev) + INTERVAL 1 MINUTE) AS BIGINT)
           - CAST(epoch(date_trunc('second', ev)) AS BIGINT) AS lag_seconds
  FROM base
),
metrics AS (
  SELECT stream_name, window_start,
         max(lag_seconds) AS max_value,
         count(*) AS n_datapoints
  FROM lagged GROUP BY 1, 2
),
bounds AS (SELECT min(window_start) AS lo, max(window_start) AS hi FROM metrics),
grid AS (
  SELECT k.stream_name, g.window_start
  FROM (SELECT DISTINCT stream_name FROM metrics) k
  CROSS JOIN (SELECT unnest(generate_series(lo, hi, INTERVAL 1 MINUTE)) AS window_start FROM bounds) g
),
joined AS (
  SELECT g.stream_name, g.window_start,
         g.window_start + INTERVAL 1 MINUTE AS window_end,
         m.max_value,
         COALESCE(m.n_datapoints, 0) AS n_datapoints
  FROM grid g
  LEFT JOIN metrics m
    ON m.stream_name = g.stream_name AND m.window_start = g.window_start
),
states AS (
  SELECT *,
         CASE WHEN max_value IS NULL OR max_value > 30.0 THEN 'ALARM' ELSE 'OK' END AS state
  FROM joined
)
SELECT stream_name, window_start, window_end,
       CAST(max_value AS DOUBLE) AS max_lag,
       n_datapoints,
       state,
       lag(state) OVER w AS prev_state,
       state IS DISTINCT FROM (lag(state) OVER w) AS transitioned
FROM states
WINDOW w AS (PARTITION BY stream_name ORDER BY window_start)
"""


@register(
    "health_lag_alarm",
    oracle=_FLAGSHIP_SQL,
    doc="Flagship: lag metric -> tumbling max -> period grid -> alarm states/transitions",
    tags=("core", "flagship", "bench"),
)
def health_lag_alarm(spark: SparkSession, sf_dir: str) -> DataFrame:
    configure_session(spark)
    events = load_table(spark, sf_dir, "events")
    lagged = staleness_at_window_close(events, ts_col="ts", payload_col="props", key_col="event_type")
    metrics = lagged.groupBy("stream_name", "window_start", "window_end").agg(
        F.max("lag_seconds").alias("max_value"),
        F.count(F.lit(1)).alias("n_datapoints"),
    )
    gridded = with_period_grid(metrics)
    alerts = evaluate_alarm(gridded, threshold=FLAGSHIP_THRESHOLD, treat_missing="breaching")
    return alerts.select(
        "stream_name",
        "window_start",
        "window_end",
        F.col("max_value").cast("double").alias("max_lag"),
        "n_datapoints",
        "state",
        "prev_state",
        "transitioned",
    )
