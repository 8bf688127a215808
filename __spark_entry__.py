"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash -> CORRECTNESS_r{N}.json).

The actual surface lives in
``amazon_kinesis_data_streams_health_check_spark.plans.registry``; this module
is a thin adapter.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from amazon_kinesis_data_streams_health_check_spark.plans import registry as _registry

ENTRY_SF_DIR = "/root/testdata/sf0.001"
FLAGSHIP = "health_lag_alarm"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return _registry.get(FLAGSHIP).builder(spark, ENTRY_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md section 2."""
    return {name: q.builder for name, q in _registry.all_queries().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB twins for every SQL-expressible query; rows-only ops omitted."""
    return {
        name: q.oracle
        for name, q in _registry.all_queries().items()
        if q.oracle is not None
    }
