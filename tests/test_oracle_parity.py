"""The correctness gate, run locally: every registered query with an oracle
must match DuckDB exactly at sf0.001 (fast) — the driver repeats this at
sf0.01."""

from __future__ import annotations

import pytest

from amazon_kinesis_data_streams_health_check_spark.plans.registry import all_queries
from tests.parity import compare

QUERIES = all_queries()
WITH_ORACLE = sorted(n for n, q in QUERIES.items() if q.oracle is not None)
ROWS_ONLY = sorted(n for n, q in QUERIES.items() if q.oracle is None)


@pytest.mark.parametrize("name", WITH_ORACLE)
def test_oracle_parity_small(spark, sf_small, name):
    q = QUERIES[name]
    compare(q.builder(spark, sf_small), q.oracle, sf_small)


@pytest.mark.slow
@pytest.mark.parametrize("name", WITH_ORACLE)
def test_oracle_parity_sf001(spark, sf_oracle, name):
    q = QUERIES[name]
    compare(q.builder(spark, sf_oracle), q.oracle, sf_oracle)


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_queries_run(spark, sf_small, name):
    q = QUERIES[name]
    df = q.builder(spark, sf_small)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0
