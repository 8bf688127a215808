"""Shared pytest fixtures: one SparkSession per test run.

Small-core local session: tiny fixtures shuffle faster on 4 threads / 8
shuffle partitions than on local[32] (task-launch overhead dominates at
kilobyte scale). bench.py is where the full-core configuration runs.
"""

from __future__ import annotations

import pytest

from amazon_kinesis_data_streams_health_check_spark.session import get_spark

SF_SMALL = "/root/testdata/sf0.001"
SF_ORACLE = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="engine-tests", master="local[4]", shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def sf_small():
    return SF_SMALL


@pytest.fixture(scope="session")
def sf_oracle():
    return SF_ORACLE
