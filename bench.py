#!/usr/bin/env python
"""Benchmark harness (driver contract).

Runs the headline queries (registry tag "bench") at ``$SPARK_GRAFT_SF_DIR``
(default /root/testdata/sf0.1) on ``local[$SPARK_GRAFT_CPUS]`` and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is materialized with a noop write (computes every column — a
count() would let Catalyst prune the projection and undercount the work).
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from amazon_kinesis_data_streams_health_check_spark.plans.registry import all_queries
from amazon_kinesis_data_streams_health_check_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def sf_of(path: str) -> float:
    m = re.search(r"sf([0-9.]+)", path)
    return float(m.group(1)) if m else -1.0


def main() -> None:
    spark = get_spark(app_name="engine-bench")
    spark.sparkContext.setLogLevel("ERROR")
    queries = {n: q for n, q in all_queries().items() if "bench" in q.tags}

    # Warm the JVM / parquet footer caches once so per-query timings measure
    # the plan, not session startup.
    next(iter(queries.values())).builder(spark, SF_DIR).limit(1).collect()

    timings: dict[str, float] = {}
    for name, q in sorted(queries.items()):
        t0 = time.perf_counter()
        df = q.builder(spark, SF_DIR)
        df.write.format("noop").mode("overwrite").save()
        timings[name] = round(time.perf_counter() - t0, 3)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline-queries-total-sec",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf_of(SF_DIR),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
