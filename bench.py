#!/usr/bin/env python
"""Benchmark harness (driver contract).

Runs the headline queries (registry tag "bench") at ``$SPARK_GRAFT_SF_DIR``
(default /root/testdata/sf0.1) on ``local[$SPARK_GRAFT_CPUS]`` and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is materialized with a noop write (computes every column — a
count() would let Catalyst prune the projection and undercount the work).

Noise control: each query is timed twice and the BEST sample is reported —
single samples on a shared machine have swung 1.8x with concurrent load
(round-2 postmortem), which buries real round-over-round signal. The
1-minute load average at start is recorded in the JSON (and warned about on
stderr) so a contaminated run is identifiable after the fact.
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
SAMPLES = int(os.environ.get("SPARK_GRAFT_BENCH_SAMPLES", "2"))


def sf_of(path: str) -> float:
    m = re.search(r"sf([0-9.]+)", path)
    return float(m.group(1)) if m else -1.0


def main() -> None:
    try:
        load1 = round(os.getloadavg()[0], 2)
    except OSError:  # platform without getloadavg
        load1 = -1.0
    ncpu = os.cpu_count() or 1
    if load1 > 0.5 * ncpu:
        print(
            f"bench: WARNING load avg {load1} on {ncpu} cpus — "
            "timings will be contaminated by concurrent work",
            file=sys.stderr,
        )

    spark = get_spark(app_name="engine-bench")
    spark.sparkContext.setLogLevel("ERROR")
    queries = {n: q for n, q in all_queries().items() if "bench" in q.tags}

    # Warm the JVM / parquet footer caches once so per-query timings measure
    # the plan, not session startup.
    next(iter(queries.values())).builder(spark, SF_DIR).limit(1).collect()

    timings: dict[str, float] = {}
    for name, q in sorted(queries.items()):
        best = float("inf")
        for _ in range(max(1, SAMPLES)):
            t0 = time.perf_counter()
            df = q.builder(spark, SF_DIR)
            df.write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
        timings[name] = round(best, 3)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline-queries-total-sec",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf_of(SF_DIR),
                "samples_per_query": max(1, SAMPLES),
                "load1_at_start": load1,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
