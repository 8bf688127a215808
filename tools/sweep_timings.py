#!/usr/bin/env python
"""Time EVERY registry query at $SPARK_GRAFT_SF_DIR (default sf0.1), one
sample each, printing a sorted slowest-first table. A whole-registry smoke +
straggler detector: queries whose runtime is far above the pack are the ones
worth a plan audit before the next round's bench.

    python tools/sweep_timings.py [--skip-streaming]
"""

from __future__ import annotations

import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from amazon_kinesis_data_streams_health_check_spark.plans.registry import all_queries
from amazon_kinesis_data_streams_health_check_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    skip_streaming = "--skip-streaming" in sys.argv
    only = [a for a in sys.argv[1:] if not a.startswith("--")]
    spark = get_spark(app_name="engine-sweep")
    spark.sparkContext.setLogLevel("ERROR")
    timings: dict[str, float] = {}
    failures: dict[str, str] = {}
    for name, q in all_queries().items():
        if only and name not in only:
            continue
        if skip_streaming and "streaming" in q.tags:
            continue
        t0 = time.perf_counter()
        try:
            q.builder(spark, SF_DIR).write.format("noop").mode("overwrite").save()
            timings[name] = time.perf_counter() - t0
        except Exception:
            failures[name] = traceback.format_exc(limit=3)
        print(f"{name}: {time.perf_counter() - t0:.2f}s", file=sys.stderr, flush=True)

    print(f"\n=== {len(timings)} ok, {len(failures)} failed, total {sum(timings.values()):.1f}s ===")
    for name, sec in sorted(timings.items(), key=lambda kv: -kv[1]):
        print(f"{sec:8.2f}  {name}")
    for name, tb in failures.items():
        print(f"\nFAILED {name}\n{tb}")
    spark.stop()


if __name__ == "__main__":
    main()
