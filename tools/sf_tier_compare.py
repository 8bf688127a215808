"""Measure real sf0.1 -> sf1.0 growth exponents (round-5 verdict item 2).

Runs each requested query (default: the bench headline set plus the rest
of the suffix-array family) at /root/testdata/sf0.1 and at the build_sf1
tier, each timed best-of-N after a JVM warm-up, and reports per query

    exponent = log(t_sf1 / t_sf01) / log(10)

plus output-row growth. Exponent <= ~1 means the plan scales at-or-better
than linearly in data volume across a REAL 10x — the first scale evidence
for this engine above sf0.1. Queries whose runtime is fixed-overhead
dominated at sf0.1 (sub-second) legitimately show exponents near 0.

Usage: python tools/sf_tier_compare.py [--queries a,b,c] [--samples 2]
       (expects /tmp/scale_tier/sf1.0 — run tools/build_sf1.py first)
"""

from __future__ import annotations

import argparse
import json
import math
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from amazon_kinesis_data_streams_health_check_spark.plans.registry import all_queries
from amazon_kinesis_data_streams_health_check_spark.session import get_spark

SF01 = "/root/testdata/sf0.1"
SF1 = "/tmp/scale_tier/sf1.0"
EXTRA = ("exact_substring_scrub", "exact_substring_ingest_probe")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--queries", default="")
    ap.add_argument("--samples", type=int, default=2)
    ap.add_argument("--sf1", default=SF1)
    ap.add_argument(
        "--base",
        default=SF01,
        help="lower tier dir (default sf0.1; pass /tmp/scale_tier/sf1.0 "
        "to measure the sf1.0 -> sf10 second decade)",
    )
    args = ap.parse_args()

    qs = all_queries()
    if args.queries:
        names = [n for n in args.queries.split(",") if n]
    else:
        names = sorted(
            [n for n, q in qs.items() if "bench" in q.tags] + list(EXTRA)
        )
    missing = [n for n in names if n not in qs]
    assert not missing, f"unknown queries: {missing}"
    assert os.path.isdir(args.sf1), f"run tools/build_sf1.py first ({args.sf1})"

    load1_at_start = round(os.getloadavg()[0], 2)
    spark = get_spark(app_name="sf-tier-compare")
    spark.sparkContext.setLogLevel("ERROR")

    base_label = os.path.basename(args.base.rstrip("/"))
    hi_label = os.path.basename(args.sf1.rstrip("/"))
    # Warm the JVM/codegen caches on both dirs before timing anything.
    for d in (args.base, args.sf1):
        qs[names[0]].builder(spark, d).limit(1).collect()

    report: dict[str, dict] = {}
    for name in names:
        try:
            _measure(spark, qs, name, args, base_label, hi_label, report)
        except Exception as e:  # record and keep measuring the rest
            report[name] = {
                "status": "error",
                "error": f"{type(e).__name__}: {e}"[:400],
            }
            print(f"{name}: ERROR {type(e).__name__}: {e}", file=sys.stderr)

    print(
        json.dumps(
            {
                "mult": 10,
                "load1_at_start": load1_at_start,
                "report": report,
            }
        )
    )
    spark.stop()


def _measure(spark, qs, name, args, base_label, hi_label, report) -> None:
    # Row counts ride the timed runs via CollectMetrics (Observation) —
    # re-building and re-executing the plan just to count would roughly
    # double wall-clock per query at the sf100 tier (~30 min legs).
    from pyspark.sql import Observation
    from pyspark.sql import functions as F

    row: dict[str, dict | float] = {"sec": {}, "out_rows": {}}
    for label, d in ((base_label, args.base), (hi_label, args.sf1)):
        best, rows = float("inf"), -1
        for _ in range(max(1, args.samples)):
            obs = Observation()
            t0 = time.perf_counter()
            df = qs[name].builder(spark, d)
            df.observe(obs, F.count(F.lit(1)).alias("rows")).write.format(
                "noop"
            ).mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
            rows = obs.get["rows"]
        row["sec"][label] = round(best, 3)
        row["out_rows"][label] = rows
    t1, t10 = row["sec"][base_label], row["sec"][hi_label]
    r1, r10 = row["out_rows"][base_label], row["out_rows"][hi_label]
    row["runtime_exponent"] = round(math.log(t10 / t1) / math.log(10), 3)
    row["output_exponent"] = round(
        math.log(max(r10, 1) / max(r1, 1)) / math.log(10), 3
    )
    report[name] = row
    print(
        f"{name}: {t1:.2f}s -> {t10:.2f}s  exp={row['runtime_exponent']}"
        f"  rows {r1} -> {r10}",
        file=sys.stderr,
    )


if __name__ == "__main__":
    main()
