"""Command-line surface: inspect and run the registry without writing code.

    python -m amazon_kinesis_data_streams_health_check_spark list [--tag TAG]
    python -m amazon_kinesis_data_streams_health_check_spark run NAME [--sf-dir DIR] [--limit N]
    python -m amazon_kinesis_data_streams_health_check_spark explain NAME [--sf-dir DIR]
    python -m amazon_kinesis_data_streams_health_check_spark oracle NAME

``run`` prints the result as Spark's tabular ``show`` (first ``--limit``
rows, default 20); ``explain`` prints the formatted physical plan —
the same artifact the plan-pin tests assert on; ``oracle`` prints the
query's DuckDB twin SQL (empty exit 1 for rows-only queries).
"""

from __future__ import annotations

import argparse
import os
import sys


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="amazon_kinesis_data_streams_health_check_spark")
    sub = p.add_subparsers(dest="cmd", required=True)

    lp = sub.add_parser("list", help="list registered queries")
    lp.add_argument("--tag", default=None, help="filter by tag")

    for c in ("run", "explain"):
        cp = sub.add_parser(c)
        cp.add_argument("name")
        cp.add_argument(
            "--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
        )
        if c == "run":
            cp.add_argument("--limit", type=int, default=20)

    op = sub.add_parser("oracle")
    op.add_argument("name")

    args = p.parse_args(argv)

    from amazon_kinesis_data_streams_health_check_spark.plans.registry import all_queries

    queries = all_queries()

    if args.cmd == "list":
        for name, q in queries.items():
            if args.tag and args.tag not in q.tags:
                continue
            oracle = "oracle" if q.oracle else "rows-only"
            print(f"{name:40s} [{', '.join(q.tags)}] ({oracle})")
        return 0

    if args.name not in queries:
        print(f"unknown query: {args.name}", file=sys.stderr)
        return 2
    q = queries[args.name]

    if args.cmd == "oracle":
        if not q.oracle:
            print(f"{args.name} is rows-only (no SQL twin)", file=sys.stderr)
            return 1
        print(q.oracle.strip())
        return 0

    from amazon_kinesis_data_streams_health_check_spark.session import get_spark

    spark = get_spark(app_name=f"engine-{args.cmd}-{args.name}")
    spark.sparkContext.setLogLevel("ERROR")
    df = q.builder(spark, args.sf_dir)
    if args.cmd == "explain":
        print(
            df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        )
    else:
        df.show(args.limit, truncate=False)
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
