"""CLI runner: execute any registered engine query by name.

    python -m etl_apache_kafka_python_doker_aws_spark.run --list
    python -m etl_apache_kafka_python_doker_aws_spark.run --query a1_pricing_summary [--sf DIR] [--explain] [--n 20]

Prints the result (or the formatted physical plan with --explain) — the
quickest way to eyeball any operator against the fixture data.
"""

from __future__ import annotations

import argparse
import sys
import time


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="etl_apache_kafka_python_doker_aws_spark.run", description=__doc__)
    ap.add_argument("--query", "-q", help="registered query name (see --list)")
    ap.add_argument("--sf", default="/root/testdata/sf0.001", help="fixture dir")
    ap.add_argument("--n", type=int, default=20, help="rows to show")
    ap.add_argument("--explain", action="store_true", help="print the physical plan instead")
    ap.add_argument("--list", action="store_true", help="list registered queries")
    args = ap.parse_args(argv)

    from etl_apache_kafka_python_doker_aws_spark.workloads import ORACLES, QUERIES

    if args.list or not args.query:
        for name in sorted(QUERIES):
            kind = "oracle" if name in ORACLES else "rows-only"
            print(f"{name:32s} {kind}")
        return 0

    if args.query not in QUERIES:
        close = [n for n in sorted(QUERIES) if args.query in n]
        hint = f" — did you mean: {', '.join(close)}?" if close else ""
        print(f"error: unknown query {args.query!r}{hint}", file=sys.stderr)
        return 2

    from etl_apache_kafka_python_doker_aws_spark import get_spark

    spark = get_spark(app_name=f"run-{args.query}")
    t0 = time.perf_counter()
    df = QUERIES[args.query](spark, args.sf)
    if args.explain:
        df.explain("formatted")
    else:
        df.show(args.n, truncate=False)
        print(f"[{args.query}] {time.perf_counter() - t0:.2f}s at {args.sf}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
