"""Run any declared query by name and show its result (and optionally
its physical plan) — the quickest way to explore the engine.

Usage:
    python tools/run_query.py                       # list query names
    python tools/run_query.py pricing_summary       # run at sf0.001
    python tools/run_query.py ann_topk /root/testdata/sf0.01 --rows 20
    python tools/run_query.py ann_topk --explain
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from parquet_to_postgres_spark.queries import load_all  # noqa: E402
from parquet_to_postgres_spark.session import get_spark  # noqa: E402


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("name", nargs="?", help="query name (omit to list)")
    ap.add_argument(
        "sf_dir", nargs="?", default="/root/testdata/sf0.001",
        help="table directory (default sf0.001)",
    )
    ap.add_argument("--rows", type=int, default=10, help="rows to show")
    ap.add_argument(
        "--explain", action="store_true", help="print the formatted plan"
    )
    args = ap.parse_args(argv)

    specs = load_all()
    if not args.name:
        for name in sorted(specs):
            tags = ",".join(specs[name].tags)
            print(f"{name:32s} [{tags}]")
        return 0
    if args.name not in specs:
        print(f"unknown query {args.name!r}; run with no args to list",
              file=sys.stderr)
        return 2

    spark = get_spark("run_query")
    spark.sparkContext.setLogLevel("ERROR")
    t0 = time.perf_counter()
    df = specs[args.name].builder(spark, args.sf_dir)
    if args.explain:
        df.explain(mode="formatted")
    df.show(args.rows, truncate=40)
    print(f"({df.count()} rows, {time.perf_counter() - t0:.2f}s)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
