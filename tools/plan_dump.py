"""Dump `.explain("formatted")` for every declared query to plans/<dir>/.

Usage:  python tools/plan_dump.py <out_dir> <suffix> [name ...]

Writes plans/<out_dir>/<query>_<suffix>.txt for each declared query (all
50 when no names are given).  Builders run for real (ETL sinks, store
builds, streaming harnesses execute), so the file records the plan the
bench actually times.  Streaming queries return a memory-sink/checkpoint
frame whose plan is a LogicalRDD scan — noted in the header; their
interesting plan lives in the streaming harness, not the returned frame.
"""

from __future__ import annotations

import contextlib
import io
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from parquet_to_postgres_spark.queries import load_all  # noqa: E402
from parquet_to_postgres_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> int:
    out_dir, suffix = sys.argv[1], sys.argv[2]
    names = sys.argv[3:]
    base = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", out_dir)
    os.makedirs(base, exist_ok=True)
    spark = get_spark("plan_dump")
    spark.sparkContext.setLogLevel("ERROR")
    specs = load_all()
    for name in names or list(specs):
        buf = io.StringIO()
        try:
            df = specs[name].builder(spark, SF_DIR)
            with contextlib.redirect_stdout(buf):
                df.explain("formatted")
        except Exception as exc:  # noqa: BLE001
            buf.write(f"ERROR building plan: {type(exc).__name__}: {exc}\n")
        path = os.path.join(base, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(f"# {name} — explain('formatted') at {SF_DIR}\n")
            f.write(buf.getvalue())
        print("wrote", path)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
