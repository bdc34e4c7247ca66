"""Benchmark harness: time every declared query at the bench scale factor.

Prints ONE JSON line:
    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Env:
    SPARK_GRAFT_SF_DIR  parquet dir (default /root/testdata/sf0.1)
    SPARK_GRAFT_CPUS    local[] threads (default 32, read by session.py)
    BENCH_QUERIES       comma-separated subset (default: all registered)
    BENCH_REPEAT        timed repeats per query (default 1; median reported)

Each query is forced to full materialization with a ``noop`` sink write —
every partition is computed and serialized, nothing is collected to the
driver — which is the honest analogue of the reference's end-to-end
"read parquet → write sink" measured path (/root/reference/src/main.rs:51,100).
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from parquet_to_postgres_spark.queries import load_all  # noqa: E402
from parquet_to_postgres_spark.session import get_spark  # noqa: E402


def materialize(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    repeat = int(os.environ.get("BENCH_REPEAT", "1"))
    sf = float(os.path.basename(sf_dir.rstrip("/")).removeprefix("sf") or "0.1")

    specs = load_all()
    subset = os.environ.get("BENCH_QUERIES")
    names = subset.split(",") if subset else sorted(specs)

    spark = get_spark("bench")
    spark.sparkContext.setLogLevel("ERROR")

    # Warm the JVM + parquet footers once so query 1 doesn't pay startup.
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()

    from parquet_to_postgres_spark.checkpoint import (
        persistent_rdd_ids,
        release_rdds,
    )

    sc = spark.sparkContext
    per_query: dict[str, float] = {}
    errors: dict[str, str] = {}
    for name in names:
        samples = []
        pinned_before = persistent_rdd_ids(sc)
        try:
            for _ in range(repeat):
                t0 = time.perf_counter()
                materialize(specs[name].builder(spark, sf_dir))
                samples.append(time.perf_counter() - t0)
        except Exception as exc:  # noqa: BLE001 — one broken query must
            # not zero out the whole benchmark (round-4 lesson: a fixture
            # schema drift aborted bench entirely and the round recorded
            # NO numbers); report it and keep measuring the rest
            errors[name] = f"{type(exc).__name__}: {exc}"[:300]
            continue
        finally:
            # queries that persist intermediates (e.g. minhash profiles,
            # the shared ANN prep) must not leak cache OR checkpoint
            # blocks into later measurements: clearCache drops cached
            # relations, the registry release drops the localCheckpoint
            # blocks clearCache cannot see
            spark.catalog.clearCache()
            release_rdds(sc, persistent_rdd_ids(sc) - pinned_before)
        per_query[name] = round(statistics.median(samples), 3)

    total = round(sum(per_query.values()), 3)
    result = {
        "metric": "declared_queries_total_wall_sec",
        "value": total,
        "unit": "sec",
        "queries": per_query,
        "sf": sf,
    }
    if errors:
        result["errors"] = errors
    print(json.dumps(result))
    return 1 if errors else 0


if __name__ == "__main__":
    raise SystemExit(main())
