"""Benchmark harness: time every declared query at the bench scale factor.

Prints ONE JSON line:
    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...,
     "e2e_etl": {"sink": ..., "sec": ..., "rows": ...}}

Env:
    SPARK_GRAFT_SF_DIR  parquet dir (default /root/testdata/sf0.1)
    SPARK_GRAFT_CPUS    local[] threads (default 32, read by session.py)
    BENCH_QUERIES       comma-separated subset (default: all registered)
    BENCH_REPEAT        timed repeats per query (default 2; min reported
                        for <=2 repeats, median for 3+)
    BENCH_E2E           "0" skips the E2E ETL measurement (default on)
    BENCH_COMPOSITE     "1" adds the 9-stage curate_corpus composite
                        (wall + per-stage funnel) to the JSON (default
                        off so the 50-query budget is unchanged)
    BENCH_HARDEN        "0" disables the r16 measurement hardening
                        (session warm pass + min-of-N top-up repeats
                        for sub-1.5 s queries) and replays the exact
                        r15-and-earlier methodology (default on)

Each query is forced to full materialization with a ``noop`` sink write —
every partition is computed and serialized, nothing is collected to the
driver — which is the honest analogue of the reference's end-to-end
"read parquet → write sink" measured path (/root/reference/src/main.rs:51,100).

Timing policy (round 7): the box is shared, and a single cold run of a
0.3 s query can be inflated 2x by ambient load alone (VERDICT r6 —
eight untouched sub-second queries "regressed" 1.3-1.9x with no code
change).  Default is therefore best-of-2: each query runs twice with
cache/checkpoint blocks released between runs, and the MIN is reported —
robust to one load spike while still paying cold codegen in run 1 (JVM
JIT warmth does carry into run 2; that is documented in BASELINE.md's
protocol and applies identically to every query).  BENCH_REPEAT=3+
switches to the median, matching BASELINE.md's idle-box methodology.

Measurement hardening (round 16, VERDICT r15 item 1 — additions-only,
declared in BASELINE.md):
  1. A session WARM PASS runs before the first timed query: all table
     footers + file bytes (page cache), one synthetic shuffle+broadcast
     aggregate (whole-stage codegen, exchange and broadcast machinery),
     and one tiny mapInPandas with a numpy import (Python worker spawn
     + pandas/numpy import + the Arrow wire — the `multimodal` 9-s
     cold-page-cache signature, and the JIT warmup the alphabetically
     first slot used to absorb).  Nothing the warm pass computes is
     reused by any timed query.
  2. Sub-1.5 s queries are TOPPED UP to at least 4 timed samples and
     report the MIN — one ambient spike can no longer double a
     sub-second row.  Queries >= 1.5 s keep the pre-r16 policy
     unchanged.  The pre-r16 aggregate over the first BENCH_REPEAT
     samples is still emitted as "queries_base" so the old numbers
     remain visible next to the hardened ones.
BENCH_HARDEN=0 disables both and replays the r15 methodology exactly.
Timed-region semantics are unchanged: every sample computes the full
query from the parquet inputs with caches/checkpoints released between
samples.

The E2E ETL measurement is the reference's ONLY instrumented number
(main.rs:51,100 — parquet → Postgres wall-clock): lineitem.parquet is
loaded into a throwaway EMBEDDED PostgreSQL via per-partition COPY
(pg.PostgresCopySink — the reference's actual target engine), falling
back to embedded Derby over JDBC when no postgres toolchain exists.
Server startup/teardown is excluded; the timed span is exactly
read → DDL → bulk write, like the reference's Instant::now() span.
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


# r16 hardening knobs (VERDICT r15 item 1): queries faster than
# FAST_QUERY_SEC get topped up to MIN_FAST_SAMPLES timed samples with
# the MIN reported; everything else keeps the pre-r16 policy.
FAST_QUERY_SEC = 1.5
MIN_FAST_SAMPLES = 4


def warm_session(spark, sf_dir: str) -> None:
    """Untimed session warm pass (r16, VERDICT r15 item 1).

    Pays one-time session costs BEFORE the first timed slot so they stop
    polluting whichever query runs first (ann_topk absorbed JVM/codegen
    warmup for 15 rounds) or first touches the Python boundary
    (multimodal_real_decode read ~9 s cold vs 0.6 s warm after a VM
    restore — Python worker spawn + numpy/pandas imports off a cold
    page cache).  Three legs, none of whose RESULTS any timed query can
    reuse (caches are not involved; this is machinery warmth only):

    - every table's parquet footer + file bytes (page cache; the old
      warm pass read only lineitem),
    - one synthetic shuffle + broadcast-join aggregate over
      ``spark.range`` (whole-stage codegen compiler, exchange and
      broadcast machinery),
    - one tiny ``mapInPandas`` whose body imports numpy (Python worker
      pool + pandas/numpy/Arrow imports; workers are reused afterwards).
    """
    from pyspark.sql import functions as F

    from parquet_to_postgres_spark import TABLES

    for t in TABLES:
        try:
            materialize(spark.read.parquet(f"{sf_dir}/{t}.parquet"))
        except Exception:  # noqa: BLE001 — warmth only, never fail bench
            pass
    small = spark.range(0, 100).select(F.col("id").alias("k"))
    materialize(
        spark.range(0, 200_000)
        .select(F.col("id"), (F.col("id") % 100).alias("k"))
        .join(F.broadcast(small), "k")
        .groupBy("k")
        .agg(F.sum("id").alias("s"))
    )

    def _py_warm(batches):
        import numpy as np  # noqa: F401 — imported for worker warmth
        import pandas as pd  # noqa: F401

        for pdf in batches:
            yield pdf

    materialize(spark.range(0, 1_000).mapInPandas(_py_warm, "id long"))


def run_e2e_etl(spark, sf_dir: str) -> dict:
    """Reference-path E2E: lineitem.parquet → live sink, wall-clock.

    Postgres COPY when the toolchain exists (the engine main.rs targets),
    embedded Derby JDBC otherwise — either way a real database write of
    every row, not a noop.  Returns {"sink", "sec", "rows", "source"}
    or {"error": ...} so a sink failure can't zero out the bench.
    """
    src = f"{sf_dir}/lineitem.parquet"
    try:
        from parquet_to_postgres_spark.etl import JdbcSink, etl
        from parquet_to_postgres_spark.pg import (
            EmbeddedPostgres,
            PostgresCopySink,
            postgres_available,
            run_psql,
        )

        if postgres_available():
            import tempfile

            with tempfile.TemporaryDirectory() as workdir:
                # world-readable so the dropped-privilege postgres user
                # can create its data directory under it
                os.chmod(workdir, 0o777)
                with EmbeddedPostgres(workdir) as pg:
                    sink = PostgresCopySink(
                        conninfo=pg.conninfo(),
                        table="lineitem_e2e",
                        mode="overwrite",
                        num_partitions=8,
                    )
                    t0 = time.perf_counter()
                    etl(spark, src, sink)
                    sec = time.perf_counter() - t0
                    rows = int(
                        run_psql(
                            pg.conninfo(),
                            "SELECT COUNT(*) FROM lineitem_e2e;",
                        ).strip()
                    )
            return {
                "sink": "postgres-copy",
                "sec": round(sec, 3),
                "rows": rows,
                "source": "lineitem.parquet",
            }

        from parquet_to_postgres_spark.queries.etl_q import (
            DERBY_DRIVER,
            derby_url,
        )

        sink = JdbcSink(
            url=derby_url("benche2e"),
            table="lineitem_e2e",
            mode="overwrite",
            num_partitions=8,
            batchsize=10_000,
            options={"driver": DERBY_DRIVER},
        )
        t0 = time.perf_counter()
        etl(spark, src, sink)
        sec = time.perf_counter() - t0
        rows = (
            spark.read.format("jdbc")
            .option("url", derby_url("benche2e"))
            .option("driver", DERBY_DRIVER)
            .option("dbtable", "lineitem_e2e")
            .load()
            .count()
        )
        return {
            "sink": "jdbc-derby",
            "sec": round(sec, 3),
            "rows": int(rows),
            "source": "lineitem.parquet",
        }
    except Exception as exc:  # noqa: BLE001 — never fail the whole bench
        return {"error": f"{type(exc).__name__}: {exc}"[:300]}


def run_composite(spark, sf_dir: str) -> dict:
    """The flagship user journey as ONE tracked number (VERDICT r7
    item 5): curate_corpus over the documents table — normalize → rule
    gate → char-LM gate → span dedup → exact dedup → MinHash near-dedup
    → split assignment → sharded export — wall-clock plus the per-stage
    funnel, so a regression in any stage is driver-visible instead of
    living only in BASELINE.md prose."""
    import tempfile

    try:
        from parquet_to_postgres_spark.llm.pipeline import curate_corpus
        from parquet_to_postgres_spark.tables import load_table

        docs = load_table(spark, sf_dir, "documents")
        # FIXED-WARMTH protocol (r11, VERDICT r10 item 6): the funnel
        # is ~60% Python-worker + JIT warmth, so a single reading
        # varies 33-137 s with whatever ran before it in the session.
        # Run it TWICE and report the second — every round's number is
        # then "one full funnel of warmth" regardless of prior
        # registry passes; the first reading rides along as context.
        walls = []
        for _ in range(2):
            with tempfile.TemporaryDirectory() as d:
                t0 = time.perf_counter()
                cur, report = curate_corpus(docs, out_path=d, max_bpc=8.0)
                walls.append(round(time.perf_counter() - t0, 3))
                stages = dict(report.stages)
                shards = sum(
                    m["__total__"] for m in (report.manifest or {}).values()
                )
                report.release()
        return {
            "sec": walls[1],
            "first_pass_sec": walls[0],
            "stages": stages,
            # manifest is per-split: {"train": {..., "__total__": n}, ...}
            "shards_total": shards,
        }
    except Exception as exc:  # noqa: BLE001 — never fail the whole bench
        return {"error": f"{type(exc).__name__}: {exc}"[:300]}


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    repeat = int(os.environ.get("BENCH_REPEAT", "2"))
    sf = float(os.path.basename(sf_dir.rstrip("/")).removeprefix("sf") or "0.1")

    specs = load_all()
    subset = os.environ.get("BENCH_QUERIES")
    names = subset.split(",") if subset else sorted(specs)

    spark = get_spark("bench")
    spark.sparkContext.setLogLevel("ERROR")

    # The sink marker is a process-global set by the query builder;
    # reset it so a second bench.main() in the same process (tests do
    # this) can't report a stale marker for a run that never executed
    # etl_pg_roundtrip (round-8 review finding).
    from parquet_to_postgres_spark.queries import etl_q

    etl_q.PG_ROUNDTRIP_SINK = None

    # Warm the JVM + parquet footers once so query 1 doesn't pay startup.
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()
    harden = os.environ.get("BENCH_HARDEN", "1") != "0"
    if harden:
        warm_session(spark, sf_dir)

    from parquet_to_postgres_spark.checkpoint import (
        persistent_rdd_ids,
        release_rdds,
    )

    sc = spark.sparkContext
    per_query: dict[str, float] = {}
    per_query_base: dict[str, float] = {}
    errors: dict[str, str] = {}
    for name in names:
        samples = []
        pinned_before = persistent_rdd_ids(sc)
        try:
            def one_sample():
                t0 = time.perf_counter()
                materialize(specs[name].builder(spark, sf_dir))
                samples.append(time.perf_counter() - t0)
                # release BETWEEN repeats too: queries that persist
                # intermediates (minhash profiles, the shared ANN prep)
                # must not hand run 2 a warm cache — every repeat pays
                # the same cold-data cost, only JIT warmth carries over
                spark.catalog.clearCache()
                release_rdds(sc, persistent_rdd_ids(sc) - pinned_before)

            for _ in range(repeat):
                one_sample()
            # pre-r16 aggregate over the base samples, kept visible
            base = round(
                min(samples) if repeat <= 2 else statistics.median(samples),
                3,
            )
            # r16 hardening: top up sub-1.5 s queries to >= 4 samples
            # and report the min — one ambient spike can no longer
            # double a sub-second row (VERDICT r15 item 1).
            if harden and min(samples) < FAST_QUERY_SEC:
                while len(samples) < MIN_FAST_SAMPLES:
                    one_sample()
        except Exception as exc:  # noqa: BLE001 — one broken query must
            # not zero out the whole benchmark (round-4 lesson: a fixture
            # schema drift aborted bench entirely and the round recorded
            # NO numbers); report it and keep measuring the rest
            errors[name] = f"{type(exc).__name__}: {exc}"[:300]
            continue
        finally:
            # belt-and-braces for the exception path
            spark.catalog.clearCache()
            release_rdds(sc, persistent_rdd_ids(sc) - pinned_before)
        per_query_base[name] = base
        if harden and len(samples) > repeat:
            per_query[name] = round(min(samples), 3)
        else:
            per_query[name] = base

    total = round(sum(per_query.values()), 3)
    result = {
        "metric": "declared_queries_total_wall_sec",
        "value": total,
        "unit": "sec",
        "queries": per_query,
        "sf": sf,
    }
    if harden:
        # the pre-r16-policy numbers (first BENCH_REPEAT samples only),
        # kept per the "fix a measurement bug → keep the old numbers
        # too" contract clause
        result["queries_base"] = per_query_base
        result["harden"] = {
            "warm_pass": True,
            "fast_query_sec": FAST_QUERY_SEC,
            "min_fast_samples": MIN_FAST_SAMPLES,
        }
    if os.environ.get("BENCH_E2E", "1") != "0":
        result["e2e_etl"] = run_e2e_etl(spark, sf_dir)
    # Which engine etl_pg_roundtrip actually exercised THIS run (a green
    # gate row on "parquet-fallback" does NOT certify the COPY wire).
    if etl_q.PG_ROUNDTRIP_SINK is not None:
        result["pg_roundtrip_sink"] = etl_q.PG_ROUNDTRIP_SINK
    if os.environ.get("BENCH_COMPOSITE", "0") == "1":
        result["composite"] = run_composite(spark, sf_dir)
    if errors:
        result["errors"] = errors
    print(json.dumps(result))
    return 1 if errors else 0


if __name__ == "__main__":
    raise SystemExit(main())
