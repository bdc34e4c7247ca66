"""Scale probe: run the heavy query family at sf0.1 and at a
synthesized ~sf1 (10x) and report wall-time + shuffle-byte scaling.

The driver ships no sf1 fixtures, so the probe synthesizes one:
each big table is the union of COPIES id-shifted replicas of the sf0.1
table.  Document text gets a per-copy marker token appended, so
cross-copy pairs are NEAR-duplicates (Jaccard just under 1) rather
than exact clones — at 10x every document sits in a 10-member
near-dup clique, which loads the banding join and the connected-
components rounds the way a real crawl's boilerplate families do.
Event user_ids shift per copy so per-user stream density (and the
stream-stream join fan-out) stays constant while volume scales 10x —
the honest scaling shape; sharing user_ids would square the join.

Wall-times at both scales and the ratio go to stdout as one JSON line;
shuffle write bytes come from the Spark UI REST API (enabled just for
this probe).  Record the results in BASELINE.md.

Usage: python tools/scale_probe.py [dst_dir]   (default /tmp/sf1probe)
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from parquet_to_postgres_spark.queries import load_all  # noqa: E402
from parquet_to_postgres_spark.session import get_spark  # noqa: E402

SRC = "/root/testdata/sf0.1"
COPIES = 10
HEAVY = [
    "minhash_near_dup",
    "near_dedup_corpus",
    "ann_topk",
    "stream_stream_join",
    "corpus_preprocess",
    "profile_drift_report",
]
SMALL = ("region", "nation", "customer", "supplier", "part", "orders", "lineitem")


def _write_single_file(df, dst_file: str) -> None:
    """Write a DataFrame as ONE parquet FILE (not a directory) so the
    streaming source's pathGlobFilter('events.parquet') still matches."""
    tmp = dst_file + ".tmpdir"
    df.coalesce(1).write.mode("overwrite").parquet(tmp)
    part = next(
        f for f in os.listdir(tmp) if f.endswith(".parquet")
    )
    shutil.move(os.path.join(tmp, part), dst_file)
    shutil.rmtree(tmp)


def build_scaled(spark, dst: str, copies: int = COPIES) -> None:
    os.makedirs(dst, exist_ok=True)
    for tbl in SMALL:
        shutil.copyfile(f"{SRC}/{tbl}.parquet", f"{dst}/{tbl}.parquet")

    docs = spark.read.parquet(f"{SRC}/documents.parquet")
    doc_copies = [
        docs.select(
            (F.col("doc_id") + F.lit(k * 10_000_000)).alias("doc_id"),
            (
                F.col("text")
                if k == 0
                else F.concat(F.col("text"), F.lit(f" copymark{k}"))
            ).alias("text"),
            *[c for c in docs.columns if c not in ("doc_id", "text")],
        )
        for k in range(copies)
    ]
    scaled_docs = doc_copies[0]
    for c in doc_copies[1:]:
        scaled_docs = scaled_docs.unionByName(c)
    _write_single_file(scaled_docs, f"{dst}/documents.parquet")

    emb = spark.read.parquet(f"{SRC}/embeddings.parquet")
    emb_copies = [
        (emb if k == 0 else emb.where(F.col("vec_id") >= 5)).select(
            (F.col("vec_id") + F.lit(k * 10_000_000)).alias("vec_id"),
            *[c for c in emb.columns if c != "vec_id"],
        )
        for k in range(copies)
    ]
    scaled_emb = emb_copies[0]
    for c in emb_copies[1:]:
        scaled_emb = scaled_emb.unionByName(c)
    _write_single_file(scaled_emb, f"{dst}/embeddings.parquet")

    ev = spark.read.parquet(f"{SRC}/events.parquet")
    ev_copies = [
        ev.select(
            (F.col("event_id") + F.lit(k * 1_000_000_000)).alias("event_id"),
            (F.col("user_id") + F.lit(k * 10_000_000)).alias("user_id"),
            *[c for c in ev.columns if c not in ("event_id", "user_id")],
        )
        for k in range(copies)
    ]
    scaled_ev = ev_copies[0]
    for c in ev_copies[1:]:
        scaled_ev = scaled_ev.unionByName(c)
    _write_single_file(scaled_ev, f"{dst}/events.parquet")


def _shuffle_write_bytes(ui_port: int = 4040) -> int:
    """Total shuffle write bytes across all completed stages."""
    base = f"http://localhost:{ui_port}/api/v1/applications"
    try:
        apps = json.load(urllib.request.urlopen(base, timeout=5))
        app_id = apps[0]["id"]
        stages = json.load(
            urllib.request.urlopen(f"{base}/{app_id}/stages", timeout=10)
        )
        return sum(s.get("shuffleWriteBytes", 0) for s in stages)
    except Exception:
        return -1


def main() -> int:
    dst = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1probe"
    spark = get_spark(
        "scale_probe", extra_conf={"spark.ui.enabled": "true"}
    )
    spark.sparkContext.setLogLevel("ERROR")
    if not os.path.exists(f"{dst}/events.parquet"):
        t0 = time.perf_counter()
        build_scaled(spark, dst)
        print(
            f"# built {dst} in {time.perf_counter() - t0:.1f}s",
            file=sys.stderr,
        )

    specs = load_all()
    out: dict[str, dict] = {}
    for name in HEAVY:
        row = {}
        for label, sf_dir in (("sf0.1", SRC), ("sf1", dst)):
            spark.catalog.clearCache()
            sb0 = _shuffle_write_bytes()
            t0 = time.perf_counter()
            specs[name].builder(spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            row[label] = round(time.perf_counter() - t0, 2)
            sb1 = _shuffle_write_bytes()
            row[f"{label}_shuffle_mb"] = (
                round((sb1 - sb0) / 1e6, 1) if sb0 >= 0 and sb1 >= 0 else None
            )
        row["time_ratio"] = round(row["sf1"] / row["sf0.1"], 2)
        if row.get("sf1_shuffle_mb") and row.get("sf0.1_shuffle_mb"):
            row["shuffle_ratio"] = round(
                row["sf1_shuffle_mb"] / row["sf0.1_shuffle_mb"], 2
            )
        out[name] = row
        print(f"# {name}: {row}", file=sys.stderr)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
