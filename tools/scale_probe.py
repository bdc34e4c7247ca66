"""Scale probe: run the heavy query families at sf0.1 and at a
synthesized ~sf1 (10x) and report wall-time + shuffle-byte scaling,
plus a skewed-key resilience section.

The driver ships no sf1 fixtures, so the probe synthesizes one:
each big table is the union of COPIES id-shifted replicas of the sf0.1
table.  Shapes per table:

- documents: text gets a per-copy marker token appended, so cross-copy
  pairs are NEAR-duplicates (Jaccard just under 1) — at 10x every
  document sits in a 10-member near-dup clique, which loads the banding
  join and the connected-components rounds the way a real crawl's
  boilerplate families do.
- events: user_ids shift per copy so per-user stream density (and the
  stream-stream join fan-out) stays constant while volume scales 10x —
  the honest scaling shape; sharing user_ids would square the join.
- orders + lineitem: orderkeys shift IN SYNC (the join keys must keep
  matching); o_custkey is NOT shifted, so the dimension tables stay
  fixed-size and per-customer order density grows 10x — how a real fact
  table grows against stable dims.  This gives `join_star_revenue`,
  `cube_orders` and `profile_drift_report` real scaling curves (round-5
  caveat: they were fixed-input before).

Skew section: a second variant of the 10x data remaps a zipf-style hot
key — ~30%% of events onto ONE user_id, ~30%% of orders onto ONE
o_custkey — and re-runs the skew-sensitive queries.  What "passing"
looks like: wall-time on the skewed variant stays near the uniform 10x
time (the salted two-stage agg and AQE skew-join splitting are doing
their jobs), instead of degrading toward one-reducer serialization.

Wall-times at both scales and the ratios go to stdout as one JSON line;
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
# bump when build_scaled/build_skewed change shape: a stale probe dir
# otherwise silently measures the OLD synthesis (an existing-file check
# can't tell a replicated table from round-5's straight copy)
BUILD_VERSION = 2
HEAVY = [
    "minhash_near_dup",
    "near_dedup_corpus",
    "ann_topk",
    "stream_stream_join",
    "corpus_preprocess",
    "profile_drift_report",
    "join_star_revenue",
    "cube_orders",
    "window_rank_analytic",
    "salted_user_totals",
    # r12 addition: the bloom prefilter's scan-side probe runs over the
    # SCALED orders fact (the build side, customer, stays in SMALL —
    # which is the operator's own asymmetry: fixed bitmap, growing
    # fact).  fuzzy_name_pairs is NOT probed: its only input is the
    # unscaled customer table, so its "ratio" would measure nothing.
    "bloom_semi_reduction",
    # r13 additions — the analytics family.  funnel/retention are
    # user-grain (the synthesis grows users 10x at constant per-user
    # density, so linear wall+shuffle is the honest passing shape);
    # sketch_rollup's merged grain is (day, event_type) — FIXED under
    # the synthesis — so its shuffle should stay near-flat while the
    # input scales 10x (the pre-aggregation contract, same asymmetry
    # as bloom's fixed bitmap).
    "funnel_counts",
    "retention_cohorts",
    "attribution_linear",
    "sketch_rollup_merge",
    # r13b: the census + quantile cubes.  frequent_items is the
    # zero-shuffle scan (shuffle should read ~0 at both scales);
    # qsketch's exchange is (keys, sign, bucket)-grain — bounded by
    # the VALUE RANGE, so near-flat under 10x rows.
    "frequent_items_census",
    "qsketch_rollup_merge",
    # r14: KMV set-op cardinalities — k·P-bounded build shuffle
    # (WindowGroupLimit prune), near-flat expected at 10x
    "kmv_set_ops",
]
# skew-sensitive queries re-run on the hot-key variant.  funnel_counts
# is included DELIBERATELY: its per-user collect+fold holds one user's
# whole event list in a task (the documented sessionize-family caveat),
# and the hot-key variant (~30% of events on ONE user) measures that
# caveat instead of asserting it.
SKEWED = [
    "salted_user_totals",
    "join_star_revenue",
    "funnel_counts",
    # r15 (VERDICT r14 item 3): the KMV hot-MEMBER caveat measured, not
    # just documented — the hot-user events variant puts ~30% of one
    # cell's rows on one member, so every same-task copy of that member
    # whose hash lands in the cell's min-k ships across the exchange
    # (rows-per-task-bounded, not k-bounded, in the dense_rank regime).
    "kmv_set_ops",
]
SMALL = ("region", "nation", "customer", "supplier", "part")


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


def _replicated(df, shifts: dict[str, int], copies: int):
    """Union of `copies` id-shifted replicas; `shifts` maps column ->
    per-copy offset (join keys that must keep matching get the SAME
    offset in both tables)."""
    parts = [
        df.select(
            *[
                (F.col(c) + F.lit(k * shifts[c])).alias(c)
                if c in shifts
                else F.col(c)
                for c in df.columns
            ]
        )
        for k in range(copies)
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


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
    _write_single_file(
        _replicated(
            ev, {"event_id": 1_000_000_000, "user_id": 10_000_000}, copies
        ),
        f"{dst}/events.parquet",
    )

    # facts grow, dims stay fixed: orderkeys shift in sync across
    # orders+lineitem; custkey/partkey/suppkey keep their original range
    orders = spark.read.parquet(f"{SRC}/orders.parquet")
    _write_single_file(
        _replicated(orders, {"o_orderkey": 100_000_000}, copies),
        f"{dst}/orders.parquet",
    )
    li = spark.read.parquet(f"{SRC}/lineitem.parquet")
    _write_single_file(
        _replicated(li, {"l_orderkey": 100_000_000}, copies),
        f"{dst}/lineitem.parquet",
    )


def build_skewed(spark, scaled: str, dst: str) -> None:
    """Hot-key variant of the 10x dir: ~30%% of events collapse onto one
    user_id and ~30%% of orders onto one o_custkey (deterministic row
    selection by id mod 10 < 3).  Everything else is a symlink — same
    bytes, same stats, only the key distribution changes."""
    os.makedirs(dst, exist_ok=True)
    for tbl in (*SMALL, "documents", "embeddings", "lineitem"):
        link = f"{dst}/{tbl}.parquet"
        if not os.path.exists(link):
            os.symlink(f"{scaled}/{tbl}.parquet", link)

    ev = spark.read.parquet(f"{scaled}/events.parquet")
    hot_user = ev.selectExpr("min(user_id) AS m").collect()[0]["m"]
    _write_single_file(
        ev.withColumn(
            "user_id",
            F.when(
                F.pmod(F.col("event_id"), F.lit(10)) < 3, F.lit(hot_user)
            ).otherwise(F.col("user_id")),
        ),
        f"{dst}/events.parquet",
    )

    orders = spark.read.parquet(f"{scaled}/orders.parquet")
    hot_cust = orders.selectExpr("min(o_custkey) AS m").collect()[0]["m"]
    _write_single_file(
        orders.withColumn(
            "o_custkey",
            F.when(
                F.pmod(F.col("o_orderkey"), F.lit(10)) < 3, F.lit(hot_cust)
            ).otherwise(F.col("o_custkey")),
        ),
        f"{dst}/orders.parquet",
    )


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


def _timed(spark, spec, sf_dir: str) -> tuple[float, float | None]:
    spark.catalog.clearCache()
    sb0 = _shuffle_write_bytes()
    t0 = time.perf_counter()
    spec.builder(spark, sf_dir).write.format("noop").mode("overwrite").save()
    wall = round(time.perf_counter() - t0, 2)
    sb1 = _shuffle_write_bytes()
    mb = round((sb1 - sb0) / 1e6, 1) if sb0 >= 0 and sb1 >= 0 else None
    return wall, mb


def main() -> int:
    dst = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1probe"
    skew_dst = f"{dst}_skew"
    spark = get_spark(
        "scale_probe", extra_conf={"spark.ui.enabled": "true"}
    )
    spark.sparkContext.setLogLevel("ERROR")
    meta = {"version": BUILD_VERSION, "copies": COPIES, "src": SRC}
    meta_path = f"{dst}/_PROBE_META.json"
    stale = True
    if os.path.exists(meta_path):
        try:
            stale = json.load(open(meta_path)) != meta
        except Exception:
            stale = True
    if stale:
        for d in (dst, skew_dst):
            if os.path.exists(d):
                shutil.rmtree(d)
        t0 = time.perf_counter()
        build_scaled(spark, dst)
        print(
            f"# built {dst} in {time.perf_counter() - t0:.1f}s",
            file=sys.stderr,
        )
        t0 = time.perf_counter()
        build_skewed(spark, dst, skew_dst)
        print(
            f"# built {skew_dst} in {time.perf_counter() - t0:.1f}s",
            file=sys.stderr,
        )
        json.dump(meta, open(meta_path, "w"))

    specs = load_all()
    # cube_orders rotated out of the 50-slot registry in r12 but stays
    # the probe's CUBE+count-distinct heavy; resolve it directly so the
    # measurement series in BASELINE.md keeps its subject.
    from types import SimpleNamespace

    from parquet_to_postgres_spark.queries.aggregates_q import cube_orders

    specs = dict(specs)
    specs.setdefault("cube_orders", SimpleNamespace(builder=cube_orders))

    # r14: salted_user_totals rotated off the declared gate but its
    # hot-key probe (SKEWED) keeps measuring the salting machinery
    from parquet_to_postgres_spark.queries.aggregates_q import salted_user_totals

    specs.setdefault(
        "salted_user_totals", SimpleNamespace(builder=salted_user_totals)
    )

    # r13: attribution + sketch rollup are library operators (pytest
    # oracles, not declared queries) — probe them through direct
    # builders at the same fixture surface.
    from parquet_to_postgres_spark.operators import (
        attribution_report,
        sketch_estimate,
        sketch_merge,
        sketch_rollup,
    )
    from parquet_to_postgres_spark.tables import load_table

    def _attribution_probe(spark, sf_dir):
        events = load_table(spark, sf_dir, "events")
        return attribution_report(
            events, "user_id", "ts", "event_type", "purchase",
            ["click", "view", "signup"], model="linear",
            lookback_seconds=3600,
        )

    def _sketch_probe(spark, sf_dir):
        events = load_table(spark, sf_dir, "events")
        daily = sketch_rollup(
            events.withColumn("day", F.to_date("ts")),
            ["day", "event_type"],
            "user_id",
        )
        return sketch_estimate(sketch_merge(daily, ["event_type"]))

    specs["attribution_linear"] = SimpleNamespace(builder=_attribution_probe)
    specs["sketch_rollup_merge"] = SimpleNamespace(builder=_sketch_probe)

    from parquet_to_postgres_spark.operators import (
        frequent_items,
        qsketch_merge,
        qsketch_quantiles,
        qsketch_rollup,
    )

    def _frequent_probe(spark, sf_dir):
        events = load_table(spark, sf_dir, "events")
        return frequent_items(events, "user_id", k=64)

    def _qsketch_probe(spark, sf_dir):
        events = load_table(spark, sf_dir, "events")
        daily = qsketch_rollup(
            events.withColumn("day", F.to_date("ts")),
            ["day", "event_type"],
            "value",
        )
        return qsketch_quantiles(
            qsketch_merge(daily, ["event_type"]), [0.5, 0.99]
        ).drop("entries")

    specs["frequent_items_census"] = SimpleNamespace(builder=_frequent_probe)
    specs["qsketch_rollup_merge"] = SimpleNamespace(builder=_qsketch_probe)

    # r14: KMV set-operation cardinalities.  The min-k prune plans as
    # WindowGroupLimit, so the build shuffle is k·P-bounded — the
    # probe should show near-flat shuffle under 10x rows (distinct
    # users also grow 10x under the synthesis, but only k hashes ride
    # per cell).
    from parquet_to_postgres_spark.operators import (
        kmv_rollup,
        kmv_set_cardinalities,
    )

    def _kmv_probe(spark, sf_dir):
        events = load_table(spark, sf_dir, "events").withColumn(
            "day", F.to_date("ts")
        )
        a = kmv_rollup(
            events.where(F.col("event_type") == "signup"), ["day"], "user_id"
        )
        b = kmv_rollup(
            events.where(F.col("event_type") == "purchase"), ["day"], "user_id"
        )
        return kmv_set_cardinalities(a, b, ["day"])

    specs["kmv_set_ops"] = SimpleNamespace(builder=_kmv_probe)
    out: dict[str, dict] = {}
    for name in HEAVY:
        row = {}
        for label, sf_dir in (("sf0.1", SRC), ("sf1", dst)):
            wall, mb = _timed(spark, specs[name], sf_dir)
            row[label] = wall
            row[f"{label}_shuffle_mb"] = mb
        row["time_ratio"] = round(row["sf1"] / row["sf0.1"], 2)
        if row.get("sf1_shuffle_mb") and row.get("sf0.1_shuffle_mb"):
            row["shuffle_ratio"] = round(
                row["sf1_shuffle_mb"] / row["sf0.1_shuffle_mb"], 2
            )
        out[name] = row
        print(f"# {name}: {row}", file=sys.stderr)

    skew: dict[str, dict] = {}
    for name in SKEWED:
        wall, mb = _timed(spark, specs[name], skew_dst)
        uniform = out[name]["sf1"]
        skew[name] = {
            "sf1_uniform": uniform,
            "sf1_skewed": wall,
            "skew_penalty": round(wall / uniform, 2) if uniform else None,
            "sf1_skewed_shuffle_mb": mb,
        }
        print(f"# skew {name}: {skew[name]}", file=sys.stderr)
    out["_skew"] = skew

    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
