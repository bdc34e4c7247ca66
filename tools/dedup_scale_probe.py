"""Dedup-family scale probe at CONSTANT duplicate rate (round-7 item 5).

The sf1 probe (tools/scale_probe.py) appends a per-copy marker to every
document, so all 10 copies of a document form a NEAR-dup clique: 10x
data injects 45x candidate pairs per document family, and the measured
15-18x shuffle growth mixes semantic pair growth into the corpus-growth
curve.  This probe separates the two axes by holding the duplicate rate
constant as the corpus scales:

- copy 0 is the sf0.1 documents table verbatim;
- copy k>0 passes ``text`` through a copy-specific random SUBSTITUTION
  CIPHER (``F.translate`` over [a-zA-Z0-9] with a seeded permutation).
  A bijection on characters preserves char-shingle equality WITHIN the
  copy exactly — every near-dup pair of sf0.1 reappears once per copy,
  so true pairs grow linearly with corpus size — while two different
  permutations agree on ~1/26 of letters, so cross-copy shingle overlap
  is ~(1/26)^5 ~ 0 and no cross-copy candidates form.  (``translate``
  is also length-preserving, so ``n_chars`` stays consistent and the
  catalog drift guard sees the original schema.)

What "passing" looks like: wall-clock and shuffle bytes for
``minhash_near_dup`` / ``near_dedup_corpus`` grow ~linearly in the
multiplier (signature job is one keyed shuffle over shingles; banding
candidates track the now-linear true-pair count), and the reported pair
count is ~multiplier x the sf0.1 pair count.  Super-linear shuffle here
would indicate corpus^2 behavior that the clique-dense sf1 probe could
not distinguish from injected pair growth.

Usage:  python tools/dedup_scale_probe.py [dst_root]
Env:    DEDUP_PROBE_MULTIPLIERS   comma ints, default "10,30,100"
        (100 x sf0.1 = sf10 — ~500k docs, the decade the verdict asked
        for; drop to "10,30" on a loaded box)

Results are recorded in BASELINE.md.
"""

from __future__ import annotations

import json
import os
import random
import shutil
import string
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from parquet_to_postgres_spark.checkpoint import (  # noqa: E402
    persistent_rdd_ids,
    release_rdds,
)
from parquet_to_postgres_spark.queries import load_all  # noqa: E402
from parquet_to_postgres_spark.session import get_spark  # noqa: E402

SRC = "/root/testdata/sf0.1"
QUERIES = ("minhash_near_dup", "near_dedup_corpus")
ALPHABET = string.ascii_lowercase + string.ascii_uppercase + string.digits
BUILD_VERSION = 1
TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "embeddings",
)


def cipher_for_copy(k: int) -> str | None:
    """Deterministic per-copy permutation of [a-z][A-Z][0-9]; each class
    permutes within itself so case/digit structure is preserved."""
    if k == 0:
        return None
    rng = random.Random(0xD5A1 + k)

    def perm(s: str) -> str:
        chars = list(s)
        rng.shuffle(chars)
        return "".join(chars)

    return (
        perm(string.ascii_lowercase)
        + perm(string.ascii_uppercase)
        + perm(string.digits)
    )


def build_constant_rate(spark, dst: str, copies: int) -> None:
    """documents.parquet = `copies` cipher-distinct replicas; every other
    table symlinks to sf0.1 (the dedup family only reads documents)."""
    os.makedirs(dst, exist_ok=True)
    for tbl in TABLES:
        link = f"{dst}/{tbl}.parquet"
        if not os.path.exists(link):
            os.symlink(f"{SRC}/{tbl}.parquet", link)

    docs = spark.read.parquet(f"{SRC}/documents.parquet")
    rest = [c for c in docs.columns if c not in ("doc_id", "text")]
    parts = []
    for k in range(copies):
        mapping = cipher_for_copy(k)
        text = (
            F.col("text")
            if mapping is None
            else F.translate(F.col("text"), ALPHABET, mapping)
        )
        parts.append(
            docs.select(
                (F.col("doc_id") + F.lit(k * 10_000_000)).alias("doc_id"),
                text.alias("text"),
                *rest,
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    # one file, like the driver fixtures (coalesce is fine: <200 MB even
    # at 100x, and the build is one-time)
    tmp = f"{dst}/documents.parquet.tmpdir"
    out.coalesce(1).write.mode("overwrite").parquet(tmp)
    part_file = next(f for f in os.listdir(tmp) if f.endswith(".parquet"))
    shutil.move(os.path.join(tmp, part_file), f"{dst}/documents.parquet")
    shutil.rmtree(tmp)


def _shuffle_write_bytes(ui_port: int = 4040) -> int:
    import urllib.request

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


def run_probe(spark, spec, sf_dir: str) -> dict:
    sc = spark.sparkContext
    pinned = persistent_rdd_ids(sc)
    spark.catalog.clearCache()
    sb0 = _shuffle_write_bytes()
    t0 = time.perf_counter()
    spec.builder(spark, sf_dir).write.format("noop").mode("overwrite").save()
    wall = round(time.perf_counter() - t0, 2)
    sb1 = _shuffle_write_bytes()
    # pair/row count in a second pass (untimed — the semantic-growth axis)
    rows = spec.builder(spark, sf_dir).count()
    spark.catalog.clearCache()
    release_rdds(sc, persistent_rdd_ids(sc) - pinned)
    return {
        "sec": wall,
        "shuffle_mb": round((sb1 - sb0) / 1e6, 1) if sb0 >= 0 and sb1 >= 0 else None,
        "rows": int(rows),
    }


def main() -> int:
    dst_root = sys.argv[1] if len(sys.argv) > 1 else "/tmp/dedupdecade"
    multipliers = [
        int(m)
        for m in os.environ.get(
            "DEDUP_PROBE_MULTIPLIERS", "10,30,100"
        ).split(",")
    ]
    spark = get_spark(
        "dedup_scale_probe", extra_conf={"spark.ui.enabled": "true"}
    )
    spark.sparkContext.setLogLevel("ERROR")
    specs = load_all()

    dirs: dict[int, str] = {1: SRC}
    for m in multipliers:
        dst = f"{dst_root}/x{m}"
        meta_path = f"{dst}/_PROBE_META.json"
        meta = {"version": BUILD_VERSION, "copies": m, "src": SRC}
        stale = True
        if os.path.exists(meta_path):
            try:
                stale = json.load(open(meta_path)) != meta
            except Exception:
                stale = True
        if stale:
            if os.path.exists(dst):
                shutil.rmtree(dst)
            t0 = time.perf_counter()
            build_constant_rate(spark, dst, m)
            json.dump(meta, open(meta_path, "w"))
            print(
                f"# built {dst} ({m}x) in {time.perf_counter() - t0:.1f}s",
                file=sys.stderr,
            )
        dirs[m] = dst

    out: dict[str, dict] = {}
    for name in QUERIES:
        row: dict[str, dict] = {}
        for m in [1, *multipliers]:
            row[f"x{m}"] = run_probe(spark, specs[name], dirs[m])
            print(f"# {name} x{m}: {row[f'x{m}']}", file=sys.stderr)
        base = row["x1"]
        for m in multipliers:
            r = row[f"x{m}"]
            r["time_ratio"] = round(r["sec"] / base["sec"], 2) if base["sec"] else None
            if r.get("shuffle_mb") and base.get("shuffle_mb"):
                r["shuffle_ratio"] = round(r["shuffle_mb"] / base["shuffle_mb"], 2)
            if base.get("rows"):
                r["rows_ratio"] = round(r["rows"] / base["rows"], 2)
        out[name] = row

    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
