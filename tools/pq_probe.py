"""PQ ANN + exactly-once sink scale probe (round 7 additions).

Two measurements, one JSON line each, recorded in BASELINE.md:

1. **PQ family scaling** — train / encode / query wall-clock as the
   corpus grows.  Base corpora are the driver's embeddings tables; the
   multiplier replicates sf0.1 with a per-copy CIRCULAR ROTATION of the
   embedding array (``slice||slice`` — length- and norm-preserving, so
   the copies are distinct yet identically distributed vectors and the
   near-uniform geometry of the base set is retained).  What "passing"
   looks like: train cost is ~linear in corpus (per-round scan +
   (subspace, code, pos)-grain map-side-combined aggregate — the
   fixed-cost side is m·codes rows, independent of N), encode is one
   linear pass, and ADC query wall tracks corpus size (it is a scan at
   m lookups/vector), all with NO super-linear shuffle.

2. **Exactly-once sink overhead** — ExactlyOnceJdbcSink.write_batch
   (stage + atomic publish + ledger) vs plain JdbcSink.write append of
   the same rows into embedded Derby.  The delta is the price of the
   exactly-once guarantee: one extra server-side INSERT..SELECT pass
   over the batch plus two ledger statements.

Usage:  python tools/pq_probe.py
Env:    PQ_PROBE_MULTIPLIERS  comma ints over sf0.1, default "1,4,16"
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from parquet_to_postgres_spark.etl import ExactlyOnceJdbcSink, JdbcSink  # noqa: E402
from parquet_to_postgres_spark.llm import similarity as S  # noqa: E402
from parquet_to_postgres_spark.queries.etl_q import DERBY_DRIVER, derby_url  # noqa: E402
from parquet_to_postgres_spark.session import get_spark  # noqa: E402
from parquet_to_postgres_spark.tables import load_table  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def replicate(emb, mult: int, dim: int = 64):
    """mult copies; copy k rotates the embedding left by k (mod dim) and
    offsets vec_id — distinct, identically distributed vectors."""
    if mult == 1:
        return emb
    n = emb.agg(F.max("vec_id")).collect()[0][0] + 1
    copies = []
    for k in range(mult):
        r = k % dim
        vec = (
            F.col("embedding")
            if r == 0
            else F.concat(
                F.slice("embedding", r + 1, dim - r),
                F.slice("embedding", 1, r),
            )
        )
        copies.append(
            emb.select(
                (F.col("vec_id") + F.lit(k * n)).alias("vec_id"),
                vec.alias("embedding"),
            )
        )
    out = copies[0]
    for c in copies[1:]:
        out = out.unionByName(c)
    return out


def pq_probe(spark) -> list[dict]:
    base = load_table(spark, SF_DIR, "embeddings").select("vec_id", "embedding")
    mults = [
        int(x)
        for x in os.environ.get("PQ_PROBE_MULTIPLIERS", "1,4,16").split(",")
    ]
    rows = []
    for mult in mults:
        emb = replicate(base, mult).localCheckpoint(eager=True)
        n = emb.count()
        corpus = emb.where(F.col("vec_id") >= 5)
        queries = emb.where(F.col("vec_id") < 5)
        t0 = time.time()
        cb = S.pq_train(corpus, max_iterations=4).localCheckpoint(eager=True)
        cb.count()
        t_train = time.time() - t0
        t0 = time.time()
        enc = S.pq_encode(corpus, cb).localCheckpoint(eager=True)
        enc.count()
        t_encode = time.time() - t0
        t0 = time.time()
        got = S.ann_topk_pq(corpus, queries, k=10, codebooks=cb)
        n_out = got.count()
        t_query = time.time() - t0
        rows.append(
            {
                "mult": mult,
                "n_vectors": n,
                "train_s": round(t_train, 2),
                "encode_s": round(t_encode, 2),
                "query_s": round(t_query, 2),
                "rows_out": n_out,
            }
        )
        print(json.dumps({"pq": rows[-1]}), flush=True)
        emb.unpersist()
    return rows


def xonce_probe(spark) -> dict:
    src = load_table(spark, SF_DIR, "orders").select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice"
    ).localCheckpoint(eager=True)
    n = src.count()
    t0 = time.time()
    JdbcSink(
        url=derby_url("probe_plain"),
        table="orders_plain",
        mode="append",
        options={"driver": DERBY_DRIVER},
    ).write(src)
    t_plain = time.time() - t0
    t0 = time.time()
    ExactlyOnceJdbcSink(
        url=derby_url("probe_xonce"),
        table="orders_x",
        options={"driver": DERBY_DRIVER},
    ).write_batch(src, 0)
    t_x = time.time() - t0
    out = {
        "rows": n,
        "plain_append_s": round(t_plain, 2),
        "exactly_once_s": round(t_x, 2),
        "overhead_x": round(t_x / t_plain, 2),
    }
    print(json.dumps({"xonce": out}), flush=True)
    return out


def main() -> int:
    spark = get_spark()
    result = {"sf_dir": SF_DIR, "pq": pq_probe(spark), "xonce": xonce_probe(spark)}
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
