"""A/B the CURRENT pq_encode argmin against a frozen copy of the r8
single-projection form on the REAL encode harness (replicated sf0.1
embeddings, _unit upstream, parquet write).

The frozen arm deliberately DUPLICATES the r8 expressions (rather
than importing them) so it stays a fixed yardstick even as
similarity.py evolves; the shipped r9 path is the same interpreted
single projection plus the _no_wsc poison and the big-model join
gate, so the two arms should now measure within noise of each other
(BASELINE.md "Argmin representation shootout" for the full story)."""
import os, sys, time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from parquet_to_postgres_spark.llm import similarity as S
from parquet_to_postgres_spark.tables import load_table
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from pq_probe import replicate, get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def argmin_code_exprs_r8(cmap, m, d, n_codes):
    bv = F.col("__v")
    per_sub = []
    for j in range(m):
        elems = [F.element_at(bv, j * d + t + 1).cast("double") for t in range(d)]
        cand = []
        for c in range(n_codes):
            cent = cmap[(j, c)]
            dist = None
            for t in range(d):
                term = (elems[t] - F.lit(float(cent[t]))) * (elems[t] - F.lit(float(cent[t])))
                dist = term if dist is None else dist + term
            cand.append(F.struct(dist.alias("dist"), F.lit(c).alias("code")))
        per_sub.append(F.array_min(F.array(*cand))["code"])
    return per_sub


def encode_r8(vectors, cmap, m, d, n_codes, id_col, vec_col):
    base = S._pq_barrier(vectors, id_col, vec_col)
    scored = base.select("id", F.array(*argmin_code_exprs_r8(cmap, m, d, n_codes)).alias("__codes"))
    return scored.select("id", F.explode(F.array("__codes")).alias("codes"))


def main():
    mult = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    spark = get_spark("argmin_ab")
    spark.sparkContext.setLogLevel("ERROR")
    base = load_table(spark, SF_DIR, "embeddings").select("vec_id", "embedding")
    emb = replicate(base, mult).localCheckpoint(eager=True)
    n = emb.count()
    print(f"n={n}", flush=True)
    cb = S.pq_train(emb.limit(2000), max_iterations=2)
    rows = cb.collect()
    cmap = {(r["subspace"], r["code"]): list(r["centroid"]) for r in rows}
    m = max(r["subspace"] for r in rows) + 1
    n_codes = max(r["code"] for r in rows) + 1
    # d from the trained codebooks themselves — always coherent with
    # what pq_train produced (and no extra Spark job); note pq_train
    # above uses its default dim=64, matching the sf fixtures
    d = len(rows[0]["centroid"])

    c_unit = emb.select(F.col("vec_id").alias("cid"), S._unit("embedding").alias("cvec"))

    import tempfile
    for tag, enc in (
        ("current-pq-encode", lambda: S.pq_encode(c_unit, cb, id_col="cid", vec_col="cvec")),
        ("r8-frozen", lambda: encode_r8(c_unit, cmap, m, d, n_codes, "cid", "cvec")),
    ):
        for rep in range(2):
            with tempfile.TemporaryDirectory() as td:
                t0 = time.time()
                enc().write.mode("overwrite").parquet(f"{td}/codes")
                print(f"{tag} rep{rep}: {time.time()-t0:7.2f}s", flush=True)
    # also encode-only (no write): count of first codes
    for tag, enc in (
        ("current-count", lambda: S.pq_encode(c_unit, cb, id_col="cid", vec_col="cvec")),
        ("r8-frozen-count", lambda: encode_r8(c_unit, cmap, m, d, n_codes, "cid", "cvec")),
    ):
        for rep in range(2):
            t0 = time.time()
            enc().agg(F.sum(F.element_at("codes", 1))).collect()
            print(f"{tag} rep{rep}: {time.time()-t0:7.2f}s", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
