"""Lloyd mean-update breakdown probe (r12, VERDICT r11 item 2).

The r11 1M×d512 PQ probe showed train wall stepping 2.6× for the last
2× of corpus and attributed it to the mean-update aggregate +
per-round checkpoint.  This probe isolates the three shapes at one
scale so the attribution is MEASURED, not inferred:

  assign_only_s      one numpy argmin pass over the corpus
                     (_pq_codes_np, codes materialized via count)
  exploded_update_s  the r11 update: explode to (subspace, code,
                     subvec) then _subspace_means' N·m·d posexplode
                     hash aggregate (collected, as pq_train did)
  fused_round_s      the r12 update: _pq_partial_means_np — argmin +
                     int64 partial sums in ONE mapInPandas pass,
                     model-grain exchange only (collected)

An r11 train round ≈ assign_only + exploded_update (the argmin ran
inside the same job as the explode, but the aggregate still walked
N·m·d rows); an r12 round IS fused_round.  Also times the kmeans
twins (_nearest_cell_np vs _cell_partial_means_np + the old exploded
kmeans update) at the same scale.

Usage:  python tools/lloyd_probe.py [mult]     # default 256 ≈ 512k
One JSON line per measurement; rows recorded in BASELINE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F  # noqa: E402

from parquet_to_postgres_spark.llm import similarity as S  # noqa: E402
from parquet_to_postgres_spark.tables import load_table  # noqa: E402
from pq_probe import get_spark, replicate, widen  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> int:
    mult = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    section = os.environ.get("LLOYD_SECTION", "both")  # pq|kmeans|both
    m, codes, dim = 16, 64, 512
    d = dim // m
    spark = get_spark("lloyd_probe")
    spark.sparkContext.setLogLevel("ERROR")
    base = load_table(spark, SF_DIR, "embeddings").select(
        "vec_id", "embedding"
    )
    emb = (
        widen(replicate(base, mult))
        .repartition(64)
        .localCheckpoint(eager=True)
    )
    n = emb.count()
    if section in ("pq", "both"):
        pq_section(spark, emb, n, m, codes, dim, d)
    if section in ("kmeans", "both"):
        kmeans_section(spark, emb, n, dim)
    return 0


def pq_section(spark, emb, n, m, codes, dim, d) -> None:
    # --- PQ-shaped breakdown -------------------------------------------
    cb = S.pq_train(emb.limit(4000), m=m, codes=codes, max_iterations=2,
                    dim=dim)
    cmap = {
        (r["subspace"], r["code"]): list(r["centroid"])
        for r in cb.collect()
    }
    base_v = S._pq_barrier(emb, "vec_id", "embedding").localCheckpoint(
        eager=True
    )
    base_v.count()

    t0 = time.time()
    S._pq_codes_np(base_v, cmap, m, d, codes).count()
    assign_only = time.time() - t0

    t0 = time.time()
    scored = S._pq_codes_np(base_v, cmap, m, d, codes, carry_vec=True)
    parts = F.array(
        *[
            F.struct(
                F.lit(j).alias("subspace"),
                F.element_at(F.col("codes"), j + 1).alias("code"),
                F.slice(F.col("__v"), j * d + 1, d).alias("subvec"),
            )
            for j in range(m)
        ]
    )
    assigned = scored.select("id", F.explode(parts).alias("p")).select(
        "id", "p.subspace", "p.code", "p.subvec"
    )
    S._subspace_means(assigned).collect()
    exploded_round = time.time() - t0

    t0 = time.time()
    S._pq_partial_means_np(base_v, cmap, m, d, codes).collect()
    fused_round = time.time() - t0

    print(
        json.dumps(
            {
                "lloyd_pq_breakdown": {
                    "n_vectors": n,
                    "m": m,
                    "codes": codes,
                    "d": dim,
                    "assign_only_s": round(assign_only, 2),
                    "exploded_round_s": round(exploded_round, 2),
                    "fused_round_s": round(fused_round, 2),
                }
            }
        ),
        flush=True,
    )


def kmeans_section(spark, emb, n, dim) -> None:
    # --- kmeans-shaped breakdown (k cells over the full vector) --------
    k = 32
    labeled = emb.withColumn(
        "label", F.pmod(F.xxhash64("vec_id"), F.lit(k)).cast("int")
    ).localCheckpoint(eager=True)
    emb.unpersist()  # don't pin two 2 GB copies; GC pressure skews walls
    init = S._centroid_arrays(labeled, "label", "embedding").select(
        F.col("label").cast("int").alias("cell"), "centroid"
    )
    cents_rows = S._collect_cells(init)
    v = labeled.select(
        F.col("vec_id").alias("id"), F.col("embedding").alias("vec")
    )
    cents_df = spark.createDataFrame(
        cents_rows, "cell int, centroid array<double>"
    )

    t0 = time.time()
    S._nearest_cell_np(v, cents_df).count()
    km_assign = time.time() - t0

    t0 = time.time()
    a2 = S._nearest_cell_np(v, cents_df)
    ex = a2.select("cell", F.posexplode("vec").alias("pos", "val"))
    new0 = ex.groupBy("cell", "pos").agg(
        (
            F.sum(
                F.round(
                    F.col("val").cast("double") * S.CENTROID_SCALE
                ).cast("long")
            ).cast("double")
            / (F.lit(float(S.CENTROID_SCALE)) * F.count(F.lit(1)))
        ).alias("cv")
    )
    new0.groupBy("cell").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "cv"))),
            lambda s: s["cv"],
        ).alias("centroid")
    ).collect()
    km_exploded = time.time() - t0

    t0 = time.time()
    S._cell_partial_means_np(v, cents_rows).collect()
    km_fused = time.time() - t0

    print(
        json.dumps(
            {
                "lloyd_kmeans_breakdown": {
                    "n_vectors": n,
                    "k": k,
                    "d": dim,
                    "assign_only_s": round(km_assign, 2),
                    "exploded_round_s": round(km_exploded, 2),
                    "fused_round_s": round(km_fused, 2),
                }
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    raise SystemExit(main())
