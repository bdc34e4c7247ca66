"""Probe: which argmin-forest projection shapes does janino compile?

Round-9 verdict item 2: the 8x16x8 PQ argmin forest, emitted as ONE
projection expression, generates a ~30k-line class janino refuses
(Spark then runs the interpreted projection and every train job pays a
failed-compile stall).  This probe times the candidate rewrites under
``spark.sql.codegen.fallback=false`` + ``factoryMode=CODEGEN_ONLY`` so
a compile failure is an ERROR, not a silent fallback:

  V0  current: one column = array(argmin_0 ... argmin_7)
  V1  chunked: m separate columns (one argmin per projection item),
      assembled behind a Generate barrier
  V2  V1 + factored distance (||c||^2 - 2<x,c>, norm terms constant-
      folded into the literal) — smaller tree per code

Run: python tools/argmin_codegen_probe.py [n_rows]
"""

from __future__ import annotations

import sys
import time

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

M, CODES, DIM = 8, 16, 64
D = DIM // M


def _cmap():
    import random

    rng = random.Random(7)
    return {
        (j, c): [rng.uniform(-1, 1) for _ in range(D)]
        for j in range(M)
        for c in range(CODES)
    }


def _argmin_exprs_squared(cmap):
    bv = F.col("__v")
    per_sub = []
    for j in range(M):
        elems = [
            F.element_at(bv, j * D + t + 1).cast("double") for t in range(D)
        ]
        cand = []
        for c in range(CODES):
            cent = cmap[(j, c)]
            dist = None
            for t in range(D):
                term = (elems[t] - F.lit(float(cent[t]))) * (
                    elems[t] - F.lit(float(cent[t]))
                )
                dist = term if dist is None else dist + term
            cand.append(F.struct(dist.alias("dist"), F.lit(c).alias("code")))
        per_sub.append(F.array_min(F.array(*cand))["code"])
    return per_sub


def _argmin_exprs_factored(cmap):
    bv = F.col("__v")
    per_sub = []
    for j in range(M):
        elems = [
            F.element_at(bv, j * D + t + 1).cast("double") for t in range(D)
        ]
        cand = []
        for c in range(CODES):
            cent = cmap[(j, c)]
            nrm = sum(x * x for x in cent)
            dot = None
            for t in range(D):
                term = elems[t] * F.lit(float(cent[t]))
                dot = term if dot is None else dot + term
            dist = F.lit(float(nrm)) - F.lit(2.0) * dot
            cand.append(F.struct(dist.alias("dist"), F.lit(c).alias("code")))
        per_sub.append(F.array_min(F.array(*cand))["code"])
    return per_sub


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    cmap = _cmap()
    vecs = spark.range(n).select(
        F.col("id"),
        F.transform(
            F.sequence(F.lit(1), F.lit(DIM)),
            lambda i: F.sin(F.col("id") * i).cast("double"),
        ).alias("vec"),
    )
    base = vecs.select(
        "id", F.explode(F.array("vec")).alias("__v")
    ).localCheckpoint()
    base.count()

    def run(tag, df, strict):
        for k, v in (
            ("spark.sql.codegen.fallback", "false" if strict else "true"),
            (
                "spark.sql.codegen.factoryMode",
                "CODEGEN_ONLY" if strict else "FALLBACK",
            ),
        ):
            spark.conf.set(k, v)
        t0 = time.time()
        try:
            got = df.agg(F.sum(F.element_at("codes", 1))).collect()[0][0]
            print(f"{tag:28s} OK    {time.time()-t0:7.2f}s  sum={got}")
        except Exception as e:
            msg = str(e).replace("\n", " ")[:160]
            print(f"{tag:28s} FAIL  {time.time()-t0:7.2f}s  {msg}")
        finally:
            spark.conf.set("spark.sql.codegen.fallback", "true")
            spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")

    v0 = base.select(
        "id", F.array(*_argmin_exprs_squared(cmap)).alias("__codes")
    ).select("id", F.explode(F.array("__codes")).alias("codes"))

    def chunked(exprs):
        cols = [e.alias(f"__c{j}") for j, e in enumerate(exprs)]
        step = base.select("id", *cols)
        asm = step.select(
            "id",
            F.explode(
                F.array(F.array(*[F.col(f"__c{j}") for j in range(M)]))
            ).alias("codes"),
        )
        return asm

    v1 = chunked(_argmin_exprs_squared(cmap))
    v2 = chunked(_argmin_exprs_factored(cmap))

    for tag, df in (("v0-single-array", v0), ("v1-chunked", v1), ("v2-chunked-factored", v2)):
        run(tag + " strict", df, strict=True)
    for tag, df in (("v0-single-array", v0), ("v1-chunked", v1), ("v2-chunked-factored", v2)):
        run(tag + " lenient", df, strict=False)
    spark.stop()


if __name__ == "__main__":
    main()
