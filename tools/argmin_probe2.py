"""Probe 2: does a SINGLE subspace forest compile? Do barrier-separated
per-subspace chunks compile (each operator's consume in its own method)?"""
import sys, time
from pyspark.sql import SparkSession
from pyspark.sql import functions as F

M, CODES, DIM = 8, 16, 64
D = DIM // M

def cmap():
    import random
    rng = random.Random(7)
    return {(j, c): [rng.uniform(-1, 1) for _ in range(D)]
            for j in range(M) for c in range(CODES)}

def argmin_one(cm, j, src="__v"):
    bv = F.col(src)
    elems = [F.element_at(bv, j * D + t + 1).cast("double") for t in range(D)]
    cand = []
    for c in range(CODES):
        cent = cm[(j, c)]
        dist = None
        for t in range(D):
            term = (elems[t] - F.lit(float(cent[t]))) * (elems[t] - F.lit(float(cent[t])))
            dist = term if dist is None else dist + term
        cand.append(F.struct(dist.alias("dist"), F.lit(c).alias("code")))
    return F.array_min(F.array(*cand))["code"]

def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    spark = (SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "8g").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    cm = cmap()
    vecs = spark.range(n).select("id",
        F.transform(F.sequence(F.lit(1), F.lit(DIM)),
            lambda i: F.sin(F.col("id") * i).cast("double")).alias("vec"))
    base = vecs.select("id", F.explode(F.array("vec")).alias("__v")).localCheckpoint()
    base.count()

    def run(tag, df, strict=True):
        spark.conf.set("spark.sql.codegen.fallback", "false" if strict else "true")
        spark.conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY" if strict else "FALLBACK")
        t0 = time.time()
        try:
            got = df.agg(F.sum(F.element_at("codes", 1))).collect()[0][0]
            print(f"{tag:34s} OK    {time.time()-t0:7.2f}s  sum={got}", flush=True)
        except Exception as e:
            print(f"{tag:34s} FAIL  {time.time()-t0:7.2f}s  {str(e)[:120]}", flush=True)
        finally:
            spark.conf.set("spark.sql.codegen.fallback", "true")
            spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")

    # v3: ONE subspace forest only
    v3 = base.select("id", F.array(argmin_one(cm, 0)).alias("codes"))
    run("v3-one-subspace", v3)

    # v3b: TWO subspaces
    v3b = base.select("id", F.array(argmin_one(cm, 0), argmin_one(cm, 1)).alias("codes"))
    run("v3b-two-subspaces", v3b)

    # v3c: FOUR subspaces
    v3c = base.select("id", F.array(*[argmin_one(cm, j) for j in range(4)]).alias("codes"))
    run("v3c-four-subspaces", v3c)

    # v4: per-subspace chunks, each behind its own Generate barrier
    cur = base
    for j in range(M):
        cur = cur.select("id", "__v", *[F.col(f"__c{t}") for t in range(j)],
                         F.explode(F.array(argmin_one(cm, j))).alias(f"__c{j}"))
    v4 = cur.select("id", F.array(*[F.col(f"__c{j}") for j in range(M)]).alias("codes"))
    run("v4-barrier-per-subspace", v4)
    spark.stop()

if __name__ == "__main__":
    main()
