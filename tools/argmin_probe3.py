"""Probe 3: two 4-subspace project chunks separated by Generate barriers."""
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
    chunk = int(sys.argv[2]) if len(sys.argv) > 2 else 4
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
            print(f"{tag:36s} OK    {time.time()-t0:7.2f}s  sum={got}", flush=True)
        except Exception as e:
            print(f"{tag:36s} FAIL  {time.time()-t0:7.2f}s  {str(e)[:120]}", flush=True)
        finally:
            spark.conf.set("spark.sql.codegen.fallback", "true")
            spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")

    # chunked: forest in PROJECT, explode binds the chunk array as attribute
    cur = base
    chunks = [list(range(s, min(s + chunk, M))) for s in range(0, M, chunk)]
    done = []
    for ci, js in enumerate(chunks):
        keep = ["id", "__v"] if ci < len(chunks) - 1 else ["id"]
        proj = cur.select(*keep, *[F.col(c) for c in done],
                          F.array(*[argmin_one(cm, j) for j in js]).alias(f"__h{ci}"))
        cur = proj.select(*keep, *[F.col(c) for c in done],
                          F.explode(F.array(f"__h{ci}")).alias(f"__hb{ci}"))
        done.append(f"__hb{ci}")
    v5 = cur.select("id", F.concat(*[F.col(c) for c in done]).alias("codes"))
    run(f"v5-chunk{chunk}-barriers", v5)
    v5.explain("formatted")
    spark.stop()

if __name__ == "__main__":
    main()
