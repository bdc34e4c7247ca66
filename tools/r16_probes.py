"""Round-16 optimization probes — interleaved A/B timings for candidate
reshapes (the r15 protocol: candidate and current run ALTERNATING in one
session so ambient host-steal windows hit both sides; exact row-equality
checked before any timing is trusted).

Usage:  python tools/r16_probes.py PROBE [PROBE ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from parquet_to_postgres_spark.session import get_spark  # noqa: E402
from parquet_to_postgres_spark.tables import Catalog  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
REPEAT = int(os.environ.get("PROBE_REPEAT", "4"))


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def rows_equal(a, b) -> bool:
    ca = sorted(a.columns)
    canon = lambda df: sorted(  # noqa: E731
        tuple(str(r[c]) for c in ca) for r in df.collect()
    )
    return canon(a) == canon(b)


def _released(spark, fn):
    from parquet_to_postgres_spark.checkpoint import (
        persistent_rdd_ids,
        release_rdds,
    )

    sc = spark.sparkContext
    before = persistent_rdd_ids(sc)
    try:
        return fn()
    finally:
        spark.catalog.clearCache()
        release_rdds(sc, persistent_rdd_ids(sc) - before)


def interleaved(spark, sides: "dict[str, callable]", repeat=None):
    """Time each side alternately (a, b, a, b, ...) with block release
    between samples; print per-side sample lists and mins."""
    times = {k: [] for k in sides}
    for _ in range(repeat or REPEAT):
        for k, fn in sides.items():
            t0 = time.perf_counter()
            _released(spark, fn)
            times[k].append(round(time.perf_counter() - t0, 3))
    for k, ts in times.items():
        print(f"{k:46s} {ts} min={min(ts)}")
    return {k: min(ts) for k, ts in times.items()}


# ------------------------------------------------------------ minhash ----


def probe_minhash_stages(spark):
    """Decompose minhash_profiles: where do the ~2.3 s go — scan+shingle
    explode, md5 unit ids, the 128 min aggregates, or collect_set?"""
    from parquet_to_postgres_spark.llm import dedup as D

    t = Catalog(spark, SF_DIR)
    docs = t.documents
    units = D._units(docs, "text", "doc_id", 5)
    with_ids = D._with_unit_ids(units, "doc_id")
    print("unit rows:", units.count(), "docs:", docs.count())
    interleaved(
        spark,
        {
            "a_units (shingle explode only)": lambda: noop(units),
            "b_unit_ids (+md5/conv/mod)": lambda: noop(with_ids),
            "c_mins_only (groupBy 128 mins)": lambda: noop(
                with_ids.groupBy("doc_id").agg(*D._minhash_aggs(128))
            ),
            "d_tokset_only (groupBy collect_set)": lambda: noop(
                with_ids.groupBy("doc_id").agg(
                    F.sort_array(F.collect_set("token_id")).alias("tokset")
                )
            ),
            "e_full profiles": lambda: noop(
                D.minhash_profiles(docs, shingle_n=5)
            ),
        },
        repeat=3,
    )


def probe_minhash_arrow(spark):
    """Aggregate-path minhash_profiles (codegen) vs an Arrow/numpy
    mapInArrow kernel computing identical signatures per partition."""
    from parquet_to_postgres_spark.llm import dedup as D
    from parquet_to_postgres_spark.llm.dedup import minhash_profiles_arrow

    t = Catalog(spark, SF_DIR)
    docs = t.documents
    cur = D.minhash_profiles(docs, shingle_n=5)
    new = minhash_profiles_arrow(docs, shingle_n=5)
    print("equal:", rows_equal(cur, new))
    interleaved(
        spark,
        {
            "minhash_profiles aggregate (current)": lambda: noop(
                D.minhash_profiles(docs, shingle_n=5)
            ),
            "minhash_profiles arrow (candidate)": lambda: noop(
                minhash_profiles_arrow(docs, shingle_n=5)
            ),
        },
    )


def probe_minhash_query(spark):
    """Full minhash_near_dup and near_dedup_corpus: aggregate profiles
    (pre-r16) vs the Arrow kernel now wired in, via the patch seam."""
    import parquet_to_postgres_spark.llm.dedup as D
    import parquet_to_postgres_spark.queries.llm_q as LQ
    from parquet_to_postgres_spark.queries import load_all

    specs = load_all()
    real = D.minhash_profiles_arrow

    def run_agg(builder):
        D.minhash_profiles_arrow = D.minhash_profiles
        LQ.D.minhash_profiles_arrow = D.minhash_profiles
        try:
            noop(builder(spark, SF_DIR))
        finally:
            D.minhash_profiles_arrow = real
            LQ.D.minhash_profiles_arrow = real

    for q in ("minhash_near_dup", "near_dedup_corpus"):
        b = specs[q].builder
        interleaved(
            spark,
            {
                f"{q} aggregate profiles (pre-r16)": lambda b=b: run_agg(b),
                f"{q} arrow profiles (current)": lambda b=b: noop(
                    b(spark, SF_DIR)
                ),
            },
        )


# ------------------------------------------------------------- etl ------


def probe_jdbc_grain_agg(spark):
    """etl_jdbc_roundtrip final aggregate: min(string) SortAggregate
    chain vs grain-keyed HashAggregate + tiny min.  Equality must hold
    for ARBITRARY data: min is associative, the grain includes every
    distinct-counted and min'd column."""
    from parquet_to_postgres_spark.queries import load_all
    from parquet_to_postgres_spark.queries.etl_q import (
        DERBY_DRIVER,
        derby_url,
        read_jdbc,
    )

    specs = load_all()
    t = Catalog(spark, SF_DIR)
    # run the real query once so orders_rt exists, then A/B the agg only
    noop(specs["etl_jdbc_roundtrip"].builder(spark, SF_DIR))
    lo, hi = t.orders.agg(F.min("o_orderkey"), F.max("o_orderkey")).collect()[0]
    back = read_jdbc(
        spark, derby_url("etlrt"), "orders_rt",
        partition_column="o_orderkey", lower=int(lo), upper=int(hi),
        num_partitions=4,
    )

    def cur():
        return back.groupBy("o_orderstatus").agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.countDistinct("o_orderpriority").alias("n_prios"),
            F.sum(F.col("o_totalprice").cast("decimal(12,2)"))
            .cast("double")
            .alias("total"),
            F.min("tags").alias("min_tags"),
        )

    def new():
        grain = back.groupBy("o_orderstatus", "o_orderpriority", "tags").agg(
            F.count(F.lit(1)).alias("__n"),
            F.sum(F.col("o_totalprice").cast("decimal(12,2)")).alias("__t"),
        )
        return grain.groupBy("o_orderstatus").agg(
            F.sum("__n").alias("n_rows"),
            F.countDistinct("o_orderpriority").alias("n_prios"),
            F.sum("__t").cast("double").alias("total"),
            F.min("tags").alias("min_tags"),
        )

    print("equal:", rows_equal(cur(), new()))
    interleaved(
        spark,
        {
            "jdbc agg min(string) chain (current)": lambda: noop(cur()),
            "jdbc agg grain-keyed (candidate)": lambda: noop(new()),
        },
    )


def probe_pg_grain_agg(spark):
    """etl_pg_roundtrip final aggregate, same reshape idea — grain keyed
    (returnflag, linestatus, tags, partkey) HashAggregate first."""
    from parquet_to_postgres_spark.pg import read_back, shared_postgres

    t = Catalog(spark, SF_DIR)
    src = t.lineitem.select(
        "l_orderkey", "l_partkey", "l_returnflag", "l_linestatus",
        "l_extendedprice", "l_shipdate",
    ).withColumn("tags", F.array("l_returnflag", "l_linestatus"))
    pg = shared_postgres()
    assert pg is not None
    from parquet_to_postgres_spark.pg import PostgresCopySink

    PostgresCopySink(
        pg.conninfo(), "lineitem_rt", mode="overwrite", num_partitions=8
    ).write(src)
    lo, hi = src.agg(F.min("l_orderkey"), F.max("l_orderkey")).collect()[0]
    back = read_back(
        spark, pg.conninfo(), "lineitem_rt", src.schema,
        partition_column="l_orderkey", lower=int(lo), upper=int(hi),
        num_partitions=min(16, spark.sparkContext.defaultParallelism),
    )

    def cur():
        return back.groupBy("l_returnflag").agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.countDistinct("l_partkey").alias("n_parts"),
            F.sum(F.col("l_extendedprice").cast("decimal(12,2)"))
            .cast("double")
            .alias("total_price"),
            F.max(F.datediff("l_shipdate", F.lit("1970-01-01")))
            .cast("long")
            .alias("last_ship_day"),
            F.min(F.to_json("tags")).alias("min_tags"),
        )

    def new():
        grain = back.groupBy(
            "l_returnflag", "l_linestatus", "l_partkey",
            F.to_json("tags").alias("__tags"),
        ).agg(
            F.count(F.lit(1)).alias("__n"),
            F.sum(F.col("l_extendedprice").cast("decimal(12,2)")).alias("__t"),
            F.max(F.datediff("l_shipdate", F.lit("1970-01-01"))).alias("__d"),
        )
        return grain.groupBy("l_returnflag").agg(
            F.sum("__n").alias("n_rows"),
            F.countDistinct("l_partkey").alias("n_parts"),
            F.sum("__t").cast("double").alias("total_price"),
            F.max("__d").cast("long").alias("last_ship_day"),
            F.min("__tags").alias("min_tags"),
        )

    print("equal:", rows_equal(cur(), new()))
    interleaved(
        spark,
        {
            "pg agg min(string) chain (current)": lambda: noop(cur()),
            "pg agg grain-keyed (candidate)": lambda: noop(new()),
        },
    )


def probe_pg_readback_fanout(spark):
    """VERDICT item 4: readback 8 vs 16 COPY TO STDOUT connections,
    interleaved, full readback+agg each sample."""
    from parquet_to_postgres_spark.pg import (
        PostgresCopySink,
        read_back,
        shared_postgres,
    )

    t = Catalog(spark, SF_DIR)
    src = t.lineitem.select(
        "l_orderkey", "l_partkey", "l_returnflag", "l_linestatus",
        "l_extendedprice", "l_shipdate",
    ).withColumn("tags", F.array("l_returnflag", "l_linestatus"))
    pg = shared_postgres()
    assert pg is not None
    PostgresCopySink(
        pg.conninfo(), "lineitem_rt", mode="overwrite", num_partitions=8
    ).write(src)
    lo, hi = src.agg(F.min("l_orderkey"), F.max("l_orderkey")).collect()[0]

    def rb(nparts):
        back = read_back(
            spark, pg.conninfo(), "lineitem_rt", src.schema,
            partition_column="l_orderkey", lower=int(lo), upper=int(hi),
            num_partitions=nparts,
        )
        noop(
            back.groupBy("l_returnflag").agg(
                F.count(F.lit(1)).alias("n_rows"),
                F.countDistinct("l_partkey").alias("n_parts"),
            )
        )

    interleaved(
        spark,
        {
            "pg readback 8 conns": lambda: rb(8),
            "pg readback 16 conns": lambda: rb(16),
            "pg readback 24 conns": lambda: rb(24),
        },
    )


# ------------------------------------------------------------- misc -----


def probe_ann_overlap(spark):
    """VERDICT item 3: ann_topk prep overlap vs the sequential ordering,
    interleaved on the full declared query.  The sequential side replays
    the exact pre-r15 ordering through the overlap seam (the same
    monkeypatch tests/test_ann_recall.py's row-identity pin uses)."""
    import parquet_to_postgres_spark.llm.similarity as S
    from parquet_to_postgres_spark.queries import load_all

    specs = load_all()
    b = specs["ann_topk"].builder
    real_overlap = S.overlap

    def sequential_overlap(thunks, main):
        out_main = main()
        return out_main, tuple(t() for t in thunks)

    def run_seq():
        S.overlap = sequential_overlap
        try:
            noop(b(spark, SF_DIR))
        finally:
            S.overlap = real_overlap

    interleaved(
        spark,
        {
            "ann_topk sequential prep (pre-r15)": run_seq,
            "ann_topk overlapped prep (current)": lambda: noop(
                b(spark, SF_DIR)
            ),
        },
    )


def probe_star_revenue(spark):
    """VERDICT item 7: is the driver's 2.49 s join_star_revenue reading
    real or ambient?  min-of-N on the current code."""
    from parquet_to_postgres_spark.queries import load_all

    specs = load_all()
    b = specs["join_star_revenue"].builder
    interleaved(
        spark,
        {"join_star_revenue (current)": lambda: noop(b(spark, SF_DIR))},
        repeat=5,
    )


PROBES = {
    "minhash_stages": probe_minhash_stages,
    "minhash_arrow": probe_minhash_arrow,
    "minhash_query": probe_minhash_query,
    "jdbc_grain_agg": probe_jdbc_grain_agg,
    "pg_grain_agg": probe_pg_grain_agg,
    "pg_readback_fanout": probe_pg_readback_fanout,
    "ann_overlap": probe_ann_overlap,
    "star_revenue": probe_star_revenue,
}


def main() -> int:
    spark = get_spark("r16_probes")
    spark.sparkContext.setLogLevel("ERROR")
    spark.read.parquet(f"{SF_DIR}/lineitem.parquet").count()  # warm
    for name in sys.argv[1:] or list(PROBES):
        print(f"== {name} ==")
        PROBES[name](spark)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
