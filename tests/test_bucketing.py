"""Bucketed co-located join: pay the shuffle at write time, never again.

The 100 TB pattern for repeated fact⋈fact joins — both sides bucketed on
the join key with equal bucket counts sort-merge-join with NO shuffle
exchange on either side.  The plan assertion is the point: results being
equal is necessary, the missing Exchange is what saves the cluster.
"""

from __future__ import annotations

import contextlib
import io

from pyspark.sql import functions as F

from parquet_to_postgres_spark.operators import write_bucketed

from ._compare import canon
from .conftest import SF_SMOKE


def test_bucketed_join_has_no_shuffle(spark):
    import shutil

    # a fresh session's metastore does not know about warehouse dirs left
    # by a previous test process — clear both metadata and location
    for tbl in ("orders_b", "lineitem_b"):
        spark.sql(f"DROP TABLE IF EXISTS {tbl}")
        loc = f"{spark.conf.get('spark.sql.warehouse.dir').removeprefix('file:')}/{tbl}"
        shutil.rmtree(loc, ignore_errors=True)

    orders = spark.read.parquet(f"{SF_SMOKE}/orders.parquet")
    lineitem = spark.read.parquet(f"{SF_SMOKE}/lineitem.parquet")
    write_bucketed(orders, "orders_b", "o_orderkey", buckets=8)
    write_bucketed(
        lineitem.withColumnRenamed("l_orderkey", "o_orderkey"),
        "lineitem_b",
        "o_orderkey",
        buckets=8,
    )
    ob, lb = spark.table("orders_b"), spark.table("lineitem_b")
    joined = ob.hint("merge").join(lb, "o_orderkey").groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n")
    )
    joined.collect()
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        joined.explain(mode="simple")
    p = buf.getvalue()
    assert "SortMergeJoin" in p
    # the ONLY exchange allowed is the final aggregation's, never the join's
    join_part = p[: p.index("SortMergeJoin")]
    assert "Exchange hashpartitioning(o_orderkey" not in p, (
        "bucketed join still shuffles on the join key"
    )
    del join_part

    # and it returns exactly what the plain join returns
    plain = (
        orders.join(
            lineitem.withColumnRenamed("l_orderkey", "o_orderkey"), "o_orderkey"
        )
        .groupBy("o_orderstatus")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    assert canon(joined.toPandas()) == canon(plain.toPandas())


def test_z_value_matches_python_reference(spark):
    import random

    from parquet_to_postgres_spark.operators import z_value

    rng = random.Random(3)
    rows = [(rng.randrange(1 << 16), rng.randrange(1 << 16)) for _ in range(200)]
    df = spark.createDataFrame(rows, "x long, y long")
    got = [r["z"] for r in df.select(z_value(["x", "y"]).alias("z")).collect()]

    def ref(x, y):
        z = 0
        for i in range(16):
            z |= ((x >> i) & 1) << (2 * i) | ((y >> i) & 1) << (2 * i + 1)
        return z

    assert got == [ref(x, y) for x, y in rows]


def test_cluster_zorder_tightens_zone_maps(spark):
    """Z-clustered files must have tighter per-file min/max ranges on
    BOTH dimensions than the unclustered layout (that is the point:
    multi-column row-group skipping)."""
    import random
    import tempfile

    from pyspark.sql import functions as F

    from parquet_to_postgres_spark.operators import cluster_zorder

    rng = random.Random(9)
    rows = [(rng.randrange(1 << 12), rng.randrange(1 << 12)) for _ in range(20000)]
    df = spark.createDataFrame(rows, "x long, y long")

    def mean_file_span(path, col):
        d = spark.read.parquet(path)
        spans = (
            d.groupBy(F.input_file_name().alias("f"))
            .agg((F.max(col) - F.min(col)).alias("span"))
            .collect()
        )
        return sum(r["span"] for r in spans) / len(spans)

    with tempfile.TemporaryDirectory() as d:
        df.repartition(8).write.parquet(f"{d}/plain")
        cluster_zorder(df, ["x", "y"], bits=12, num_partitions=8).write.parquet(
            f"{d}/z"
        )
        assert spark.read.parquet(f"{d}/z").count() == len(rows)
        for col in ("x", "y"):
            assert mean_file_span(f"{d}/z", col) < 0.8 * mean_file_span(
                f"{d}/plain", col
            )


def test_aqe_splits_skewed_join(spark):
    """Executed evidence for the skew story: a join where one key holds
    ~95% of rows must show AQE's skew-split marker in the FINAL adaptive
    plan (and still return exactly the right row count)."""
    import tempfile

    skew_conf = {
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "32KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "16KB",
        "spark.sql.autoBroadcastJoinThreshold": "-1",  # force sort-merge
    }
    prev = {k: spark.conf.get(k, None) for k in skew_conf}
    for k, v in skew_conf.items():
        spark.conf.set(k, v)
    try:
        with tempfile.TemporaryDirectory() as d:
            # one hot key (0) with 95k rows, 5k cold keys - written to
            # parquet so size estimates are real, not in-memory guesses
            spark.range(100_000).select(
                F.when(F.col("id") < 95_000, 0)
                .otherwise(F.col("id"))
                .alias("k"),
                F.col("id").alias("payload"),
            ).write.parquet(f"{d}/fact")
            spark.range(0, 100_000, 1000).select(
                F.col("id").alias("k"), F.lit("dim").alias("tag")
            ).write.parquet(f"{d}/dim")
            fact = spark.read.parquet(f"{d}/fact")
            dim = spark.read.parquet(f"{d}/dim")
            joined = fact.join(dim, "k")
            # collect() THIS DataFrame: count() would plan a separate
            # tree and the adaptive plan here would never finalize
            n = len(joined.collect())
            assert n == 95_000 + 5  # hot key + the 1000-step cold hits
            final = joined._jdf.queryExecution().executedPlan().toString()
            assert "skew=true" in final, final[:2000]
    finally:
        for k, v in prev.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_runtime_bloom_filter_prunes_probe_side(spark):
    """Runtime filter evidence: a selective dim filter injects a
    bloom_filter_agg on the build side and a might_contain probe on the
    fact scan side - shuffle-avoiding row pruning BEFORE the join, the
    10-100x saver for selective fact-dim joins at 100 TB."""
    conf = {
        "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
        # test-scale override: the default 10GB application-side floor
        # assumes production scans; the plan SHAPE is what's pinned here
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    prev = {k: spark.conf.get(k, None) for k in conf}
    for k, v in conf.items():
        spark.conf.set(k, v)
    try:
        li = spark.read.parquet(f"{SF_SMOKE}/lineitem.parquet")
        orders = spark.read.parquet(f"{SF_SMOKE}/orders.parquet").where(
            F.col("o_totalprice") > 400000
        )
        j = li.join(orders, li.l_orderkey == orders.o_orderkey)
        p = j._jdf.queryExecution().executedPlan().toString()
        assert "bloom_filter_agg" in p and "might_contain" in p
        # pruning must not change the answer
        spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "false")
        plain = li.join(orders, li.l_orderkey == orders.o_orderkey).count()
        spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
        assert j.count() == plain > 0
    finally:
        for k, v in prev.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_rocksdb_state_store_matches_default(spark):
    """The production large-state backend (RocksDB provider) must return
    exactly what the default in-memory/HDFS provider returns for the
    stateful dedup - state that spills beyond executor heap at 100 TB
    is a config swap, not a semantics change."""
    from parquet_to_postgres_spark.streaming import ops

    key = "spark.sql.streaming.stateStore.providerClass"
    prev = spark.conf.get(key, None)
    base = ops.run_stream_to_df(
        ops.streaming_dedup_keys(ops.events_stream(spark, SF_SMOKE)), "append"
    )
    want = sorted(map(tuple, base.collect()))
    spark.conf.set(
        key,
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider",
    )
    try:
        got = ops.run_stream_to_df(
            ops.streaming_dedup_keys(ops.events_stream(spark, SF_SMOKE)),
            "append",
        )
        assert sorted(map(tuple, got.collect())) == want
    finally:
        if prev is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, prev)
