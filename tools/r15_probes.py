"""Round-15 optimization probes — A/B timings for candidate reshapes.

Each probe times the CURRENT implementation against a candidate variant
on the bench scale factor, with the bench's noop-sink methodology, and
(where the variant could drift) verifies the candidate's rows equal the
current rows exactly before reporting its time.

Usage:  python tools/r15_probes.py PROBE [PROBE ...]
Probes: minhash_profiles, interval_bins, drift_onepass, pct_array,
        etl_pg_parts, stream_overlap, multi_source_overlap
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
REPEAT = int(os.environ.get("PROBE_REPEAT", "3"))


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def timed(label, fn, repeat=None):
    samples = []
    for _ in range(repeat or REPEAT):
        t0 = time.perf_counter()
        fn()
        samples.append(round(time.perf_counter() - t0, 3))
    print(f"{label:42s} {samples} min={min(samples)}")
    return min(samples)


def rows_equal(a, b) -> bool:
    """Exact multiset row equality via canonical string hashing."""
    ca = sorted(a.columns)
    canon = lambda df: sorted(  # noqa: E731
        tuple(str(r[c]) for c in ca) for r in df.collect()
    )
    return canon(a) == canon(b)


def probe_minhash_profiles(spark):
    """Aggregate-path minhash_profiles vs a zero-shuffle rowwise variant."""
    from parquet_to_postgres_spark.llm import dedup as D
    from parquet_to_postgres_spark.tables import spread

    t = Catalog(spark, SF_DIR)
    docs = t.documents

    def rowwise_profiles(df, num_hashes=128, shingle_n=5):
        units = D.char_ngrams("text", shingle_n)
        ids = F.transform(
            units,
            lambda u: F.conv(F.substring(F.md5(u), 1, 15), 16, 10).cast("long"),
        )

        def affine(a, b):
            return lambda v: (F.lit(a).cast("long") * (v % D.MINHASH_P) + F.lit(b)) % D.MINHASH_P

        sig_cols = []
        for j in range(num_hashes):
            a, b = D.hash_params(j)
            sig_cols.append(
                F.array_min(F.transform(F.col("__ids"), affine(a, b))).alias(f"mh{j}")
            )
        base = spread(df).select(
            "doc_id", F.explode(F.array(ids)).alias("__ids")
        ).where(F.size("__ids") > 0)
        return base.select(
            "doc_id",
            F.array_sort(F.array_distinct("__ids")).alias("tokset"),
            *sig_cols,
        ).withColumn("sz", F.size("tokset").cast("long"))

    cur = D.minhash_profiles(docs, shingle_n=5)
    new = rowwise_profiles(docs)
    print("equal:", rows_equal(cur, new))
    timed("minhash_profiles aggregate (current)", lambda: noop(D.minhash_profiles(docs, shingle_n=5)))
    timed("minhash_profiles rowwise (candidate)", lambda: noop(rowwise_profiles(docs)))


def probe_interval_bins(spark):
    """join_interval_overlap candidate-pair volume vs bin width."""
    from parquet_to_postgres_spark.queries.joins_q import interval_overlap_join

    t = Catalog(spark, SF_DIR)
    day = lambda c: F.datediff(F.col(c), F.lit("1970-01-01"))  # noqa: E731
    l = (
        t.orders.where(F.col("o_orderpriority") == "1-URGENT")
        .select(
            F.col("o_orderkey").alias("urgent_key"),
            day("o_orderdate").cast("long").alias("ls"),
        )
        .withColumn("le", F.col("ls") + F.col("urgent_key") % 7 + 1)
    )
    r = t.orders.where(F.col("o_orderpriority") == "5-LOW").select(
        day("o_orderdate").cast("long").alias("rs"),
        (day("o_orderdate").cast("long") + F.col("o_orderkey") % 5 + 1).alias("re"),
        F.col("o_totalprice"),
    )
    ref = None
    for w in (16, 8, 4, 2):
        pairs = interval_overlap_join(l, r, "ls", "le", "rs", "re", bin_width=w)
        agg = pairs.groupBy("urgent_key").agg(F.count(F.lit(1)).alias("n"))
        if ref is None:
            ref = agg
        else:
            assert rows_equal(ref, agg), f"bin width {w} changed results!"
        timed(f"interval int path bin_width={w}", lambda p=pairs: noop(p))


def probe_drift_onepass(spark):
    """profile_drift_report current (2 aggregates) vs grouped single pass."""
    from parquet_to_postgres_spark.queries import load_all

    specs = load_all()
    timed("profile_drift_report (current)", lambda: noop(specs["profile_drift_report"].builder(spark, SF_DIR)))


def probe_pct_array(spark):
    """approx_sketches: two exact percentiles vs one array percentile."""
    t = Catalog(spark, SF_DIR)

    def cur():
        return t.events.groupBy("event_type").agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("user_id").alias("exact_users"),
            F.approx_count_distinct("user_id", rsd=0.02).alias("hll_users"),
            F.percentile_approx("value", 0.5, 10000).alias("p50_approx"),
            F.expr("percentile(value, 0.25)").alias("p25"),
            F.expr("percentile(value, 0.75)").alias("p75"),
        )

    def new():
        return t.events.groupBy("event_type").agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("user_id").alias("exact_users"),
            F.approx_count_distinct("user_id", rsd=0.02).alias("hll_users"),
            F.percentile_approx("value", 0.5, 10000).alias("p50_approx"),
            F.expr("percentile(value, array(0.25D, 0.75D))").alias("pq"),
        ).select(
            "event_type", "n_events", "exact_users", "hll_users", "p50_approx",
            F.col("pq")[0].alias("p25"), F.col("pq")[1].alias("p75"),
        )

    print("equal:", rows_equal(cur(), new()))
    timed("approx_sketches agg two-percentile", lambda: noop(cur()))
    timed("approx_sketches agg array-percentile", lambda: noop(new()))


def probe_etl_pg_parts(spark):
    """Component timings of etl_pg_roundtrip: write / bounds / readback."""
    from parquet_to_postgres_spark.pg import PostgresCopySink, read_back, shared_postgres

    t = Catalog(spark, SF_DIR)
    src = t.lineitem.select(
        "l_orderkey", "l_partkey", "l_returnflag", "l_linestatus",
        "l_extendedprice", "l_shipdate",
    ).withColumn("tags", F.array("l_returnflag", "l_linestatus"))
    pg = shared_postgres()
    assert pg is not None

    def write():
        PostgresCopySink(pg.conninfo(), "lineitem_rt", mode="overwrite", num_partitions=8).write(src)

    def bounds():
        src.agg(F.min("l_orderkey"), F.max("l_orderkey")).collect()

    lo, hi = src.agg(F.min("l_orderkey"), F.max("l_orderkey")).collect()[0]

    def readback():
        back = read_back(
            spark, pg.conninfo(), "lineitem_rt", src.schema,
            partition_column="l_orderkey", lower=int(lo), upper=int(hi),
            num_partitions=8,
        )
        noop(back.groupBy("l_returnflag").agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.countDistinct("l_partkey").alias("n_parts"),
        ))

    timed("etl_pg write (COPY in, 600k)", write)
    timed("etl_pg bounds agg", bounds)
    timed("etl_pg readback+agg (COPY out)", readback)


def probe_stream_overlap(spark):
    """stream_windowed_aggs: sequential vs concurrent stream runs."""
    from pyspark import InheritableThread

    from parquet_to_postgres_spark import streaming as ST

    def seq():
        ST.run_stream_to_df(ST.tumbling_window_counts(ST.events_stream(spark, SF_DIR)), "complete").count()
        ST.run_stream_to_df(ST.sliding_window_counts(ST.events_stream(spark, SF_DIR)), "complete").count()

    def conc():
        out = {}

        def run(name, mk):
            out[name] = ST.run_stream_to_df(mk(ST.events_stream(spark, SF_DIR)), "complete")

        th = [
            InheritableThread(target=run, args=("t", ST.tumbling_window_counts)),
            InheritableThread(target=run, args=("s", ST.sliding_window_counts)),
        ]
        for x in th:
            x.start()
        for x in th:
            x.join()
        out["t"].count(); out["s"].count()

    timed("stream_windowed sequential (current)", seq)
    timed("stream_windowed concurrent (candidate)", conc)


def probe_multi_source_overlap(spark):
    """multi_source_agg: current vs the four write legs run concurrently."""
    from pyspark import InheritableThread

    from parquet_to_postgres_spark.avro import AvroOCFDataSource
    from parquet_to_postgres_spark.etl import read_source
    from parquet_to_postgres_spark.queries import load_all
    from parquet_to_postgres_spark.queries.etl_q import _scratch

    specs = load_all()
    t = Catalog(spark, SF_DIR)

    def threaded():
        spark.dataSource.register(AvroOCFDataSource)

        def w_csv():
            t.orders.select(
                "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice"
            ).write.mode("overwrite").option("header", "true").csv(_scratch("e4/orders_csv"))

        def w_json():
            t.customer.select(
                "c_custkey", "c_name", "c_acctbal", "c_mktsegment"
            ).write.mode("overwrite").json(_scratch("e4/customer_json"))

        def w_orc():
            t.part.select("p_partkey", "p_brand", "p_retailprice").write.mode(
                "overwrite"
            ).orc(_scratch("e4/part_orc"))

        def w_avro():
            t.supplier.select(
                "s_suppkey", "s_nationkey",
                F.col("s_acctbal").cast("decimal(12,2)").alias("s_acctbal"),
            ).write.format("avro_ocf").mode("overwrite").option(
                "codec", "snappy"
            ).save(_scratch("e4/supplier_avro"))

        th = [InheritableThread(target=f) for f in (w_csv, w_json, w_orc, w_avro)]
        for x in th:
            x.start()
        for x in th:
            x.join()
        csv_back = read_source(
            spark, _scratch("e4/orders_csv"), fmt="csv",
            schema="o_orderkey bigint, o_custkey bigint, o_orderstatus string, o_totalprice double",
        )
        json_back = read_source(
            spark, _scratch("e4/customer_json"), fmt="json",
            schema="c_custkey bigint, c_name string, c_acctbal double, c_mktsegment string",
        )
        orc_back = read_source(spark, _scratch("e4/part_orc"), fmt="orc")
        avro_back = spark.read.format("avro_ocf").load(_scratch("e4/supplier_avro"))
        legs = [
            csv_back.groupBy(F.col("o_orderstatus").alias("grp")).agg(
                F.count(F.lit(1)).alias("n_rows"),
                F.sum(F.col("o_totalprice").cast("decimal(12,2)")).cast("double").alias("total"),
            ).select(F.lit("csv").alias("src"), "grp", "n_rows", "total"),
            json_back.groupBy(F.col("c_mktsegment").alias("grp")).agg(
                F.count(F.lit(1)).alias("n_rows"),
                F.sum(F.col("c_acctbal").cast("decimal(12,2)")).cast("double").alias("total"),
            ).select(F.lit("json").alias("src"), "grp", "n_rows", "total"),
            orc_back.groupBy(F.col("p_brand").alias("grp")).agg(
                F.count(F.lit(1)).alias("n_rows"),
                F.sum(F.col("p_retailprice").cast("decimal(12,2)")).cast("double").alias("total"),
            ).select(F.lit("orc").alias("src"), "grp", "n_rows", "total"),
            avro_back.groupBy(F.col("s_nationkey").cast("string").alias("grp")).agg(
                F.count(F.lit(1)).alias("n_rows"),
                F.sum("s_acctbal").cast("double").alias("total"),
            ).select(F.lit("avro").alias("src"), "grp", "n_rows", "total"),
        ]
        out = legs[0]
        for leg in legs[1:]:
            out = out.unionByName(leg)
        noop(out)

    timed("multi_source_agg (current)", lambda: noop(specs["multi_source_agg"].builder(spark, SF_DIR)))
    timed("multi_source_agg threaded (candidate)", threaded)


def probe_span_dup_agg(spark):
    """span_dedup's dup aggregate: fused count+min(struct) SortAggregate
    over ALL occurrences vs count-filter first (HashAggregate) then
    min(struct) over only the duplicated occurrences."""
    from parquet_to_postgres_spark.llm.dedup import unit_id
    from parquet_to_postgres_spark.llm.text import word_ngrams

    t = Catalog(spark, SF_DIR)
    n = 8
    occ = t.documents.select(
        F.col("doc_id").alias("__id"),
        F.posexplode(word_ngrams(F.col("text"), n)).alias("start", "gram"),
    ).select("__id", "start", unit_id("gram").alias("gid"))

    def cur():
        return (
            occ.groupBy("gid")
            .agg(
                F.count(F.lit(1)).alias("__n"),
                F.min(F.struct("__id", "start")).alias("__c"),
            )
            .where(F.col("__n") >= 2)
            .select("gid", "__c")
        )

    def new():
        counts = (
            occ.groupBy("gid")
            .agg(F.count(F.lit(1)).alias("__n"))
            .where(F.col("__n") >= 2)
            .select("gid")
        )
        return (
            occ.join(counts, "gid")
            .groupBy("gid")
            .agg(F.min(F.struct("__id", "start")).alias("__c"))
            .select("gid", "__c")
        )

    a = cur().select("gid", "__c.__id", "__c.start")
    b = new().select("gid", "__c.__id", "__c.start")
    print("equal:", rows_equal(a, b))
    timed("span dup agg fused (current)", lambda: noop(cur()))
    timed("span dup agg count-first (candidate)", lambda: noop(new()))


def probe_etl_pg_variants(spark):
    """COPY write: range-partition (current, pays a sampling pass) vs
    hash repartition; 8 vs 16 connections either way."""
    from parquet_to_postgres_spark.etl import schema_to_pg_ddl
    from parquet_to_postgres_spark.pg import (
        PostgresCopySink,
        prepare_for_copy,
        run_psql,
        shared_postgres,
    )

    t = Catalog(spark, SF_DIR)
    src = t.lineitem.select(
        "l_orderkey", "l_partkey", "l_returnflag", "l_linestatus",
        "l_extendedprice", "l_shipdate",
    ).withColumn("tags", F.array("l_returnflag", "l_linestatus"))
    pg = shared_postgres()
    assert pg is not None

    def write_current(nparts):
        PostgresCopySink(pg.conninfo(), "lineitem_rt", mode="overwrite", num_partitions=nparts).write(src)

    def write_hash(nparts):
        table = "lineitem_rt"
        ddl = schema_to_pg_ddl(table, src.schema)
        run_psql(pg.conninfo(), f"DROP TABLE IF EXISTS {table};")
        run_psql(pg.conninfo(), ddl)
        prepared = prepare_for_copy(src).repartition(nparts, src.columns[0])
        col_list = ", ".join(prepared.columns)
        from parquet_to_postgres_spark.pg import _CSV_OPTS

        lines = prepared.select(F.to_csv(F.struct(*prepared.columns), _CSV_OPTS).alias("line"))
        conninfo = dict(pg.conninfo())

        def _copy_partition(batches):
            import pandas as pd

            n, chunks = 0, []
            for pdf in batches:
                if len(pdf):
                    n += len(pdf)
                    chunks.append("\n".join(pdf["line"]))
            if n:
                run_psql(
                    conninfo,
                    f"COPY {table} ({col_list}) FROM STDIN (FORMAT CSV, NULL '')",
                    stdin="\n".join(chunks) + "\n",
                )
            yield pd.DataFrame({"n": [n]})

        lines.mapInPandas(_copy_partition, schema="n long").agg(F.sum("n")).collect()

    for nparts in (8, 16):
        timed(f"etl_pg write range nparts={nparts}", lambda n=nparts: write_current(n))
        timed(f"etl_pg write hash  nparts={nparts}", lambda n=nparts: write_hash(n))


def probe_etl_jdbc_batch(spark):
    """etl_jdbc_roundtrip batchsize / partition sensitivity."""
    from parquet_to_postgres_spark.etl import JdbcSink
    from parquet_to_postgres_spark.queries.etl_q import DERBY_DRIVER, derby_url

    t = Catalog(spark, SF_DIR)
    src = t.orders.select(
        "o_orderkey", "o_orderstatus", "o_orderpriority", "o_totalprice"
    ).withColumn("tags", F.array("o_orderstatus", "o_orderpriority"))
    for bs, np_ in ((2000, 4), (10000, 4), (10000, 8)):
        sink = JdbcSink(
            url=derby_url("etlrt"), table="orders_rt", mode="overwrite",
            num_partitions=np_, batchsize=bs, options={"driver": DERBY_DRIVER},
        )
        timed(f"etl_jdbc write batchsize={bs} nparts={np_}", lambda s=sink: s.write(src))


def _seq_overlap(background, main=lambda: None):
    """Sequential twin of concurrency.overlap — replays the pre-overlap
    ordering (main leg first, then each background leg in turn) so the
    CURRENT implementation can be timed against the overlapped candidate
    in one session by patching the call site's ``overlap`` symbol."""
    r = main()
    return r, [fn() for fn in background]


def _released(spark, fn):
    """Run fn and release any RDD blocks it pinned (bench between-repeat
    hygiene, so every probe repeat pays the same cold-data cost)."""
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


def _canon(df):
    """Canonical sorted row-tuple list — collected BEFORE any release."""
    ca = sorted(df.columns)
    return sorted(tuple(str(r[c]) for c in ca) for r in df.collect())


def probe_ann_prep_overlap(spark):
    """ann_topk: sequential prep checkpoints + dim probe vs overlapped."""
    import parquet_to_postgres_spark.llm.similarity as S
    from parquet_to_postgres_spark.queries.llm_q import ann_topk

    real = S.overlap

    def run():
        noop(ann_topk(spark, SF_DIR))

    S.overlap = _seq_overlap
    try:
        cur = _released(spark, lambda: _canon(ann_topk(spark, SF_DIR)))
        S.overlap = real
        cand = _released(spark, lambda: _canon(ann_topk(spark, SF_DIR)))
        print("equal:", cur == cand)
        S.overlap = _seq_overlap
        timed("ann_topk prep sequential (current)", lambda: _released(spark, run))
        S.overlap = real
        timed("ann_topk prep overlapped (candidate)", lambda: _released(spark, run))
    finally:
        S.overlap = real


def probe_etl_bounds_overlap(spark):
    """etl roundtrips: bounds agg after the write vs overlapped with it."""
    import parquet_to_postgres_spark.queries.etl_q as E

    real = E.overlap
    try:
        for qname in ("etl_jdbc_roundtrip", "etl_pg_roundtrip"):
            builder = E.__dict__[qname]
            E.overlap = _seq_overlap
            cur = _released(spark, lambda: _canon(builder(spark, SF_DIR)))
            E.overlap = real
            cand = _released(spark, lambda: _canon(builder(spark, SF_DIR)))
            print(f"{qname} equal:", cur == cand)
            E.overlap = _seq_overlap
            timed(
                f"{qname} bounds sequential (current)",
                lambda b=builder: _released(spark, lambda: noop(b(spark, SF_DIR))),
            )
            E.overlap = real
            timed(
                f"{qname} bounds overlapped (candidate)",
                lambda b=builder: _released(spark, lambda: noop(b(spark, SF_DIR))),
            )
    finally:
        E.overlap = real


def probe_t6_prune(spark):
    """stateful_user_totals: full-width stream vs §4 column-pruned."""
    import parquet_to_postgres_spark.streaming.ops as ST
    from pyspark.sql.streaming.state import GroupStateTimeout

    def wide(stream):
        # the pre-r15b shape: every stream column through the shuffle
        # and the Arrow boundary
        return stream.groupBy("user_id").applyInPandasWithState(
            ST._user_totals_fn,
            outputStructType=ST._T6_OUTPUT,
            stateStructType=ST._STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )

    def run(op):
        return ST.run_stream_to_df(
            op(ST.events_stream(spark, SF_DIR)), "update"
        )

    cur = _released(spark, lambda: run(wide).collect())
    cand = _released(spark, lambda: run(ST.stateful_user_totals).collect())
    print("equal:", sorted(map(str, cur)) == sorted(map(str, cand)))
    timed(
        "stream_user_totals wide (current)",
        lambda: _released(spark, lambda: noop(run(wide))),
    )
    timed(
        "stream_user_totals pruned (candidate)",
        lambda: _released(spark, lambda: noop(run(ST.stateful_user_totals))),
    )


def probe_ann_overlap_interleaved(spark):
    """ann_topk prep overlap, A/B INTERLEAVED (seq, cand, ...) — the
    ambient-robust form: batched ordering hands whichever side ran
    during a host-steal spike an unearned loss."""
    import time as _time

    import parquet_to_postgres_spark.llm.similarity as S
    from parquet_to_postgres_spark.queries.llm_q import ann_topk

    real = S.overlap
    seq, cand = [], []
    try:
        for _ in range(4):
            S.overlap = _seq_overlap
            t0 = _time.perf_counter()
            _released(spark, lambda: noop(ann_topk(spark, SF_DIR)))
            seq.append(round(_time.perf_counter() - t0, 3))
            S.overlap = real
            t0 = _time.perf_counter()
            _released(spark, lambda: noop(ann_topk(spark, SF_DIR)))
            cand.append(round(_time.perf_counter() - t0, 3))
    finally:
        S.overlap = real
    print(f"{'ann_topk prep sequential (interleaved)':42s} {seq} min={min(seq)}")
    print(f"{'ann_topk prep overlapped (interleaved)':42s} {cand} min={min(cand)}")


def probe_etl_pg_bounds_interleaved(spark):
    """etl_pg_roundtrip bounds overlap, A/B INTERLEAVED (seq, cand,
    seq, cand, ...): the batched ordering penalizes whichever side runs
    first with server warmup / ambient spikes — the first batched run
    of this probe read 17.5 s against a 4.7 s steady state."""
    import time as _time

    import parquet_to_postgres_spark.queries.etl_q as E

    real = E.overlap
    builder = E.__dict__["etl_pg_roundtrip"]
    seq, cand = [], []
    try:
        for _ in range(4):
            E.overlap = _seq_overlap
            t0 = _time.perf_counter()
            _released(spark, lambda: noop(builder(spark, SF_DIR)))
            seq.append(round(_time.perf_counter() - t0, 3))
            E.overlap = real
            t0 = _time.perf_counter()
            _released(spark, lambda: noop(builder(spark, SF_DIR)))
            cand.append(round(_time.perf_counter() - t0, 3))
    finally:
        E.overlap = real
    print(f"{'etl_pg bounds sequential (interleaved)':42s} {seq} min={min(seq)}")
    print(f"{'etl_pg bounds overlapped (interleaved)':42s} {cand} min={min(cand)}")


def probe_cube_preagg(spark):
    """cube_orders: direct cube vs pre-aggregated two-level cube."""
    from parquet_to_postgres_spark.queries.aggregates_q import cube_orders

    t = Catalog(spark, SF_DIR)

    def candidate():
        # grain pre-aggregate first: the cube's Expand multiplier then
        # applies to |distinct (status, priority, custkey)| rows, not
        # |orders| rows; decimal partial sums are exact and associative
        pre = t.orders.groupBy(
            "o_orderstatus", "o_orderpriority", "o_custkey"
        ).agg(
            F.count(F.lit(1)).alias("__n"),
            F.sum(F.col("o_totalprice").cast("decimal(12,2)")).alias("__t"),
        )
        return pre.cube("o_orderstatus", "o_orderpriority").agg(
            F.sum("__n").alias("n_orders"),
            F.countDistinct("o_custkey").alias("n_customers"),
            F.sum("__t").cast("double").alias("total"),
        )

    n = t.orders.count()
    npre = t.orders.select(
        "o_orderstatus", "o_orderpriority", "o_custkey"
    ).distinct().count()
    print(f"orders rows={n} preagg rows={npre}")
    cur, cand = cube_orders(spark, SF_DIR), candidate()
    print("equal:", rows_equal(cur, cand))
    timed("cube_orders direct (current)", lambda: noop(cube_orders(spark, SF_DIR)))
    timed("cube_orders preagg (candidate)", lambda: noop(candidate()))


PROBES = {
    "minhash_profiles": probe_minhash_profiles,
    "ann_prep_overlap": probe_ann_prep_overlap,
    "ann_overlap_interleaved": probe_ann_overlap_interleaved,
    "etl_bounds_overlap": probe_etl_bounds_overlap,
    "etl_pg_bounds_interleaved": probe_etl_pg_bounds_interleaved,
    "t6_prune": probe_t6_prune,
    "cube_preagg": probe_cube_preagg,
    "interval_bins": probe_interval_bins,
    "drift_onepass": probe_drift_onepass,
    "pct_array": probe_pct_array,
    "etl_pg_parts": probe_etl_pg_parts,
    "etl_pg_variants": probe_etl_pg_variants,
    "span_dup_agg": probe_span_dup_agg,
    "etl_jdbc_batch": probe_etl_jdbc_batch,
    "stream_overlap": probe_stream_overlap,
    "multi_source_overlap": probe_multi_source_overlap,
}


def main() -> int:
    spark = get_spark("r15_probes")
    spark.sparkContext.setLogLevel("ERROR")
    spark.read.parquet(f"{SF_DIR}/lineitem.parquet").count()  # warm
    for name in sys.argv[1:] or list(PROBES):
        print(f"== {name} ==")
        PROBES[name](spark)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
