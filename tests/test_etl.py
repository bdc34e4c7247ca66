"""ETL core (SURVEY.md §2B E1–E4): DDL mapping, null round-trips, sinks."""

from __future__ import annotations

import tempfile

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F
from pyspark.sql import types as T

from parquet_to_postgres_spark.etl import (
    JdbcSink,
    ParquetSink,
    etl,
    flatten_for_jdbc,
    pg_type,
    read_source,
    schema_to_pg_ddl,
)

from .conftest import SF_SMOKE


def test_schema_to_pg_ddl_full_map():
    schema = T.StructType(
        [
            T.StructField("b", T.BooleanType()),
            T.StructField("i2", T.ShortType()),
            T.StructField("i4", T.IntegerType()),
            T.StructField("i8", T.LongType(), nullable=False),
            T.StructField("f4", T.FloatType()),
            T.StructField("f8", T.DoubleType()),
            T.StructField("s", T.StringType()),
            T.StructField("raw", T.BinaryType()),
            T.StructField("d", T.DateType()),
            T.StructField("ts", T.TimestampType()),
            T.StructField("num", T.DecimalType(18, 4)),
            T.StructField("arr", T.ArrayType(T.FloatType())),
        ]
    )
    ddl = schema_to_pg_ddl("t", schema)
    assert ddl == (
        "CREATE TABLE IF NOT EXISTS t (\n"
        "  b BOOLEAN,\n"
        "  i2 SMALLINT,\n"
        "  i4 INTEGER,\n"
        "  i8 BIGINT NOT NULL,\n"
        "  f4 REAL,\n"
        "  f8 DOUBLE PRECISION,\n"
        "  s TEXT,\n"
        "  raw BYTEA,\n"
        "  d DATE,\n"
        "  ts TIMESTAMP,\n"
        "  num NUMERIC(18,4),\n"
        "  arr JSONB\n"
        ");"
    )


def test_pg_type_rejects_unmapped():
    with pytest.raises(TypeError):
        pg_type(T.NullType())


def test_ddl_from_real_footer(spark):
    """E2 on a real parquet footer — the reference's whole Flow A."""
    df = spark.read.parquet(f"{SF_SMOKE}/orders.parquet")
    ddl = schema_to_pg_ddl("orders", df.schema)
    assert "o_orderkey BIGINT" in ddl
    assert "o_orderdate TIMESTAMP" in ddl
    assert "o_totalprice DOUBLE PRECISION" in ddl


def test_flatten_nested_and_null_roundtrip(spark):
    """NULLs survive the pipeline (the reference corrupts them,
    /root/reference/src/main.rs:157 et al.) and nested cols become JSON."""
    rows = [
        Row(k=1, v=2.5, arr=[1, 2], name="a"),
        Row(k=2, v=None, arr=None, name=None),
    ]
    df = spark.createDataFrame(rows)
    flat = flatten_for_jdbc(df)
    assert dict(flat.dtypes)["arr"] == "string"
    got = {r["k"]: r for r in flat.collect()}
    assert got[2]["v"] is None and got[2]["arr"] is None and got[2]["name"] is None
    assert got[1]["arr"] == "[1,2]"


def test_etl_parquet_sink_roundtrip(spark):
    with tempfile.TemporaryDirectory() as d:
        ddl = etl(spark, f"{SF_SMOKE}/nation.parquet", ParquetSink(f"{d}/out"))
        assert "CREATE TABLE IF NOT EXISTS" in ddl
        back = spark.read.parquet(f"{d}/out")
        src = spark.read.parquet(f"{SF_SMOKE}/nation.parquet")
        assert back.count() == src.count() == 25
        assert sorted(back.columns) == sorted(src.columns)


def test_jdbc_sink_writer_config(spark):
    """E3: the JDBC writer's option plumbing and pre-write shaping —
    everything short of the network call (no Postgres in the sandbox).

    Mirrors /root/reference/src/main.rs:120-151: num_partitions is the
    semaphore (connection cap), batchsize the 1000-row record batches."""
    sink = JdbcSink(
        url="jdbc:postgresql://db:5432/x",
        table="events_out",
        num_partitions=4,
        batchsize=2500,
        options={"reWriteBatchedInserts": "true"},
    )
    opts = sink.jdbc_options()
    assert opts["url"] == "jdbc:postgresql://db:5432/x"
    assert opts["dbtable"] == "events_out"
    assert opts["batchsize"] == "2500"
    assert opts["numPartitions"] == "4"
    assert opts["isolationLevel"] == "READ_COMMITTED"
    assert opts["reWriteBatchedInserts"] == "true"
    assert sink.mode == "append"

    df = spark.read.parquet(f"{SF_SMOKE}/orders.parquet").limit(200)
    nested = df.withColumn("tags", F.array(F.col("o_orderstatus")))
    prepared = sink.prepare(nested)
    # nested column serialized for the relational sink...
    assert dict(prepared.dtypes)["tags"] == "string"
    # ...and the pre-shuffle matches the connection cap exactly.
    assert prepared.rdd.getNumPartitions() == 4


def test_partitioned_parquet_sink_prunes(spark):
    """Hive-layout sink: partition dirs exist and a partition-column
    filter prunes to one directory at planning time (the 100 TB
    read-side contract — PartitionFilters, not data filters)."""
    import os

    src = spark.read.parquet(f"{SF_SMOKE}/orders.parquet")
    with tempfile.TemporaryDirectory() as d:
        etl(
            spark,
            f"{SF_SMOKE}/orders.parquet",
            ParquetSink(f"{d}/out", partition_by=("o_orderstatus",)),
        )
        dirs = {e for e in os.listdir(f"{d}/out") if e.startswith("o_orderstatus=")}
        assert dirs == {
            f"o_orderstatus={r[0]}"
            for r in src.select("o_orderstatus").distinct().collect()
        }
        back = spark.read.parquet(f"{d}/out")
        picked = back.where(F.col("o_orderstatus") == "F")
        # planning-time pruning: the predicate lands in PartitionFilters
        # (directory-level skip), not PushedFilters (row-group level)
        plan = picked._jdf.queryExecution().executedPlan().toString()
        part_filters = plan.split("PartitionFilters: [")[1].split("]")[0]
        assert "o_orderstatus" in part_filters and "= F" in part_filters
        assert picked.count() == src.where(F.col("o_orderstatus") == "F").count()


def test_orc_source_roundtrip(spark):
    """E4: ORC through the same generalized reader/ETL path."""
    src = spark.read.parquet(f"{SF_SMOKE}/nation.parquet")
    with tempfile.TemporaryDirectory() as d:
        src.write.orc(f"{d}/orc")
        back = read_source(spark, f"{d}/orc", "orc")
        assert sorted(map(tuple, back.collect())) == sorted(
            map(tuple, src.collect())
        )
        ddl = etl(spark, f"{d}/orc", ParquetSink(f"{d}/out"), source_format="orc")
        assert "CREATE TABLE IF NOT EXISTS" in ddl
        assert spark.read.parquet(f"{d}/out").count() == 25


def test_csv_json_sources_roundtrip(spark):
    """E4: CSV and JSON sources with explicit schema round-trip nation."""
    src = spark.read.parquet(f"{SF_SMOKE}/nation.parquet")
    with tempfile.TemporaryDirectory() as d:
        src.write.option("header", "true").csv(f"{d}/csv")
        src.write.json(f"{d}/json")
        csv_back = read_source(spark, f"{d}/csv", "csv", schema=src.schema)
        json_back = read_source(spark, f"{d}/json", "json", schema=src.schema)
        assert sorted(map(tuple, csv_back.collect())) == sorted(
            map(tuple, src.collect())
        )
        assert sorted(map(tuple, json_back.collect())) == sorted(
            map(tuple, src.collect())
        )


def test_compact_parquet_reduces_file_count(spark):
    """Many tiny files -> few right-sized files, identical data."""
    from parquet_to_postgres_spark.etl import compact_parquet

    src = spark.read.parquet(f"{SF_SMOKE}/orders.parquet")
    with tempfile.TemporaryDirectory() as d:
        src.repartition(40).write.parquet(f"{d}/tiny")
        assert len(spark.read.parquet(f"{d}/tiny").inputFiles()) == 40
        n = compact_parquet(
            spark,
            f"{d}/tiny",
            f"{d}/compact",
            target_file_bytes=10 << 20,
            sort_within_by=["o_orderkey"],
        )
        assert n < 40
        back = spark.read.parquet(f"{d}/compact")
        assert back.count() == src.count()
        assert sorted(map(tuple, back.collect())) == sorted(
            map(tuple, src.collect())
        )


def test_merge_upsert_keep_latest(spark):
    from pyspark.sql import Row

    from parquet_to_postgres_spark.etl import merge_upsert

    target = spark.createDataFrame(
        [
            Row(k=1, v="old", ver=1),
            Row(k=2, v="keep", ver=5),
            Row(k=3, v="old3", ver=2),
        ]
    )
    updates = spark.createDataFrame(
        [
            Row(k=1, v="new", ver=2),     # newer -> replaces
            Row(k=2, v="stale", ver=3),   # older -> ignored
            Row(k=3, v="tie", ver=2),     # tie -> update wins
            Row(k=4, v="insert", ver=1),  # new key -> inserted
        ]
    )
    got = {
        r["k"]: (r["v"], r["ver"])
        for r in merge_upsert(target, updates, keys=["k"], version_col="ver").collect()
    }
    assert got == {
        1: ("new", 2),
        2: ("keep", 5),
        3: ("tie", 2),
        4: ("insert", 1),
    }


def test_dynamic_partition_pruning_on_hive_layout(spark):
    """The partitioned sink's layout composes with runtime join pruning:
    a filtered dimension join against the hive-partitioned fact must
    plan a dynamicpruning subquery on the partition column — at scale,
    only the matching partition directories are scanned even though the
    matching keys are unknown until runtime."""
    conf = {
        "spark.sql.optimizer.dynamicPartitionPruning.useStats": "false",
        "spark.sql.optimizer.dynamicPartitionPruning.fallbackFilterRatio": "10.0",
    }
    prev = {k: spark.conf.get(k, None) for k in conf}
    for k, v in conf.items():
        spark.conf.set(k, v)
    try:
        with tempfile.TemporaryDirectory() as d:
            etl(
                spark,
                f"{SF_SMOKE}/orders.parquet",
                ParquetSink(f"{d}/fact", partition_by=("o_orderstatus",)),
            )
            spark.createDataFrame(
                [("F", "final"), ("O", "open"), ("P", "pending")],
                "o_orderstatus string, label string",
            ).write.parquet(f"{d}/dim")
            fact = spark.read.parquet(f"{d}/fact")
            dim = spark.read.parquet(f"{d}/dim").where(F.col("label") == "final")
            joined = fact.join(dim, "o_orderstatus")
            p = joined._jdf.queryExecution().executedPlan().toString()
            assert "dynamicpruning" in p.lower()
            src = spark.read.parquet(f"{SF_SMOKE}/orders.parquet")
            assert (
                joined.count()
                == src.where(F.col("o_orderstatus") == "F").count()
            )
    finally:
        for k, v in prev.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_scd2_apply_versions_history(spark):
    """Type-2 semantics: open rows close at the key's first update ts,
    same-batch updates chain into adjacent intervals, untouched keys and
    already-closed rows pass through; exactly one open row per key."""
    from parquet_to_postgres_spark.etl import scd2_apply

    history = spark.createDataFrame(
        [
            # k=1: one closed + one open version
            (1, "v0", 0, 10),
            (1, "v1", 10, None),
            # k=2: open, untouched by this batch
            (2, "w0", 5, None),
        ],
        "k long, val string, valid_from long, valid_to long",
    )
    updates = spark.createDataFrame(
        [(1, "v2", 20), (1, "v3", 30), (3, "x0", 7)],
        "k long, val string, ts long",
    )
    out = scd2_apply(history, updates, keys=["k"], ts_col="ts")
    rows = {
        (r["k"], r["val"]): (r["valid_from"], r["valid_to"])
        for r in out.collect()
    }
    assert rows == {
        (1, "v0"): (0, 10),
        (1, "v1"): (10, 20),   # closed by first update
        (1, "v2"): (20, 30),   # chained within the batch
        (1, "v3"): (30, None),
        (2, "w0"): (5, None),  # untouched
        (3, "x0"): (7, None),  # brand-new key
    }
    open_per_key = {}
    for (k, _), (_, vt) in rows.items():
        if vt is None:
            open_per_key[k] = open_per_key.get(k, 0) + 1
    assert all(n == 1 for n in open_per_key.values())
    # intervals per key are non-overlapping and contiguous once sorted
    for k in (1,):
        iv = sorted(
            (vf, vt) for (kk, _), (vf, vt) in rows.items() if kk == k
        )
        for (f1, t1), (f2, _) in zip(iv, iv[1:]):
            assert t1 == f2


def test_compact_parquet_partitioned_layout(spark):
    """Recursive listing sizes a hive-partitioned table correctly and
    partition_by preserves the layout on rewrite (a non-recursive
    listing saw 0 bytes and collapsed the table to one flat file)."""
    from parquet_to_postgres_spark.etl import ParquetSink, compact_parquet

    src = spark.read.parquet(f"{SF_SMOKE}/orders.parquet")
    with tempfile.TemporaryDirectory() as d:
        ParquetSink(f"{d}/part", partition_by=("o_orderstatus",)).write(
            src.repartition(8)
        )
        n = compact_parquet(
            spark,
            f"{d}/part",
            f"{d}/compact",
            target_file_bytes=64 << 10,
            partition_by=("o_orderstatus",),
        )
        assert n > 1  # recursive listing saw real bytes, not 0 -> 1 file
        back = spark.read.parquet(f"{d}/compact")
        # hive layout preserved: partition dirs exist and data is intact
        assert any("o_orderstatus=" in f for f in back.inputFiles())
        assert back.count() == src.count()
        assert sorted(
            map(tuple, back.select(*sorted(back.columns)).collect())
        ) == sorted(map(tuple, src.select(*sorted(back.columns)).collect()))


# ---- executed JDBC path (embedded Derby — on Spark's own classpath) ----


def test_jdbc_sink_executes_full_etl_roundtrip(spark):
    """JdbcSink.write actually executes: the whole etl() pipeline lands
    nation in an embedded-Derby table and every row/value survives the
    read-back (not a config assertion — a live .format('jdbc').save())."""
    from parquet_to_postgres_spark.queries.etl_q import (
        DERBY_DRIVER,
        derby_url,
        read_jdbc,
    )

    url = derby_url("t_etl_nation")
    sink = JdbcSink(
        url=url,
        table="nation_rt",
        mode="overwrite",
        num_partitions=3,
        batchsize=7,
        options={"driver": DERBY_DRIVER},
    )
    ddl = etl(spark, f"{SF_SMOKE}/nation.parquet", sink)
    assert ddl.startswith("CREATE TABLE IF NOT EXISTS nation_rt")
    src = spark.read.parquet(f"{SF_SMOKE}/nation.parquet")
    back = read_jdbc(spark, url, "nation_rt")
    cols = sorted(src.columns)
    assert sorted(back.columns) == cols
    assert sorted(map(tuple, back.select(*cols).collect())) == sorted(
        map(tuple, src.select(*cols).collect())
    )


def test_jdbc_sink_write_modes(spark):
    """append accumulates, overwrite resets — both executed on Derby."""
    from parquet_to_postgres_spark.queries.etl_q import (
        DERBY_DRIVER,
        derby_url,
        read_jdbc,
    )

    url = derby_url("t_etl_modes")
    df = spark.range(10).withColumnRenamed("id", "k")

    def sink(mode):
        return JdbcSink(
            url=url,
            table="modes_rt",
            mode=mode,
            num_partitions=2,
            batchsize=4,
            options={"driver": DERBY_DRIVER},
        )

    sink("overwrite").write(df)
    assert read_jdbc(spark, url, "modes_rt").count() == 10
    sink("append").write(df)
    assert read_jdbc(spark, url, "modes_rt").count() == 20
    sink("overwrite").write(df)
    assert read_jdbc(spark, url, "modes_rt").count() == 10


def test_jdbc_sink_flattens_nested_to_json(spark):
    """Array/struct/map columns land as their to_json strings (the
    reference errors on nested input, main.rs:205-208) — executed, and
    value-checked after the Derby round-trip."""
    from parquet_to_postgres_spark.queries.etl_q import (
        DERBY_DRIVER,
        derby_url,
        read_jdbc,
    )

    url = derby_url("t_etl_nested")
    df = spark.createDataFrame(
        [(1, [1, 2], {"a": 1}, ("x", 9)), (2, [3], {"b": 2}, ("y", 8))],
        "id long, arr array<int>, m map<string,int>, st struct<s:string,n:int>",
    )
    JdbcSink(
        url=url,
        table="nested_rt",
        mode="overwrite",
        num_partitions=1,
        batchsize=10,
        options={"driver": DERBY_DRIVER},
    ).write(df)
    back = read_jdbc(spark, url, "nested_rt")
    got = {r["id"]: (r["arr"], r["m"], r["st"]) for r in back.collect()}
    want = {
        r["id"]: (r["arr"], r["m"], r["st"])
        for r in flatten_for_jdbc(df).collect()
    }
    assert got == want
    assert got[1][0] == "[1,2]" and got[1][1] == '{"a":1}'
    assert got[1][2] == '{"s":"x","n":9}'


def test_read_source_infer_guard(spark):
    """CSV/JSON without an explicit schema warns (inference = an extra
    full pass) and errors outright above the size guard."""
    import warnings

    import pytest

    from parquet_to_postgres_spark.etl import read_source
    from parquet_to_postgres_spark.tables import load_table

    with tempfile.TemporaryDirectory() as d:
        load_table(spark, SF_SMOKE, "region").write.option(
            "header", "true"
        ).csv(f"{d}/csv")
        # explicit schema: silent
        schema = load_table(spark, SF_SMOKE, "region").schema
        with warnings.catch_warnings():
            warnings.simplefilter("error")
            read_source(spark, f"{d}/csv", "csv", schema=schema)
        # inference: warns
        with pytest.warns(UserWarning, match="full extra pass"):
            df = read_source(spark, f"{d}/csv", "csv")
        assert df.count() == 5
        # inference above the guard: hard error
        with pytest.warns(UserWarning):
            with pytest.raises(ValueError, match="no explicit schema"):
                read_source(spark, f"{d}/csv", "csv", max_infer_bytes=1)


def test_xml_and_text_sources_roundtrip(spark):
    """E4: Spark 4's native XML source and the line-text source through
    the same generalized reader — XML needs rowTag; text yields one
    `value` line per row (the raw-corpus ingestion shape)."""
    src = spark.read.parquet(f"{SF_SMOKE}/nation.parquet")
    with tempfile.TemporaryDirectory() as d:
        src.write.option("rootTag", "nations").option("rowTag", "nation").format(
            "xml"
        ).save(f"{d}/xml")
        back = read_source(
            spark, f"{d}/xml", "xml", schema=src.schema, rowTag="nation"
        )
        assert sorted(map(tuple, back.collect())) == sorted(
            map(tuple, src.collect())
        )

        lines = src.select(F.col("n_name").alias("value"))
        lines.write.text(f"{d}/text")
        tback = read_source(spark, f"{d}/text", "text")
        assert sorted(r["value"] for r in tback.collect()) == sorted(
            r["value"] for r in lines.collect()
        )


def test_etl_cli_ddl_only_and_parquet_sink(spark, capsys):
    """The CLI's fast paths: --ddl-only prints executable-shaped DDL;
    --parquet-out runs the full read->DDL->sink pipeline."""
    import sys

    sys.path.insert(0, "tools")
    import etl_cli

    rc = etl_cli.main(
        [f"{SF_SMOKE}/nation.parquet", "--table", "nation_t", "--ddl-only"]
    )
    out = capsys.readouterr().out
    assert rc == 0
    assert "CREATE TABLE IF NOT EXISTS nation_t" in out
    assert "n_nationkey INTEGER" in out

    with tempfile.TemporaryDirectory() as d:
        rc = etl_cli.main(
            [f"{SF_SMOKE}/nation.parquet", "--table", "nation_t",
             "--parquet-out", f"{d}/out"]
        )
        assert rc == 0
        assert spark.read.parquet(f"{d}/out").count() == 25


# ---- exactly-once streaming → JDBC (stage + atomic publish) ----


def test_exactly_once_jdbc_sink_publish_and_replay(spark):
    """write_batch publishes once per batch_id: a replayed batch is a
    no-op (ledger hit), a new batch appends, and every value survives
    the Derby round-trip — all executed, not mocked."""
    from parquet_to_postgres_spark.etl import ExactlyOnceJdbcSink
    from parquet_to_postgres_spark.queries.etl_q import (
        DERBY_DRIVER,
        derby_url,
        read_jdbc,
    )

    url = derby_url("t_xonce")
    nation = spark.read.parquet(f"{SF_SMOKE}/nation.parquet")
    b0 = nation.where(F.col("n_nationkey") < 10)
    b1 = nation.where(F.col("n_nationkey") >= 10)
    sink = ExactlyOnceJdbcSink(
        url=url,
        table="nation_x",
        num_partitions=2,
        batchsize=5,
        options={"driver": DERBY_DRIVER},
    )

    assert sink.write_batch(b0, 0) is True
    n0 = read_jdbc(spark, url, "nation_x").count()
    assert n0 == b0.count()

    # replay of a committed batch: skipped, rows unchanged
    assert sink.write_batch(b0, 0) is False
    assert read_jdbc(spark, url, "nation_x").count() == n0

    # a genuinely new batch appends
    assert sink.write_batch(b1, 1) is True
    back = read_jdbc(spark, url, "nation_x")
    cols = sorted(nation.columns)
    assert sorted(map(tuple, back.select(*cols).collect())) == sorted(
        map(tuple, nation.select(*cols).collect())
    )
    assert sink.is_committed(spark, 0) and sink.is_committed(spark, 1)
    assert not sink.is_committed(spark, 2)


def test_stream_to_jdbc_exactly_once_multi_batch(spark):
    """Continuous reference path: a multi-micro-batch file stream lands
    in Derby through ExactlyOnceJdbcSink via foreachBatch; total rows
    equal the source, the epoch ledger holds every batch, and manually
    replaying a finished batch adds nothing."""
    from parquet_to_postgres_spark.etl import ExactlyOnceJdbcSink
    from parquet_to_postgres_spark.queries.etl_q import (
        DERBY_DRIVER,
        derby_url,
        read_jdbc,
    )
    from parquet_to_postgres_spark.streaming import ops

    url = derby_url("t_xonce_stream")
    src = spark.read.parquet(f"{SF_SMOKE}/events.parquet").select(
        "event_id", "user_id", "value"
    )
    with tempfile.TemporaryDirectory() as d:
        src.repartition(3).write.parquet(f"{d}/in")
        stream = (
            spark.readStream.schema(src.schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(f"{d}/in")
        )
        sink = ExactlyOnceJdbcSink(
            url=url,
            table="events_x",
            num_partitions=2,
            batchsize=500,
            options={"driver": DERBY_DRIVER},
        )
        ops.run_stream_to_sink(stream, sink, f"{d}/ckpt")

        back = read_jdbc(spark, url, "events_x")
        assert back.count() == src.count()
        committed = [b for b in range(5) if sink.is_committed(spark, b)]
        assert len(committed) >= 2, f"expected multi-batch run: {committed}"

        # replay a finished micro-batch through the same foreachBatch hook
        replay = src.limit(50).localCheckpoint(eager=True)
        ops.foreach_batch_writer(sink)(replay, committed[0])
        assert read_jdbc(spark, url, "events_x").count() == src.count()

        # full contents survived (values, not just counts)
        cols = sorted(src.columns)
        assert sorted(map(tuple, back.select(*cols).collect())) == sorted(
            map(tuple, src.select(*cols).collect())
        )


def test_write_training_shards_deterministic_balanced_complete(spark):
    """Shard export: the union of shards IS the source (no loss, no
    dup), counts are balanced, the manifest agrees with the data, and
    two runs produce identical shard assignments; a different salt
    re-deals them."""
    from parquet_to_postgres_spark.etl import write_training_shards

    src = spark.read.parquet(f"{SF_SMOKE}/documents.parquet").select(
        "doc_id", "text"
    )
    n = src.count()
    with tempfile.TemporaryDirectory() as d:
        m1 = write_training_shards(src, f"{d}/a", n_shards=8)
        assert m1["__total__"] == n
        back = spark.read.parquet(f"{d}/a")
        assert back.count() == n
        assert back.select("doc_id").distinct().count() == n
        per = [v for k, v in m1.items() if k != "__total__"]
        assert len(per) == 8 and min(per) > 0
        assert max(per) < 3 * min(per), m1  # balanced in expectation

        manifest = {
            r["shard"]: r["rows"]
            for r in spark.read.json(f"{d}/a/_manifest").collect()
        }
        assert manifest == {str(k): v for k, v in m1.items() if k != "__total__"} | {
            "__total__": n
        }

        m2 = write_training_shards(src, f"{d}/b", n_shards=8)
        a = sorted(map(tuple, spark.read.parquet(f"{d}/a").collect()))
        b = sorted(map(tuple, spark.read.parquet(f"{d}/b").collect()))
        assert a == b and m1 == m2

        m3 = write_training_shards(src, f"{d}/c", n_shards=8, salt=7)
        assert m3["__total__"] == n and m3 != m1


def test_jdbc_table_exists_escapes_like_wildcards(spark):
    """getTables patterns are LIKEs where '_' matches any char: probing
    for 'orders_x' must NOT report lookalike 'ordersax' as existing
    (review finding — an unescaped probe skips the CREATE and the sink
    then fails on the genuinely missing table)."""
    from parquet_to_postgres_spark.etl import (
        _driver_jdbc_conn,
        _jdbc_table_exists,
    )
    from parquet_to_postgres_spark.queries.etl_q import (
        DERBY_DRIVER,
        derby_url,
    )

    import uuid

    url = derby_url(f"t_like_escape_{uuid.uuid4().hex[:8]}")
    conn = _driver_jdbc_conn(spark, url, DERBY_DRIVER)
    try:
        st = conn.createStatement()
        st.executeUpdate("CREATE TABLE ordersax (x INT)")
        st.close()
        assert _jdbc_table_exists(conn, "ordersax")
        assert not _jdbc_table_exists(conn, "orders_x")
    finally:
        conn.close()


def test_training_shards_append_single_manifest(spark):
    """A second (append-mode) shard write must REPLACE the manifest, not
    sit beside the first — consumers read one generation of counts."""
    import tempfile

    from parquet_to_postgres_spark.etl import write_training_shards

    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet").select(
        "doc_id", "text"
    )
    a = docs.where(F.col("doc_id") % 2 == 0)
    b = docs.where(F.col("doc_id") % 2 == 1)
    with tempfile.TemporaryDirectory() as d:
        write_training_shards(a, d, n_shards=4)
        m2 = write_training_shards(b, d, n_shards=4, mode="append")
        back = spark.read.json(f"{d}/_manifest")
        totals = back.where(F.col("shard") == "__total__").collect()
        assert len(totals) == 1  # exactly one manifest generation
        assert int(totals[0]["rows"]) == m2["__total__"] == docs.count()


def test_training_shards_jsonl_format(spark):
    """fmt='jsonl' writes newline-delimited JSON shards in the same
    hive layout with the same manifest contract — the format most
    training loaders stream."""
    import tempfile

    from parquet_to_postgres_spark.etl import write_training_shards

    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet").select(
        "doc_id", "text"
    )
    with tempfile.TemporaryDirectory() as d:
        m = write_training_shards(docs, d, n_shards=4, fmt="jsonl")
        assert m["__total__"] == docs.count()
        back = spark.read.schema("doc_id long, text string, shard int").json(
            d, pathGlobFilter="part-*"
        )
        assert back.count() == docs.count()
        assert back.select("shard").distinct().count() == 4
        # raw shard files really are one JSON object per line
        import glob
        import json as _json

        f = sorted(glob.glob(f"{d}/shard=*/part-*"))[0]
        with open(f) as fh:
            first = fh.readline()
        assert _json.loads(first)["doc_id"] is not None
    import pytest as _pt

    with _pt.raises(ValueError, match="fmt must be"):
        write_training_shards(docs, "/tmp/x", fmt="csv")


def test_training_shards_jsonl_rejects_binary_columns(spark):
    """JSON writes binary as base64 but the schema'd read-back nulls it —
    silent data loss the manifest row counts cannot catch, so binary
    columns are rejected up front for fmt='jsonl' (driver ADVICE r7);
    parquet takes them losslessly."""
    import tempfile

    import pytest as _pt

    from parquet_to_postgres_spark.etl import write_training_shards

    df = spark.createDataFrame(
        [(1, bytearray(b"\x00\x01"))], "doc_id long, payload binary"
    )
    with _pt.raises(ValueError, match="binary"):
        write_training_shards(df, "/tmp/never-written", fmt="jsonl")
    nested = df.select("doc_id", F.struct("payload").alias("s"))
    with _pt.raises(ValueError, match="binary"):
        write_training_shards(nested, "/tmp/never-written", fmt="jsonl")
    with tempfile.TemporaryDirectory() as d:
        m = write_training_shards(df, d, n_shards=2, fmt="parquet")
        assert m["__total__"] == 1
        assert spark.read.parquet(d).collect()[0]["payload"] == b"\x00\x01"
