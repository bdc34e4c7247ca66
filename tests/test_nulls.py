"""Null-semantics tests on tiny literal DataFrames.

The reference corrupts NULLs silently (it reads Arrow slots without an
is_null check — /root/reference/src/main.rs:157,162,167,172,177,182,187),
so every operator family here gets an explicit null test: nulls must
survive, group, join, and aggregate with SQL semantics, never turn into
garbage values.
"""

from __future__ import annotations

from pyspark.sql import functions as F


def test_groupby_null_is_a_group(spark):
    df = spark.createDataFrame(
        [("a", 1), (None, 2), (None, 3), ("b", None)],
        "k string, v int",
    )
    out = {
        r["k"]: (r["n"], r["s"])
        for r in df.groupBy("k")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("v").alias("s"))
        .collect()
    }
    assert out[None] == (2, 5)  # NULL key groups together
    assert out["b"] == (1, None)  # sum of all-null slice is NULL
    assert out["a"] == (1, 1)


def test_count_ignores_nulls_countstar_does_not(spark):
    df = spark.createDataFrame([(1,), (None,), (3,)], "v int")
    row = df.agg(
        F.count("v").alias("cv"), F.count(F.lit(1)).alias("cstar")
    ).first()
    assert row["cv"] == 2 and row["cstar"] == 3


def test_join_null_keys_never_match(spark):
    left = spark.createDataFrame([(1, "x"), (None, "y")], "k int, l string")
    right = spark.createDataFrame([(1, "p"), (None, "q")], "k int, r string")
    inner = left.join(right, "k").collect()
    assert len(inner) == 1 and inner[0]["k"] == 1
    # outer join keeps the null-key rows, unmatched
    outer = left.join(right, "k", "full").collect()
    assert len(outer) == 3


def test_exact_dedup_null_text(spark):
    from parquet_to_postgres_spark.llm.dedup import exact_dedup

    df = spark.createDataFrame(
        [(1, "same"), (2, "same"), (3, None), (4, None)],
        "doc_id long, text string",
    )
    out = {
        r["dedup_key"]: (r["representative"], r["n_copies"])
        for r in exact_dedup(df, F.md5(F.col("text"))).collect()
    }
    # md5(NULL) is NULL; both null-text docs land in the NULL-key group.
    assert out[None] == (3, 2)
    assert len(out) == 2


def test_salted_agg_null_key(spark):
    from parquet_to_postgres_spark.operators import salted_agg

    df = spark.createDataFrame(
        [(None, 1, 10), (None, 2, 20), (7, 3, 30)],
        "k int, id int, v int",
    )
    out = salted_agg(
        df,
        keys=["k"],
        partials={"pn": F.count(F.lit(1)), "ps": F.sum("v")},
        finals={"n": F.sum("pn"), "s": F.sum("ps")},
        salt_col=F.pmod(F.col("id"), F.lit(4)),
    )
    rows = {r["k"]: (r["n"], r["s"]) for r in out.collect()}
    assert rows[None] == (2, 30) and rows[7] == (1, 30)


def test_window_nulls_last_and_ignorenulls(spark):
    from pyspark.sql import Window

    df = spark.createDataFrame(
        [(1, 1, None), (1, 2, "a"), (1, 3, None), (1, 4, "b")],
        "g int, o int, v string",
    )
    w = Window.partitionBy("g").orderBy("o")
    out = df.withColumn(
        "last_seen", F.last("v", ignorenulls=True).over(w)
    ).collect()
    by_o = {r["o"]: r["last_seen"] for r in out}
    assert by_o == {1: None, 2: "a", 3: "a", 4: "b"}


def test_ddl_marks_nullability(spark):
    from parquet_to_postgres_spark.etl import schema_to_pg_ddl

    df = spark.createDataFrame([(1, "x")], "a long, b string").select(
        F.col("a"), F.col("b")
    )
    # createDataFrame columns are nullable by default -> no NOT NULL
    ddl = schema_to_pg_ddl("t", df.schema)
    assert "NOT NULL" not in ddl
    forced = df.schema
    forced.fields[0].nullable = False
    ddl2 = schema_to_pg_ddl("t", forced)
    assert "a BIGINT NOT NULL" in ddl2


def test_profile_columns_single_pass(spark):
    """Profiler values match per-column exact queries (approx_distinct
    within HLL error), and the whole profile is ONE aggregate job."""
    from parquet_to_postgres_spark.operators import profile_columns
    from .conftest import SF_SMOKE

    df = spark.read.parquet(f"{SF_SMOKE}/orders.parquet")
    prof = {r["column"]: r for r in profile_columns(df).collect()}
    n = df.count()
    assert set(prof) == set(df.columns)
    for name in df.columns:
        row = prof[name]
        assert row["n_rows"] == n
        exact_nn = df.where(df[name].isNotNull()).count()
        assert row["n_non_null"] == exact_nn
        assert row["n_null"] == n - exact_nn
        exact_d = df.select(name).distinct().count()
        assert abs(row["approx_distinct"] - exact_d) <= max(3, 0.1 * exact_d)
    ok = prof["o_orderkey"]
    mn, mx = df.agg(
        F.min("o_orderkey"), F.max("o_orderkey")
    ).collect()[0]
    assert int(ok["min_value"]) == mn and int(ok["max_value"]) == mx
    assert abs(ok["mean"] - df.agg(F.avg("o_orderkey")).collect()[0][0]) < 1e-9
    # status is a string column: no mean
    assert prof["o_orderstatus"]["mean"] is None


def test_equi_width_histogram(spark):
    """Bin counts == a Python reference; nulls excluded; max value lands
    in the last bin; total preserved."""
    import random

    from parquet_to_postgres_spark.operators import equi_width_histogram

    rng = random.Random(29)
    vals = [round(rng.uniform(0, 100), 3) for _ in range(5000)] + [100.0]
    rows = [(v,) for v in vals] + [(None,)]
    df = spark.createDataFrame(rows, "v double")
    got = {
        r["bin"]: (r["bin_lo"], r["bin_hi"], r["n"])
        for r in equi_width_histogram(df, "v", bins=10, lo=0.0, hi=100.0).collect()
    }
    want = [0] * 10
    for v in vals:
        want[min(int(v // 10), 9)] += 1
    assert {b: n for b, (_, _, n) in got.items()} == {
        b: n for b, n in enumerate(want) if n
    }
    assert sum(n for _, _, n in got.values()) == len(vals)
    assert got[9][0] == 90.0 and got[9][1] == 100.0
    # auto-bounds path agrees on totals
    auto = equi_width_histogram(df, "v", bins=10)
    assert sum(r["n"] for r in auto.collect()) == len(vals)


def test_equi_width_histogram_empty_and_all_null(spark):
    """Auto-bounds on empty / all-NULL input returns an empty histogram
    (not a float(None) crash)."""
    from parquet_to_postgres_spark.operators import equi_width_histogram

    empty = spark.createDataFrame([], "v double")
    out = equi_width_histogram(empty, "v", bins=5)
    assert out.columns == ["bin", "bin_lo", "bin_hi", "n"]
    assert out.count() == 0
    all_null = spark.createDataFrame([(None,), (None,)], "v double")
    assert equi_width_histogram(all_null, "v", bins=5).count() == 0


def test_chunk_documents_preserves_null_text_rows(spark):
    """A NULL-text document must survive chunking as one row with NULL
    chunk columns — silent row loss would break downstream joins that
    assume corpus cardinality."""
    from parquet_to_postgres_spark.llm.text import chunk_documents

    df = spark.createDataFrame(
        [(1, "some real text here"), (2, None)], "doc_id long, text string"
    )
    out = chunk_documents(df, chunk_tokens=3, overlap_tokens=1)
    rows = {r["doc_id"]: r for r in out.collect()}
    assert set(rows) == {1, 2}
    assert rows[2]["chunk_id"] is None
    assert rows[2]["chunk_text"] is None
    assert rows[2]["n_tokens"] is None
    assert rows[1]["chunk_text"] is not None


def test_time_rollup_excludes_null_timestamps(spark):
    """A NULL ts nulls every grain bucket and would yield one ambiguous
    NULL-grain row per grouping set; the operator excludes such rows
    explicitly (documented contract)."""
    from pyspark.sql import functions as F

    from parquet_to_postgres_spark.operators import time_rollup

    df = spark.createDataFrame(
        [(1, "2024-01-01 10:30:00"), (2, None), (3, "2024-01-01 11:15:00")],
        "id long, ts_s string",
    ).select("id", F.col("ts_s").cast("timestamp").alias("ts"))
    out = time_rollup(
        df, "ts", [F.count(F.lit(1)).alias("n")], grains=("hour", "day")
    ).collect()
    assert all(r["grain"] is not None and r["bucket_ts"] is not None for r in out)
    by_grain = {}
    for r in out:
        by_grain.setdefault(r["grain"], 0)
        by_grain[r["grain"]] += r["n"]
    assert by_grain == {"hour": 2, "day": 2}  # the NULL-ts row is gone
