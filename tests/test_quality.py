"""Data-quality validation gate: planted violations are counted exactly,
row-local rules share one aggregate pass."""

from __future__ import annotations

from pyspark.sql import Row

from parquet_to_postgres_spark.quality import (
    foreign_key,
    in_range,
    in_set,
    matches,
    not_null,
    unique,
    validate,
)

from .conftest import SF_SMOKE


def _dirty(spark):
    rows = [
        Row(id=1, status="A", price=10.0, code="X1"),
        Row(id=2, status="B", price=-5.0, code="X2"),    # price out of range
        Row(id=2, status="A", price=20.0, code="X3"),    # duplicate id
        Row(id=3, status="Z", price=30.0, code="bad"),   # bad status + code
        Row(id=4, status=None, price=None, code="X4"),   # nulls
        Row(id=5, status="A", price=40.0, code="X5"),
    ]
    return spark.createDataFrame(rows)


def test_validate_counts_planted_violations(spark):
    df = _dirty(spark)
    rules = (
        not_null("status", "price")
        + [
            in_range("price", 0, 100),
            in_set("status", ("A", "B")),
            matches("code", r"^X\d$"),
            unique("id"),
        ]
    )
    got = {r["rule"]: (r["n_violations"], r["passed"]) for r in validate(df, rules).collect()}
    assert got == {
        "not_null(status)": (1, False),
        "not_null(price)": (1, False),
        "in_range(price,0,100)": (1, False),
        "in_set(status)": (1, False),
        "matches(code)": (1, False),
        "unique(id)": (1, False),
    }


def test_validate_clean_table_passes(spark):
    orders = spark.read.parquet(f"{SF_SMOKE}/orders.parquet")
    customer = spark.read.parquet(f"{SF_SMOKE}/customer.parquet")
    rules = not_null("o_orderkey", "o_custkey") + [
        unique("o_orderkey"),
        in_set("o_orderstatus", ("F", "O", "P")),
        foreign_key(("o_custkey",), customer, ("c_custkey",)),
    ]
    out = validate(orders, rules).collect()
    assert len(out) == 5
    assert all(r["passed"] for r in out), [
        (r["rule"], r["n_violations"]) for r in out if not r["passed"]
    ]


def test_validate_foreign_key_orphans_and_null_keys(spark):
    fact = spark.createDataFrame(
        [Row(k=1), Row(k=2), Row(k=99), Row(k=None)]
    )
    dim = spark.createDataFrame([Row(dk=1), Row(dk=2)])
    out = validate(fact, [foreign_key(("k",), dim, ("dk",))]).collect()[0]
    # 99 is an orphan; the NULL key row is NOT a violation (SQL semantics)
    assert out["n_violations"] == 1 and not out["passed"]


def test_validate_rowwise_rules_share_one_pass(spark):
    """Plan evidence: N row-local rules must produce exactly one
    aggregate over the table (one scan), not one job per rule."""
    df = _dirty(spark)
    rules = not_null("status", "price") + [
        in_range("price", 0, 100),
        in_set("status", ("A", "B")),
    ]
    res = validate(df, rules)
    plan = res._jdf.queryExecution().executedPlan().toString()
    assert plan.count("HashAggregate") <= 4  # partial+final, one agg pair (+generate)


def test_validate_empty_rules_returns_empty_frame(spark):
    """Config-driven gates may generate zero rules; that's an empty
    result, not an IndexError."""
    df = _dirty(spark)
    out = validate(df, [])
    assert out.columns == ["rule", "n_violations", "passed"]
    assert out.count() == 0


def test_profile_drift_flags_moved_columns(spark):
    """Drift diff of two single-pass profiles: stable columns pass,
    a null-spiked column and a scaled numeric column are flagged, and
    added/removed columns surface by status."""
    from parquet_to_postgres_spark.operators import profile_columns
    from parquet_to_postgres_spark.quality import profile_drift

    base_df = spark.range(1000).selectExpr(
        "id", "cast(id % 7 as double) as v", "concat('u', id % 50) as cat"
    )
    # drifted batch: v scaled 10x, cat mostly null, id untouched, new col
    cur_df = spark.range(1000).selectExpr(
        "id",
        "cast((id % 7) * 10 as double) as v",
        "if(id % 4 = 0, concat('u', id % 50), null) as cat",
        "cast(1 as int) as extra",
    )
    drift = {
        r["column"]: r
        for r in profile_drift(
            profile_columns(base_df), profile_columns(cur_df)
        ).collect()
    }
    assert drift["id"]["status"] == "common" and not drift["id"]["drifted"]
    assert drift["v"]["drifted"]  # mean moved 10x
    assert drift["cat"]["drifted"]  # null ratio spiked
    assert drift["extra"]["status"] == "added" and drift["extra"]["drifted"]


def test_profile_drift_empty_input_profile(spark):
    """Column presence must come from explicit markers, not derived
    metrics: a profile taken over an EMPTY batch has n_rows=0 and NULL
    null-ratios, but its columns are still present — they must read as
    'common', never 'added'/'removed'."""
    from parquet_to_postgres_spark.operators import profile_columns
    from parquet_to_postgres_spark.quality import profile_drift

    base_df = spark.range(100).selectExpr(
        "id", "cast(id % 3 as double) as v"
    )
    empty_df = base_df.where("id < 0")  # same schema, zero rows
    drift = {
        r["column"]: r
        for r in profile_drift(
            profile_columns(base_df), profile_columns(empty_df)
        ).collect()
    }
    assert set(drift) == {"id", "v"}
    for col in ("id", "v"):
        assert drift[col]["status"] == "common", drift[col]
    # and symmetric: empty baseline, populated current
    drift2 = {
        r["column"]: r
        for r in profile_drift(
            profile_columns(empty_df), profile_columns(base_df)
        ).collect()
    }
    for col in ("id", "v"):
        assert drift2[col]["status"] == "common", drift2[col]
