"""The SQL-string surface: spark.sql over registered catalog views must
produce exactly what the DataFrame builders produce.

The declared queries' oracle strings are written in a dual-dialect ANSI
subset (DuckDB runs them for the hash gate); here Spark itself runs a
selection of them, proving (a) the engine is SQL-queryable end-to-end
(the reference's unused ``sqlparser`` aspiration), and (b) DataFrame
and SQL entries converge to the same Catalyst plans — same results,
same physical strategies.
"""

from __future__ import annotations

import math

import pytest

from parquet_to_postgres_spark import sqlapi
from parquet_to_postgres_spark.queries import load_all

from .conftest import SF_SMOKE

# Queries whose oracle SQL is ANSI enough for BOTH DuckDB and Spark —
# the flagship agg, the predicate family, and a multi-join star query.
DUAL_DIALECT = ["pricing_summary", "select_filter_case", "join_star_revenue"]


def _canon(df):
    """Order-insensitive canonical rows (column-name sorted)."""
    cols = sorted(df.columns)
    out = []
    for row in df.select(*cols).collect():
        vals = []
        for v in row:
            if isinstance(v, float):
                vals.append("NaN" if math.isnan(v) else repr(v))
            else:
                vals.append(str(v))
        out.append(tuple(vals))
    return sorted(out)


@pytest.mark.parametrize("name", DUAL_DIALECT)
def test_sql_string_matches_dataframe_builder(spark, name):
    spec = load_all()[name]
    df_result = spec.builder(spark, SF_SMOKE)
    sql_result = sqlapi.sql(spark, SF_SMOKE, spec.oracle)
    assert sorted(sql_result.columns) == sorted(df_result.columns)
    assert _canon(sql_result) == _canon(df_result)


def test_sql_and_dataframe_share_physical_strategy(spark):
    """Both entries go through Catalyst: the flagship agg compiles to a
    partial/final hash aggregate over a pushed-down parquet scan from
    EITHER surface (no interpretation penalty for SQL users)."""
    spec = load_all()["pricing_summary"]
    for df in (
        spec.builder(spark, SF_SMOKE),
        sqlapi.sql(spark, SF_SMOKE, spec.oracle),
    ):
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "HashAggregate" in plan
        assert "PushedFilters" in df._jdf.queryExecution().toString() or (
            "Filter" in plan
        )


def test_register_views_is_metadata_only(spark):
    """Registration must not scan data: it returns instantly with the
    full table list and the views are immediately queryable."""
    names = sqlapi.register_views(spark, SF_SMOKE)
    assert set(names) >= {"lineitem", "orders", "events", "documents"}
    assert spark.sql("SELECT COUNT(*) AS n FROM region").collect()[0]["n"] > 0
