"""Driver contract for the spark-graft builder (PySpark target).

Thin shim over :mod:`parquet_to_postgres_spark.queries` — the declared-query
registry.  ``entry(spark)`` runs the flagship query on sf0.001;
``queries()`` / ``oracle_sql()`` expose every implemented operator from
SURVEY.md §2 with its DuckDB oracle twin.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from parquet_to_postgres_spark import queries as _registry


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from parquet_to_postgres_spark.queries.relational_q import pricing_summary

    return pricing_summary(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return _registry.queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB oracle SQL twin for each SQL-expressible query."""
    return _registry.oracle_sql()
