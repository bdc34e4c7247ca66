"""SQL-string query surface over the catalog.

The reference declared (but never wired) a SQL parser dependency
(``/root/reference`` ``Cargo.toml:22`` ``sqlparser``) — the aspiration
of a SQL-queryable engine.  On Spark that surface is free: register the
catalog tables as temp views and every declared capability is reachable
through ``spark.sql`` with ANSI SQL, going through the SAME Catalyst
optimizer as the DataFrame API — identical logical plans in, identical
physical plans out.  ``tests/test_sql_surface.py`` proves it by running
declared queries' oracle SQL strings (written in the dual-dialect ANSI
subset DuckDB also executes) through ``spark.sql`` and hash-comparing
against the DataFrame builders.

At 100 TB nothing changes: temp-view registration is metadata-only (the
view wraps the same pruned, filter-pushable parquet scan `load_table`
builds), so SQL users get pushdown/pruning/AQE exactly as DataFrame
users do.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from . import TABLES
from .tables import load_table


def register_views(
    spark: SparkSession, sf_dir: str, tables: tuple[str, ...] | None = None
) -> list[str]:
    """Register catalog tables as temp views named after the tables.

    Metadata-only: each view wraps the lazily-built scan from
    :func:`.tables.load_table` (schema from the parquet footer, events
    ``ts`` normalized), so queries over the views inherit predicate
    pushdown and column pruning unchanged."""
    names = list(tables or TABLES)
    for name in names:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
    return names


def sql(spark: SparkSession, sf_dir: str, query: str) -> DataFrame:
    """Run a SQL string against the catalog (views registered on the
    fly).  The result is a regular DataFrame — composable with the rest
    of the engine's operators."""
    register_views(spark, sf_dir)
    return spark.sql(query)
