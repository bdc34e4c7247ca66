"""ETL-path queries (SURVEY.md §2B E1–E4): the reference's own surface,
driven end-to-end and hash-checked.

Each round-trip builder materializes a table through a non-parquet format
(or through the full etl() pipeline) into a scratch dir, reads it back
with an explicit schema, and aggregates.  The oracle aggregates the
ORIGINAL parquet view — so any corruption introduced by the format
round-trip (type collapse, precision loss, null mangling: all bugs the
reference actually has, /root/reference/src/main.rs:113,157,190-204)
breaks the hash-match.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..etl import ParquetSink, etl, read_source, schema_to_pg_ddl
from ..tables import Catalog
from . import register
from ._util import sql_dsum

_SCRATCH = os.path.join(os.path.dirname(__file__), "..", "..", ".scratch")


def _scratch(name: str) -> str:
    path = os.path.abspath(os.path.join(_SCRATCH, name))
    os.makedirs(os.path.dirname(path), exist_ok=True)
    return path


# ------------------------------------------------------------------ E4 ----


@register(
    "csv_source_agg",
    oracle=f"""
    SELECT o_orderstatus,
           COUNT(*) AS n_orders,
           {sql_dsum("o_totalprice", "total_price")}
    FROM orders GROUP BY o_orderstatus
    """,
    tags=("E4",),
)
def csv_source_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E4: parquet → CSV → read_source(schema) → aggregate.

    Doubles survive because Spark writes round-trippable decimal text;
    the explicit read schema replaces inference (a full extra data pass
    at 100 TB)."""
    t = Catalog(spark, sf_dir)
    path = _scratch("e4/orders_csv")
    src = t.orders.select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
    src.write.mode("overwrite").option("header", "true").csv(path)
    back = read_source(
        spark,
        path,
        fmt="csv",
        schema="o_orderkey bigint, o_custkey bigint, o_orderstatus string, o_totalprice double",
    )
    return back.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(F.col("o_totalprice").cast("decimal(12,2)"))
        .cast("double")
        .alias("total_price"),
    )


@register(
    "json_source_agg",
    oracle=f"""
    SELECT c_mktsegment,
           COUNT(*) AS n_custs,
           {sql_dsum("c_acctbal", "total_bal")}
    FROM customer GROUP BY c_mktsegment
    """,
    tags=("E4",),
)
def json_source_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E4: parquet → JSON lines → read_source(schema) → aggregate."""
    t = Catalog(spark, sf_dir)
    path = _scratch("e4/customer_json")
    t.customer.select("c_custkey", "c_name", "c_acctbal", "c_mktsegment").write.mode(
        "overwrite"
    ).json(path)
    back = read_source(
        spark,
        path,
        fmt="json",
        schema="c_custkey bigint, c_name string, c_acctbal double, c_mktsegment string",
    )
    return back.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_custs"),
        F.sum(F.col("c_acctbal").cast("decimal(12,2)"))
        .cast("double")
        .alias("total_bal"),
    )


# --------------------------------------------------------------- E1–E3 ----


@register(
    "etl_roundtrip_agg",
    oracle=f"""
    SELECT l_linestatus,
           COUNT(*) AS n_items,
           {sql_dsum("l_extendedprice", "total_price")}
    FROM lineitem GROUP BY l_linestatus
    """,
    tags=("E1", "E2", "E3"),
)
def etl_roundtrip_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E1–E3: the whole reference program (read → DDL → batched sink,
    main.rs:49-102) through etl() with the parquet sink, then an
    aggregate over the SINK output.  DDL generation runs on the real
    lineitem schema; a malformed sink write breaks the hash-match."""
    path = _scratch("etl/lineitem_sink")
    ddl = etl(spark, f"{sf_dir}/lineitem.parquet", ParquetSink(path))
    assert ddl.startswith("CREATE TABLE IF NOT EXISTS")
    back = spark.read.parquet(path)
    return back.groupBy("l_linestatus").agg(
        F.count(F.lit(1)).alias("n_items"),
        F.sum(F.col("l_extendedprice").cast("decimal(12,2)"))
        .cast("double")
        .alias("total_price"),
    )
