"""Projection / filter / conditional queries (SURVEY.md §2B P1–P3) plus the
flagship pricing-summary query (M0).

The reference has no compute operators at all (its whole pipeline is
scan→type-map→sink, ``/root/reference/src/main.rs:49-102``); these queries
are the §2B capability matrix expressed as Catalyst-optimizable DataFrame
plans.  Filters and projections here compile to parquet-scan-level
``PushedFilters`` / ``ReadSchema`` pruning — verified in tests.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..tables import Catalog
from . import register
from ._util import davg, dec, dsum, sql_davg, sql_dec, sql_dsum


@register(
    "pricing_summary",
    oracle=f"""
    SELECT
      l_returnflag,
      l_linestatus,
      {sql_dsum("l_quantity", "sum_qty")},
      {sql_dsum("l_extendedprice", "sum_base_price")},
      CAST(SUM({sql_dec("l_extendedprice")} * (1 - {sql_dec("l_discount")})) AS DOUBLE) AS sum_disc_price,
      CAST(SUM({sql_dec("l_extendedprice")} * (1 - {sql_dec("l_discount")}) * (1 + {sql_dec("l_tax")})) AS DOUBLE) AS sum_charge,
      {sql_davg("l_quantity", "avg_qty")},
      {sql_davg("l_extendedprice", "avg_price")},
      {sql_davg("l_discount", "avg_disc")},
      COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
    tags=("A1", "P2", "E1"),
)
def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-shaped pricing summary — the flagship scan→filter→agg path.

    Scale notes: single shuffle (partial/final hash agg, map-side combine
    is automatic); the shipdate filter and 7-column projection push into
    the parquet scan, so at 100 TB only the needed column chunks are read.
    """
    t = Catalog(spark, sf_dir)
    one = F.lit(1).cast("decimal(12,2)")
    return (
        t.lineitem.where(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity", "sum_qty"),
            dsum("l_extendedprice", "sum_base_price"),
            F.sum(dec("l_extendedprice") * (one - dec("l_discount")))
            .cast("double")
            .alias("sum_disc_price"),
            F.sum(
                dec("l_extendedprice")
                * (one - dec("l_discount"))
                * (one + dec("l_tax"))
            )
            .cast("double")
            .alias("sum_charge"),
            davg("l_quantity", "avg_qty"),
            davg("l_extendedprice", "avg_price"),
            davg("l_discount", "avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@register(
    "select_filter_case",
    oracle=f"""
    SELECT
      o_orderkey,
      CAST({sql_dec("o_totalprice")} * 0.95 AS DOUBLE) AS net_price,
      o_totalprice AS gross,
      o_orderstatus || '/' || o_orderpriority AS status_priority,
      CASE WHEN o_totalprice > 250000 THEN 'big'
           WHEN o_totalprice > 100000 THEN 'mid'
           ELSE 'small' END AS size_class,
      COALESCE(NULLIF(o_orderstatus, 'O'), 'open') AS status_resolved,
      CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END AS is_urgent
    FROM orders
    WHERE o_totalprice BETWEEN 50000 AND 150000
      AND o_orderpriority IN ('1-URGENT', '2-HIGH')
      AND o_orderstatus <> 'F'
      AND o_orderpriority LIKE '%-%'
      AND o_custkey IS NOT NULL
    """,
    tags=("P1", "P2", "P3"),
)
def select_filter_case(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P1+P2+P3 in one declared query: projection/aliasing/computed
    columns, the predicate family (comparison, BETWEEN, IN, LIKE,
    null-test, boolean combinators — all compile to scan-level
    PushedFilters, so at 100 TB row groups are skipped via parquet
    min/max stats), and the conditional family (when/otherwise,
    coalesce, nullif)."""
    t = Catalog(spark, sf_dir)
    return (
        t.orders.where(
            F.col("o_totalprice").between(50000, 150000)
            & F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
            & (F.col("o_orderstatus") != "F")
            & F.col("o_orderpriority").like("%-%")
            & F.col("o_custkey").isNotNull()
        )
        .select(
            "o_orderkey",
            (dec("o_totalprice") * F.lit("0.95").cast("decimal(12,2)"))
            .cast("double")
            .alias("net_price"),
            F.col("o_totalprice").alias("gross"),
            F.concat_ws("/", "o_orderstatus", "o_orderpriority").alias(
                "status_priority"
            ),
            F.when(F.col("o_totalprice") > 250000, "big")
            .when(F.col("o_totalprice") > 100000, "mid")
            .otherwise("small")
            .alias("size_class"),
            F.coalesce(
                F.nullif(F.col("o_orderstatus"), F.lit("O")), F.lit("open")
            ).alias("status_resolved"),
            F.when(F.col("o_orderpriority") == "1-URGENT", 1)
            .otherwise(0)
            .alias("is_urgent"),
        )
    )
