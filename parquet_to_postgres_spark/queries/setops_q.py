"""Sort / limit / set-operation queries (SURVEY.md §2B S1–S4)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..tables import Catalog
from . import register


@register(
    "global_sort_rank",
    oracle="""
    SELECT o_orderkey, o_totalprice,
           ROW_NUMBER() OVER (ORDER BY o_totalprice DESC, o_orderkey) AS price_rank
    FROM orders
    WHERE o_totalprice > 300000
    """,
    tags=("S1", "W1"),
)
def global_sort_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S1: global multi-key sort materialized as a rank (the hash-match
    gate is order-insensitive, so the rank column carries the ordering).

    The rank is computed by :func:`~..operators.distributed_rank`
    (range-repartition → per-partition rank → broadcast offset add) —
    no stage funnels the relation through one task, so the same plan
    holds when the filter survivors are billions of rows at 100 TB.
    """
    from ..operators import distributed_rank

    t = Catalog(spark, sf_dir)
    filtered = t.orders.where(F.col("o_totalprice") > 300000).select(
        "o_orderkey", "o_totalprice"
    )
    ranked = distributed_rank(
        filtered,
        [F.col("o_totalprice").desc(), F.col("o_orderkey")],
        rank_col="price_rank",
    )
    return ranked.withColumn("price_rank", F.col("price_rank").cast("long"))


@register(
    "top_k_global",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_extendedprice
    FROM lineitem
    ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber
    LIMIT 100
    """,
    tags=("S2",),
)
def top_k_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S2: global top-k — Spark plans TakeOrderedAndProject (per-partition
    heap + driver merge, no global sort).  Tie-broken on the unique key so
    the selected set is deterministic."""
    t = Catalog(spark, sf_dir)
    return (
        t.lineitem.select("l_orderkey", "l_linenumber", "l_extendedprice")
        .orderBy(
            F.col("l_extendedprice").desc(), F.col("l_orderkey"), F.col("l_linenumber")
        )
        .limit(100)
    )


@register(
    "set_operations",
    oracle="""
    SELECT 'union_all' AS op, (
      SELECT COUNT(*) FROM (
        SELECT c_custkey, c_nationkey FROM customer WHERE c_acctbal < 5000
        UNION ALL
        SELECT c_custkey, c_nationkey FROM customer WHERE c_mktsegment = 'FURNITURE'
      )) AS n_rows
    UNION ALL
    SELECT 'union_distinct' AS op, (
      SELECT COUNT(*) FROM (
        SELECT c_custkey, c_nationkey FROM customer WHERE c_acctbal < 5000
        UNION
        SELECT c_custkey, c_nationkey FROM customer WHERE c_mktsegment = 'FURNITURE'
      )) AS n_rows
    UNION ALL
    SELECT 'intersect' AS op, (
      SELECT COUNT(*) FROM (
        SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
        INTERSECT
        SELECT o_custkey FROM orders WHERE o_totalprice > 200000
      )) AS n_rows
    UNION ALL
    SELECT 'except_all' AS op, (
      SELECT COUNT(*) FROM (
        SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
        EXCEPT ALL
        SELECT o_custkey FROM orders WHERE o_totalprice > 250000
      )) AS n_rows
    """,
    tags=("S3", "S4", "A2"),
)
def set_operations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S3+S4: UNION ALL (bag), UNION (distinct), INTERSECT (distinct
    semantics) and EXCEPT ALL (multiplicities subtract), each branch
    reduced to its cardinality and tagged — all four set operators
    exercised for real in one declared query (the counts pin their
    bag/set semantics: overlapping slices make every pair differ)."""
    t = Catalog(spark, sf_dir)
    a = t.customer.where(F.col("c_acctbal") < 5000).select("c_custkey", "c_nationkey")
    b = t.customer.where(F.col("c_mktsegment") == "FURNITURE").select(
        "c_custkey", "c_nationkey"
    )
    oa = t.orders.where(F.col("o_orderpriority") == "1-URGENT").select("o_custkey")
    ob = t.orders.where(F.col("o_totalprice") > 200000).select("o_custkey")
    oc = t.orders.where(F.col("o_orderstatus") == "F").select("o_custkey")
    od = t.orders.where(F.col("o_totalprice") > 250000).select("o_custkey")

    def tagged(op: str, df: DataFrame) -> DataFrame:
        return df.agg(F.count(F.lit(1)).alias("n_rows")).select(
            F.lit(op).alias("op"), "n_rows"
        )

    return (
        tagged("union_all", a.unionByName(b))
        .unionByName(tagged("union_distinct", a.unionByName(b).distinct()))
        .unionByName(tagged("intersect", oa.intersect(ob)))
        .unionByName(tagged("except_all", oc.exceptAll(od)))
    )
