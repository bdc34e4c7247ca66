"""Window-function queries (SURVEY.md §2B W1–W4).

Every ORDER BY inside a window includes a unique tie-break key so
position-sensitive functions (row_number, ntile, lag) are deterministic
across engines.  Frame sums use the exact-decimal strategy: DuckDB
computes moving sums incrementally while Spark recomputes per frame, so
float frames would drift — decimal frames cannot.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..tables import Catalog
from . import register
from ._util import dec


@register(
    "window_rank_analytic",
    oracle="""
    SELECT event_id, user_id, ts, value,
           ROW_NUMBER() OVER w AS rn,
           NTILE(4) OVER w AS quartile,
           RANK() OVER d AS day_rnk,
           DENSE_RANK() OVER d AS day_drnk,
           LAG(value) OVER w AS prev_value,
           LEAD(value) OVER w AS next_value,
           FIRST_VALUE(event_type) OVER w AS first_type,
           LAG(ts) OVER w AS prev_ts,
           CAST(SUM(CAST(value AS DECIMAL(12,2))) OVER
                (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS UNBOUNDED PRECEDING) AS DOUBLE) AS running_total,
           CAST(SUM(CAST(value AS DECIMAL(12,2))) OVER
                (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE)
             / COUNT(*) OVER
                (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS moving_avg3
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id),
           d AS (PARTITION BY user_id ORDER BY date_trunc('day', ts))
    """,
    tags=("W1", "W2", "W3"),
)
def window_rank_analytic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W1+W2+W3 over each user's event timeline: the ranking family
    (row_number/ntile on the unique (ts, event_id) order; rank and
    dense_rank on the day-truncated order, where real ties make them
    diverge — both deterministic, rank depends only on key values), the
    analytic family (lag/lead/first_value), and explicit frame specs
    (running total + 3-row moving average on exact decimal sums).

    All windows share the user_id partition key, so the whole query is
    ONE shuffle regardless of how many window functions stack on top —
    the shape that matters at 100 TB."""
    t = Catalog(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    d = Window.partitionBy("user_id").orderBy(F.date_trunc("day", "ts"))
    running = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    last3 = w.rowsBetween(-2, Window.currentRow)
    return t.events.select(
        "event_id",
        "user_id",
        "ts",
        "value",
        F.row_number().over(w).cast("long").alias("rn"),
        F.ntile(4).over(w).cast("long").alias("quartile"),
        F.rank().over(d).cast("long").alias("day_rnk"),
        F.dense_rank().over(d).cast("long").alias("day_drnk"),
        F.lag("value").over(w).alias("prev_value"),
        F.lead("value").over(w).alias("next_value"),
        F.first("event_type").over(w).alias("first_type"),
        F.lag("ts").over(w).alias("prev_ts"),
        F.sum(dec("value")).over(running).cast("double").alias("running_total"),
        (
            F.sum(dec("value")).over(last3).cast("double")
            / F.count(F.lit(1)).over(last3)
        ).alias("moving_avg3"),
    )


@register(
    "top_k_per_group",
    oracle="""
    SELECT o_custkey, o_orderkey, o_totalprice, rn AS order_rank
    FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
             ROW_NUMBER() OVER (PARTITION BY o_custkey
                                ORDER BY o_totalprice DESC, o_orderkey) AS rn
      FROM orders
    ) WHERE rn <= 3
    """,
    tags=("W4",),
)
def top_k_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W4: top-3 orders per customer — rank-then-filter.

    At 100 TB Catalyst plans this as a window with partial top-k pushed
    into the shuffle (WindowGroupLimit since Spark 3.5), so only ~k rows
    per key cross the network."""
    t = Catalog(spark, sf_dir)
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        t.orders.select(
            "o_custkey",
            "o_orderkey",
            "o_totalprice",
            F.row_number().over(w).cast("long").alias("order_rank"),
        )
        .where(F.col("order_rank") <= 3)
    )
