"""Scalar function library queries (SURVEY.md §2B F1–F7).

One declared query per function family, each exercising the family's
core functions with a DuckDB twin.  Dialect edges handled here:

- ``floor``/``ceil`` return BIGINT in Spark but DOUBLE in DuckDB → cast.
- ``round`` on raw doubles can straddle ties differently → round on the
  exact DECIMAL view instead.
- ``pow``/``log`` are libm-dependent in the last ulp → use exponents /
  arguments where both engines are exact (powers of two, sqrt).
- Spark ``split`` takes a regex, DuckDB ``string_split`` a literal —
  only literal separators are used.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..tables import Catalog
from . import register
from ._util import dec


@register(
    "string_functions",
    oracle="""
    SELECT c_custkey,
           lower(c_name) AS lname,
           upper(c_mktsegment) AS useg,
           substring(c_name, 10, 9) AS cust_id_str,
           CAST(regexp_extract(c_name, '([0-9]+)', 1) AS BIGINT) AS cust_id_num,
           regexp_replace(c_name, '^Customer#0*', '') AS short_id,
           length(c_name) AS name_len,
           lpad(CAST(c_custkey AS VARCHAR), 12, '0') AS padded,
           instr(c_name, '#') AS hash_pos,
           trim(concat(' ', c_mktsegment, ' ')) AS trimmed,
           concat_ws('-', c_mktsegment, CAST(c_nationkey AS VARCHAR)) AS seg_nation
    FROM customer
    """,
    tags=("F1",),
)
def string_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F1: string family over customer (1-based substring in both)."""
    t = Catalog(spark, sf_dir)
    return t.customer.select(
        "c_custkey",
        F.lower("c_name").alias("lname"),
        F.upper("c_mktsegment").alias("useg"),
        F.substring("c_name", 10, 9).alias("cust_id_str"),
        F.regexp_extract("c_name", r"([0-9]+)", 1).cast("bigint").alias("cust_id_num"),
        F.regexp_replace("c_name", r"^Customer#0*", "").alias("short_id"),
        F.length("c_name").cast("long").alias("name_len"),
        F.lpad(F.col("c_custkey").cast("string"), 12, "0").alias("padded"),
        F.instr(F.col("c_name"), "#").cast("long").alias("hash_pos"),
        F.trim(F.concat(F.lit(" "), F.col("c_mktsegment"), F.lit(" "))).alias(
            "trimmed"
        ),
        F.concat_ws("-", "c_mktsegment", F.col("c_nationkey").cast("string")).alias(
            "seg_nation"
        ),
    )


@register(
    "datetime_functions",
    oracle="""
    SELECT o_orderkey,
           year(o_orderdate) AS order_year,
           month(o_orderdate) AS order_month,
           day(o_orderdate) AS order_day,
           date_trunc('month', o_orderdate) AS month_start,
           strftime(CAST(o_orderdate AS DATE), '%Y-%m-%d') AS order_date,
           date_diff('day', CAST(o_orderdate AS DATE), DATE '2002-01-01') AS days_to_2002,
           CAST(o_orderdate AS DATE) + INTERVAL 30 DAY AS due_ts,
           CAST(epoch(o_orderdate) AS BIGINT) AS epoch_sec
    FROM orders
    """,
    tags=("F2",),
)
def datetime_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F2: date/time family over orders."""
    t = Catalog(spark, sf_dir)
    return t.orders.select(
        "o_orderkey",
        F.year("o_orderdate").cast("long").alias("order_year"),
        F.month("o_orderdate").cast("long").alias("order_month"),
        F.dayofmonth("o_orderdate").cast("long").alias("order_day"),
        F.date_trunc("month", "o_orderdate").alias("month_start"),
        # DATE values reach pandas as date objects in Spark but datetime64
        # in DuckDB — emit ISO strings so the value-hash is representation-
        # independent.
        F.date_format(F.to_date("o_orderdate"), "yyyy-MM-dd").alias("order_date"),
        F.datediff(F.lit("2002-01-01").cast("date"), F.to_date("o_orderdate")).cast("long").alias(
            "days_to_2002"
        ),
        (F.to_date("o_orderdate").cast("timestamp") + F.expr("INTERVAL 30 DAY")).alias(
            "due_ts"
        ),
        F.unix_timestamp("o_orderdate").alias("epoch_sec"),
    )


@register(
    "math_functions",
    oracle="""
    SELECT p_partkey,
           CAST(round(CAST(p_retailprice AS DECIMAL(12,2)), 1) AS DOUBLE) AS price_r1,
           CAST(floor(p_retailprice) AS BIGINT) AS price_floor,
           CAST(ceil(p_retailprice) AS BIGINT) AS price_ceil,
           abs(p_size - 25) AS size_dev,
           sqrt(p_retailprice) AS price_sqrt,
           pow(2.0, p_size % 10) AS two_pow,
           ((p_partkey % 7) + 7) % 7 AS pmod7,
           CAST(sign(p_size - 25) AS DOUBLE) AS size_sign
    FROM part
    """,
    tags=("F3",),
)
def math_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F3: math family over part (sqrt is IEEE-exact; pow kept to powers
    of two; round applied on the exact decimal view)."""
    t = Catalog(spark, sf_dir)
    return t.part.select(
        "p_partkey",
        F.round(dec("p_retailprice"), 1).cast("double").alias("price_r1"),
        F.floor("p_retailprice").alias("price_floor"),
        F.ceil("p_retailprice").alias("price_ceil"),
        F.abs(F.col("p_size") - 25).cast("long").alias("size_dev"),
        F.sqrt("p_retailprice").alias("price_sqrt"),
        F.pow(F.lit(2.0), F.col("p_size") % 10).alias("two_pow"),
        F.pmod(F.col("p_partkey"), F.lit(7)).alias("pmod7"),
        F.signum(F.col("p_size") - 25).cast("double").alias("size_sign"),
    )


@register(
    "array_functions",
    oracle="""
    SELECT vec_id,
           len(embedding) AS dim,
           CAST(list_reduce(list_transform(embedding[1:4], x -> CAST(x AS DOUBLE)),
                            (a, b) -> a + b) AS DOUBLE) AS head4_sum,
           CAST(list_reduce(list_transform(embedding, x -> CAST(x AS DOUBLE)),
                            (a, b) -> a + b) AS DOUBLE) AS vec_sum,
           len(list_filter(embedding, x -> x > 0)) AS n_positive,
           CAST(list_sort(embedding[1:4])[1] AS DOUBLE) AS head4_min,
           len(list_distinct([label % 3, label % 2, 0])) AS n_distinct_small
    FROM embeddings
    """,
    tags=("F4",),
)
def array_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F4: higher-order array family over embeddings.

    ``aggregate`` starts from 0.0 and folds left; DuckDB ``list_reduce``
    starts from the first element — IEEE ``0.0 + x == x``, so the folds
    agree bit-for-bit.  Collection intermediates (slice, array_sort) are
    reduced to scalar outputs (sum / min) because the correctness gate
    hashes cell values and cannot digest array cells; float→double casts
    are exact, so the scalars remain bit-checkable."""
    t = Catalog(spark, sf_dir)
    return t.embeddings.select(
        "vec_id",
        F.size("embedding").cast("long").alias("dim"),
        F.aggregate(
            F.transform(F.slice("embedding", 1, 4), lambda x: x.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ).alias("head4_sum"),
        F.aggregate(
            F.transform("embedding", lambda x: x.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ).alias("vec_sum"),
        F.size(F.filter("embedding", lambda x: x > 0)).cast("long").alias("n_positive"),
        F.element_at(F.array_sort(F.slice("embedding", 1, 4)), 1)
        .cast("double")
        .alias("head4_min"),
        F.size(
            F.array_distinct(
                F.array(F.col("label") % 3, F.col("label") % 2, F.lit(0))
            )
        ).cast("long").alias("n_distinct_small"),
    )


@register(
    "map_functions",
    oracle="""
    SELECT event_id,
           map {'type': event_type}['type'][1] AS type_back,
           array_to_string(map_keys(map {'type': event_type, 'uid': CAST(user_id AS VARCHAR)}), ',') AS mkeys,
           array_to_string(map_values(map {'type': event_type, 'uid': CAST(user_id AS VARCHAR)}), ',') AS mvals,
           cardinality(map {'type': event_type, 'uid': CAST(user_id AS VARCHAR)}) AS msize
    FROM events
    """,
    tags=("F5",),
)
def map_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F5: map family derived from events (maps built with literal key
    order so key/value arrays align across engines).  Key/value arrays
    are serialized to comma-joined strings — the correctness gate cannot
    hash collection cells, and literal key order keeps the string
    canonical."""
    t = Catalog(spark, sf_dir)
    m2 = F.create_map(
        F.lit("type"),
        F.col("event_type"),
        F.lit("uid"),
        F.col("user_id").cast("string"),
    )
    return t.events.select(
        "event_id",
        F.element_at(F.create_map(F.lit("type"), F.col("event_type")), "type").alias(
            "type_back"
        ),
        F.concat_ws(",", F.map_keys(m2)).alias("mkeys"),
        F.concat_ws(",", F.map_values(m2)).alias("mvals"),
        F.size(m2).cast("long").alias("msize"),
    )


@register(
    "json_functions",
    oracle="""
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_value,
           json_extract_string(props, '$.k') AS k_str,
           to_json(struct_pack(event_id := event_id, event_type := event_type)) AS packed
    FROM events
    """,
    tags=("F6",),
)
def json_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F6: JSON family over events.props (JSON stays a string column and
    is parsed on demand — at scale this avoids a schema-inference pass)."""
    t = Catalog(spark, sf_dir)
    return t.events.select(
        "event_id",
        F.get_json_object("props", "$.k").cast("bigint").alias("k_value"),
        F.get_json_object("props", "$.k").alias("k_str"),
        F.to_json(F.struct("event_id", "event_type")).alias("packed"),
    )


@register(
    "cast_functions",
    oracle="""
    SELECT l_orderkey,
           CAST(l_quantity AS INTEGER) AS qty_int,
           CAST(l_orderkey AS VARCHAR) AS key_str,
           CAST(CAST(l_orderkey AS VARCHAR) AS BIGINT) AS key_back,
           strftime(CAST(l_shipdate AS DATE), '%Y-%m-%d') AS ship_date,
           CAST(l_linenumber AS DOUBLE) AS line_dbl,
           CAST(l_quantity > 25 AS INTEGER) AS bulk_flag
    FROM lineitem
    """,
    tags=("F7",),
)
def cast_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F7: cast/conversion family across numeric/string/temporal/bool."""
    t = Catalog(spark, sf_dir)
    return t.lineitem.select(
        "l_orderkey",
        F.col("l_quantity").cast("int").alias("qty_int"),
        F.col("l_orderkey").cast("string").alias("key_str"),
        F.col("l_orderkey").cast("string").cast("bigint").alias("key_back"),
        F.date_format(F.col("l_shipdate").cast("date"), "yyyy-MM-dd").alias(
            "ship_date"
        ),
        F.col("l_linenumber").cast("double").alias("line_dbl"),
        (F.col("l_quantity") > 25).cast("int").alias("bulk_flag"),
    )
