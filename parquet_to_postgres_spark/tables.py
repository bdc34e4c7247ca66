"""Test-table catalog: load the driver-generated TPC-H-ish parquet tables.

Replaces the reference's hardcoded single-file scan
(``/root/reference/src/main.rs:52`` — ``File::open("data/flights.parquet")``)
with a declarative multi-table catalog.  ``spark.read.parquet`` reads the
footer schema (the analogue of ``main.rs:56`` ``get_schema()``) and gives
Catalyst a prunable, filter-pushable scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import TABLES

DEFAULT_SF_DIR = "/root/testdata/sf0.001"


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; known: {TABLES}")
    if name == "events":
        # events.ts is TIMESTAMP(NANOS) parquet, which Spark's vectorized
        # reader rejects.  Read nanos as raw int64 (legacy conf), then
        # truncate to microseconds with *integer* division — epoch nanos
        # (~1.7e18) exceed 2^53, so float division would corrupt the
        # value.  Truncation (not rounding) matches DuckDB's ns→µs cast,
        # keeping the oracle comparable.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        return df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


class Catalog:
    """Lazy attribute-style access to the star-schema tables.

    >>> t = Catalog(spark, sf_dir)
    >>> t.lineitem.join(t.orders, ...)
    """

    def __init__(self, spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR):
        self._spark = spark
        self._sf_dir = sf_dir

    def __getattr__(self, name: str) -> DataFrame:
        if name.startswith("_"):
            raise AttributeError(name)
        return load_table(self._spark, self._sf_dir, name)
