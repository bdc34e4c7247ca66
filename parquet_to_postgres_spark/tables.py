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
from pyspark.sql import types as T

from . import TABLES

DEFAULT_SF_DIR = "/root/testdata/sf0.001"


def spread(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Split compensation for under-partitioned scans feeding
    COMPUTE-BOUND stages — opt-in per operator, never automatic.

    The test fixtures are ONE parquet file with ONE row group per table,
    so Spark's split planning yields a single input partition and any
    heavy per-row map stage (shingling, signature aggregation, Arrow
    decode) runs on one core regardless of cluster size.  A production
    100 TB table is thousands of files/row groups and never hits this;
    the repartition below is the local-scale analogue of the split
    planning a real layout provides, and it no-ops whenever the scan
    already carries at least cluster parallelism.

    Deliberately NOT applied in :func:`load_table`: for scan-bound
    queries (aggregate-after-filter, TakeOrdered top-k, set ops) a
    blanket repartition is a full extra shuffle of the fact table — and
    for Python-UDF stages it multiplies worker startup — which measured
    1.5–19× slower across the registry.  Only operators whose per-row
    compute dominates the scan call this.

    The under-split probe is ``inputFiles()`` — analysis-only, so
    building the operator never converts the plan to an RDD (the old
    ``df.rdd.getNumPartitions()`` probe forced a full logical→RDD
    conversion per call, surprise work on very wide plans).  File count
    lower-bounds the scan's split count, so a many-file production
    table (≥ target files) is guaranteed untouched; a non-scan input
    (no file lineage — already shuffled, so it carries its shuffle's
    parallelism) is left as-is."""
    spark = df.sparkSession
    target = min_partitions or spark.sparkContext.defaultParallelism
    files = df.inputFiles()
    if files and len(files) < target:
        return df.repartition(target)
    return df


def normalize_events_ts(df: DataFrame) -> DataFrame:
    """Normalize ``events.ts`` to session-TZ ``TIMESTAMP`` regardless of
    how the fixture encoded it.  The generator has shipped two physical
    types across rounds, so branch on the *actual* footer schema:

    - ``TIMESTAMP(NANOS)`` parquet (rejected by Spark's vectorized
      reader) read as raw int64 via ``legacy.parquet.nanosAsLong``:
      truncate to microseconds with *integer* division — epoch nanos
      (~1.7e18) exceed 2^53, so float division would corrupt the value.
      Truncation (not rounding) matches DuckDB's ns→µs cast, keeping
      the oracle comparable.
    - ``timestamp[us]`` with ``isAdjustedToUTC=false`` → Spark infers
      ``TIMESTAMP_NTZ``: cast to ``TIMESTAMP`` (the session TZ is
      pinned to UTC in session.py, so the wall-clock is preserved and
      epoch arithmetic like ``unix_micros`` matches DuckDB's naive
      reading of the same file).
    - already ``TIMESTAMP``: pass through.
    """
    dt = df.schema["ts"].dataType
    if isinstance(dt, T.LongType):
        return df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    if isinstance(dt, T.TimestampNTZType):
        return df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; known: {TABLES}")
    path = f"{sf_dir}/{name}.parquet"
    if name == "events":
        # Legacy conf is a no-op for non-nanos files; set it so the read
        # succeeds either way, then branch on what actually came back.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        return normalize_events_ts(spark.read.parquet(path))
    return spark.read.parquet(path)


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
