"""Scale-pattern operators: explicit skew handling.

AQE's skew-join splitting (session.py) covers joins automatically; this
module provides the *aggregation* analogue — salted two-stage aggregation
— for workloads where a handful of hot keys (one user, one URL domain,
one dedup cluster) would otherwise pin a single reducer at 100 TB.

The reference has no aggregation at all (/root/reference/src/main.rs —
scan→type-map→sink only); this is part of the §2B scale mandate.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_agg(
    df: DataFrame,
    keys: list[str],
    partials: dict[str, Column],
    finals: dict[str, Column],
    salt_col: Column,
    buckets: int = 16,
) -> DataFrame:
    """Two-stage skew-safe aggregation.

    Stage 1 groups by (keys + salt) — a hot key's rows spread over
    ``buckets`` reducers instead of one.  Stage 2 combines the ≤buckets
    partial rows per key.  Only decomposable aggregates (count/sum/min/
    max — anything with an associative combine) are expressible; that is
    the same restriction Spark's own partial aggregation has.

    ``salt_col`` must be deterministic (e.g. ``pmod(col("event_id"), n)``)
    so results are reproducible run-to-run.

    partials: output-name -> aggregate over raw rows (stage 1)
    finals:   output-name -> aggregate over stage-1 partial columns
    """
    salted = df.withColumn("__salt", salt_col % buckets)
    stage1 = salted.groupBy(*keys, "__salt").agg(
        *[c.alias(n) for n, c in partials.items()]
    )
    return stage1.groupBy(*keys).agg(*[c.alias(n) for n, c in finals.items()])


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str,
    buckets: int = 32,
    mode: str = "overwrite",
) -> None:
    """Persist a table hash-bucketed (and sorted) on its join key.

    Two tables bucketed on the same key with the same bucket count
    sort-merge-join WITHOUT a shuffle exchange on either side — the
    pre-partitioning is reused across every downstream join/aggregation
    on that key.  This is the 100 TB answer to repeated fact⋈fact joins
    (e.g. lineitem⋈orders on orderkey): pay the shuffle once at write
    time, never at read time."""
    (
        df.write.mode(mode)
        .bucketBy(buckets, key)
        .sortBy(key)
        .format("parquet")
        .saveAsTable(table)
    )
