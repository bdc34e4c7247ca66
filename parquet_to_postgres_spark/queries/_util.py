"""Shared helpers for declared queries.

Determinism strategy for the hash-match gate
--------------------------------------------
The test data's money/rate columns are doubles that carry exactly two
decimal digits.  Summing doubles is order-dependent (Spark and DuckDB
aggregate in different partition orders), so every money aggregate here:

1. casts the input to ``DECIMAL(12,2)`` — exact, since the values have
   two decimals and magnitude < 10^10.  Precision 12 is chosen so that
   triple products like ``price * (1-disc) * (1+tax)`` stay within the
   38-digit decimal cap **exactly** (no precision-loss rounding) in both
   Spark and DuckDB;
2. aggregates in decimal (exact, order-independent);
3. casts the final result to ``DOUBLE`` — the same exact decimal value
   converts to the same IEEE double in both engines, and the output
   schema is a plain double on both sides.

Derived statistics (mean, stddev, corr) are computed from exact decimal
sums cast to double, then combined with plain double arithmetic — the
same IEEE operations on the same inputs give bit-identical results in
both engines, with no rounding fudge needed.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dec(col: str | Column, scale: int = 2, precision: int = 12) -> Column:
    """Exact decimal view of a 2-decimal double column."""
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(f"decimal({precision},{scale})")


def dsum(col: str | Column, alias: str) -> Column:
    """Order-independent sum of a 2-decimal double, output as double."""
    return F.sum(dec(col)).cast("double").alias(alias)


def davg(col: str | Column, alias: str) -> Column:
    """Order-independent mean: exact decimal sum (as double) / count.

    Both engines divide the identical double by the identical count, so
    the result is bit-identical — no rounding needed.
    """
    c = F.col(col) if isinstance(col, str) else col
    return (F.sum(dec(c)).cast("double") / F.count(c)).alias(alias)


# Oracle-side (DuckDB SQL) fragments matching the helpers above.
def sql_dec(expr: str, scale: int = 2, precision: int = 12) -> str:
    return f"CAST({expr} AS DECIMAL({precision},{scale}))"


def sql_dsum(expr: str, alias: str) -> str:
    return f"CAST(SUM({sql_dec(expr)}) AS DOUBLE) AS {alias}"


def sql_davg(expr: str, alias: str) -> str:
    return f"CAST(SUM({sql_dec(expr)}) AS DOUBLE) / COUNT({expr}) AS {alias}"
