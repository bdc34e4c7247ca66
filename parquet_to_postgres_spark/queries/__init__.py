"""Declared-query registry.

Every operator from SURVEY.md §2 is declared here exactly once as a
``QuerySpec``: a Spark DataFrame builder plus (where SQL-expressible) a
DuckDB oracle SQL twin.  ``__spark_entry__.py`` re-exports this registry
to the driver; tests iterate it.

Alias discipline: the driver's correctness gate sorts columns by name and
hashes values, so every computed column is aliased identically in the
Spark builder and the oracle SQL.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

Builder = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    builder: Builder
    oracle: str | None  # DuckDB SQL twin; None -> rows-only check
    tags: tuple[str, ...] = field(default_factory=tuple)


REGISTRY: dict[str, QuerySpec] = {}


def register(name: str, oracle: str | None = None, tags: tuple[str, ...] = ()):
    """Decorator: add a (builder, oracle) pair to the registry."""

    def deco(fn: Builder) -> Builder:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        REGISTRY[name] = QuerySpec(name, fn, oracle, tags)
        return fn

    return deco


def load_all() -> dict[str, QuerySpec]:
    """Import every query module (side effect: fills REGISTRY)."""
    from . import (  # noqa: F401
        aggregates_q,
        etl_q,
        functions_q,
        joins_q,
        llm_q,
        relational_q,
        setops_q,
        streaming_q,
        windows_q,
    )

    return REGISTRY


def queries() -> dict[str, Builder]:
    return {n: s.builder for n, s in load_all().items()}


def oracle_sql() -> dict[str, str]:
    return {n: s.oracle for n, s in load_all().items() if s.oracle is not None}
