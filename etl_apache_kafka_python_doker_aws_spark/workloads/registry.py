"""Query registry: every SURVEY.md §2 operator row registers one named
query (a ``(spark, sf_dir) -> DataFrame`` callable) and, when the
semantics are ANSI-SQL-expressible, a DuckDB oracle SQL string.

The driver contract (``__spark_entry__.py``) reads these dicts directly.
Column names/aliases MUST match between the Spark query and its oracle —
the harness hashes values after sorting columns by name.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register a named query and (optionally) its DuckDB oracle SQL."""

    def deco(fn: QueryFn) -> QueryFn:
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle.strip()
        return fn

    return deco
