"""Declared-query registry.

Every operator from SURVEY.md §2 (and each LLM-data extension) registers
here as a named query: a Spark callable ``(spark, sf_dir) -> DataFrame``
plus — when SQL-expressible — an equivalent ANSI/DuckDB oracle SQL
string over the same tables. The driver hash-compares both at sf0.01;
``tools/check_correctness.py`` does the same locally.

Column-name parity rule: alias every computed column identically in the
Spark plan and the oracle SQL (the comparator sorts columns by name).
Float rule: wrap unstable float aggregates in ``round(x, n)`` on BOTH
sides so partial-aggregation ordering differences can't flip the hash.
"""

from __future__ import annotations

from collections.abc import Callable


from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

# Re-exported for the query modules; defined in functions.rounding so
# operator modules can use it without importing the plans package
# (which would cycle back through this registry).
from ..functions.rounding import stable_round  # noqa: E402,F401

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register a declared query, optionally with its DuckDB oracle SQL.

    Queries with no oracle get the driver's weaker rows-only check
    (reserved for genuinely non-SQL-expressible ops).
    """

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name {name!r}")
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco
