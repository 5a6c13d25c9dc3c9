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

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


def stable_round(col: Column | str, n: int) -> Column:
    """Cross-engine-stable rounding for float aggregates.

    Plain ``round(x, n)`` diverges between Spark and DuckDB when the
    value's shortest decimal representation lands exactly on a half
    boundary (Spark rounds the BigDecimal shortest form HALF_UP;
    DuckDB rounds the scaled binary value) — systematic for averages
    of few 2-decimal values and for ``price * 1.1``-style products.
    Adding 1e-7 before rounding shifts those exact-boundary cases off
    the knife edge identically in both engines; every oracle SQL twin
    writes ``round(x + 1e-7, n)``.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.round(c + F.lit(1e-7), n)

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
