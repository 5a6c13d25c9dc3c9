"""SQL API surface: the engine's tables are queryable with plain ANSI
SQL via ``spark.sql`` over registered views (the reference's embedded
SQL strings, §2 'lang SQL', without the embedded engine).

The passthrough query executes the SAME SQL text in Spark and in the
DuckDB oracle — the strongest dialect-compatibility statement the
gate can make.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..tables import register_all
from .registry import query

# One SQL text, two engines: restricted to the ANSI subset both parse
# identically (explicit TIMESTAMP literals, standard aggregates).
_PASSTHROUGH_SQL = """
    SELECT o_orderpriority,
           count(*) AS n_orders,
           round(sum(o_totalprice) + 1e-7, 2) AS total,
           min(o_orderdate) AS first_order,
           max(o_orderdate) AS last_order
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderstatus <> 'P'
    GROUP BY o_orderpriority
"""


@query("sql_api_passthrough", oracle=_PASSTHROUGH_SQL)
def sql_api_passthrough(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Register the tables as views and run the oracle's own SQL text
    through spark.sql — byte-identical query, hash-identical result."""
    register_all(spark, sf_dir)
    return spark.sql(_PASSTHROUGH_SQL)
