"""Arbitrary GROUPING SETS — the one multi-dimensional aggregation
shape the DataFrame API can't spell (rollup/cube cover only the
hierarchical / full-cross lattices; ROLLUP, CUBE and explicit-list
pivot queries live in plans/relational_ext.py).

Scale note (100 TB): like rollup/cube, GROUPING SETS compiles to a
single Expand + hash aggregate — one pass over the fact table emitting
one row per grouping set per input row, combined map-side; the shuffle
is bounded by (sets × distinct keys), never by a re-scan per set.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..tables import load
from .registry import query


@query(
    "agg_grouping_sets",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           round(sum(l_extendedprice) + 1e-7, 2) AS sum_price,
           count(*) AS n
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))
    """,
)
def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Disjoint per-dimension totals in ONE pass (flag totals and
    status totals, no cross terms) — an explicit grouping-set list
    through the SQL surface; the non-grouped column is NULL per set,
    exactly as the oracle's GROUPING SETS emits it."""
    load(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem_gs")
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus,
               round(sum(l_extendedprice) + 1e-7, 2) AS sum_price,
               count(*) AS n
        FROM lineitem_gs
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))
        """
    )
