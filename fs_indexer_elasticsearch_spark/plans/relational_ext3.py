"""Third extension batch: simple predicate-agg (q06), ranking window
functions, string fuzzy matching (edit distance), and calendar
breakdowns — rounding out the scalar/window surface.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from ..tables import load
from .registry import query, stable_round


@query(
    "q06_forecast_revenue",
    oracle="""
    SELECT round(sum(l_extendedprice * l_discount) + 1e-7, 2) AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate <  TIMESTAMP '1997-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
)
def q06_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: pure scan-filter-agg, fully pushed down — the
    whole query runs inside one codegen stage + a 1-row reduce."""
    l = load(spark, sf_dir, "lineitem")
    return (
        l.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp_ntz"))
            & F.col("l_discount").between(0.05, 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            stable_round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2).alias(
                "revenue"
            )
        )
    )


@query(
    "window_rank_functions",
    oracle="""
    SELECT o_orderpriority, o_orderkey,
           rank() OVER w AS rnk,
           dense_rank() OVER w AS drnk,
           ntile(4) OVER w AS quartile,
           round(cume_dist() OVER w + 1e-7, 4) AS cdist
    FROM orders
    WHERE o_orderkey % 50 = 0
    WINDOW w AS (PARTITION BY o_orderpriority
                 ORDER BY o_totalprice DESC, o_orderkey)
    """,
)
def window_rank_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Analytic ranking functions: rank, dense_rank, ntile, cume_dist
    over a totally-ordered window (tie-broken → engine-stable)."""
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 50 == 0)
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return o.select(
        "o_orderpriority",
        "o_orderkey",
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
        F.ntile(4).over(w).alias("quartile"),
        stable_round(F.cume_dist().over(w), 4).alias("cdist"),
    )


@query(
    "fuzzy_name_match",
    oracle="""
    SELECT id_a, id_b, dist FROM (
        SELECT a.p_partkey AS id_a, b.p_partkey AS id_b,
               levenshtein(a.p_name, b.p_name) AS dist
        FROM part a JOIN part b ON a.p_partkey < b.p_partkey
        WHERE a.p_partkey % 20 = 0 AND b.p_partkey % 20 = 0
    ) WHERE dist <= 3
    """,
)
def fuzzy_name_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String similarity search (edit distance ≤ 3) via LENGTH-BAND
    blocking: |len(a)-len(b)| ≤ 3 is a necessary condition for
    levenshtein ≤ 3, so candidates only need to share a width-4 length
    band with one side probing its neighbor bands — an EQUI-join on
    the band key (each pair lands in exactly one band, no dedup
    needed), never a cross/nested-loop theta join. The oracle is the
    plain quadratic formulation; blocking is a pure superset filter,
    so results are identical (the compressed-index string-similarity
    family, ICDE'22 in PAPERS.md). At scale the band key extends with
    a prefix/q-gram component to shrink blocks further."""
    p = load(spark, sf_dir, "part").filter(F.col("p_partkey") % 20 == 0)
    band = F.floor(F.length("p_name") / 4).cast("long")
    a = p.select(
        F.col("p_partkey").alias("id_a"),
        F.col("p_name").alias("name_a"),
        F.explode(
            F.array(band - 1, band, band + 1)
        ).alias("band"),
    )
    b = p.select(
        F.col("p_partkey").alias("id_b"),
        F.col("p_name").alias("name_b"),
        band.alias("band"),
    )
    return (
        a.join(b, "band")
        .filter(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a", "id_b", F.levenshtein("name_a", "name_b").alias("dist")
        )
        .filter(F.col("dist") <= 3)
    )


@query(
    "calendar_breakdown",
    oracle="""
    SELECT year(o_orderdate) AS y,
           month(o_orderdate) AS m,
           dayofweek(o_orderdate) AS dow,
           count(*) AS n,
           round(sum(o_totalprice) + 1e-7, 2) AS total
    FROM orders
    GROUP BY 1, 2, 3
    """,
)
def calendar_breakdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar-part extraction + aggregation. Spark's dayofweek is
    1-based Sunday=1; DuckDB's is 0-based Sunday=0 — normalized here."""
    o = load(spark, sf_dir, "orders")
    return (
        o.groupBy(
            F.year("o_orderdate").alias("y"),
            F.month("o_orderdate").alias("m"),
            (F.dayofweek("o_orderdate") - 1).alias("dow"),
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            stable_round(F.sum("o_totalprice"), 2).alias("total"),
        )
    )
