"""Core relational query surface.

Covers the reference's aggregation/join/sort/set operators
(SURVEY.md §2.3/§2.4/§2.6/§2.7 — A-1..A-6, J1/J2/J3/J5, O1/O2) over the
driver's TPC-H-ish tables, plus three TPC-H-shaped headline queries
(q01/q03/q05) that exercise the same operator classes at bench scale.

Scale notes (100 TB design stance):
 - fact×fact joins (orders×lineitem) are key-shuffled sort-merge joins;
   AQE coalesces / splits skewed partitions at runtime.
 - dim tables (region/nation/customer/supplier/part) are broadcast —
   they stay < 100 MB even at sf100k-equivalent cardinality growth and
   Spark picks broadcast automatically under the configured threshold;
   we hint explicitly where the stats may mislead.
 - every filter is a plain Column predicate → Catalyst pushes it into
   the parquet scan (verified via .explain in tests/test_plans.py).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from ..tables import load
from .registry import query, stable_round

# --------------------------------------------------------------------------
# TPC-H-shaped headline queries
# --------------------------------------------------------------------------


@query(
    "q01_pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity) + 1e-7, 2)                                    AS sum_qty,
           round(sum(l_extendedprice) + 1e-7, 2)                               AS sum_base_price,
           round(sum(l_extendedprice * (1 - l_discount)) + 1e-7, 2)            AS sum_disc_price,
           round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)) + 1e-7, 2) AS sum_charge,
           round(avg(l_quantity) + 1e-7, 2)                                    AS avg_qty,
           round(avg(l_extendedprice) + 1e-7, 2)                               AS avg_price,
           round(avg(l_discount) + 1e-7, 4)                                    AS avg_disc,
           count(*)                                                     AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q01_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: scan → pushed filter → hash agg (map-side partials).

    Reference parity: SUM/AVG/COUNT + GROUP BY inventory
    (db_duckdb.py:342-356 in the reference exposes exactly these
    aggregates over the files table).
    """
    l = load(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        l.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp_ntz"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            stable_round(F.sum("l_quantity"), 2).alias("sum_qty"),
            stable_round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            stable_round(F.sum(disc_price), 2).alias("sum_disc_price"),
            stable_round(F.sum(disc_price * (1 + F.col("l_tax"))), 2).alias("sum_charge"),
            stable_round(F.avg("l_quantity"), 2).alias("avg_qty"),
            stable_round(F.avg("l_extendedprice"), 2).alias("avg_price"),
            stable_round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@query(
    "q03_top_revenue_orders",
    oracle="""
    SELECT o_orderkey,
           round(sum(l_extendedprice * (1 - l_discount)) + 1e-7, 2) AS revenue,
           o_orderdate
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-03-15'
      AND l_shipdate  > TIMESTAMP '1998-03-15'
    GROUP BY o_orderkey, o_orderdate
    ORDER BY revenue DESC, o_orderkey
    LIMIT 10
    """,
)
def q03_top_revenue_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: broadcast dim filter → fact join → agg → top-k.

    customer is broadcast (small side); orders×lineitem co-shuffle on
    the order key. Ties at the LIMIT boundary are broken by o_orderkey
    on the *rounded* revenue so both engines pick the same set.
    """
    c = load(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = load(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-03-15").cast("timestamp_ntz")
    )
    l = load(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-03-15").cast("timestamp_ntz")
    )
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("o_orderkey", "o_orderdate")
        .agg(
            stable_round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            )
        )
        .orderBy(F.desc("revenue"), F.asc("o_orderkey"))
        .limit(10)
        .select("o_orderkey", "revenue", "o_orderdate")
    )


@query(
    "q05_regional_supplier_volume",
    oracle="""
    SELECT n_name,
           round(sum(l_extendedprice * (1 - l_discount)) + 1e-7, 2) AS revenue
    FROM customer, orders, lineitem, supplier, nation, region
    WHERE c_custkey = o_custkey
      AND l_orderkey = o_orderkey
      AND l_suppkey = s_suppkey
      AND c_nationkey = s_nationkey
      AND s_nationkey = n_nationkey
      AND n_regionkey = r_regionkey
      AND r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate <  TIMESTAMP '1997-01-01'
    GROUP BY n_name
    """,
)
def q05_regional_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: star join, all dims broadcast, one fact shuffle."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp_ntz"))
    )
    l = load(spark, sf_dir, "lineitem")
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(s), (l.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey))
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(
            stable_round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            )
        )
    )


# --------------------------------------------------------------------------
# Reference operator inventory (SURVEY §2.4 A-1..A-6, §2.6 O1/O2)
# --------------------------------------------------------------------------


@query(
    "agg_count_by_type",
    oracle="""
    SELECT event_type, count(*) AS n
    FROM events GROUP BY event_type
    """,
)
def agg_count_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A-3 (reference db_duckdb.py:352-356 — counts by entry type)."""
    return load(spark, sf_dir, "events").groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n")
    )


@query(
    "agg_totals",
    oracle="""
    SELECT count(*)                        AS n_rows,
           round(sum(o_totalprice) + 1e-7, 2)     AS total_price,
           round(avg(o_totalprice) + 1e-7, 2)     AS avg_price,
           count(DISTINCT o_custkey)       AS n_customers
    FROM orders
    """,
)
def agg_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A-1/A-2 (reference db_duckdb.py:342-349 — COUNT(*) + SUM totals)."""
    return load(spark, sf_dir, "orders").agg(
        F.count(F.lit(1)).alias("n_rows"),
        stable_round(F.sum("o_totalprice"), 2).alias("total_price"),
        stable_round(F.avg("o_totalprice"), 2).alias("avg_price"),
        F.countDistinct("o_custkey").alias("n_customers"),
    )


@query(
    "agg_conditional_sum",
    oracle="""
    SELECT o_orderpriority,
           round(sum(CASE WHEN o_orderstatus = 'F' THEN o_totalprice ELSE 0 END) + 1e-7, 2)
               AS finished_value,
           count(*) AS n
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def agg_conditional_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A-4 (reference elasticsearch_integration.py:337-345 — conditional
    SUM(CASE WHEN type='file' ...) in the directory rollup)."""
    o = load(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        stable_round(
            F.sum(F.when(F.col("o_orderstatus") == "F", F.col("o_totalprice")).otherwise(0)),
            2,
        ).alias("finished_value"),
        F.count(F.lit(1)).alias("n"),
    )


@query(
    "scalar_max_filter",
    oracle="""
    SELECT event_id, ts, event_type
    FROM events
    WHERE ts < (SELECT max(ts) FROM events) - INTERVAL 24 HOUR
    """,
)
def scalar_max_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A-5 (reference scanner.py:526-531 — rows older than the scalar
    MAX watermark). Implemented as a broadcast of the 1-row aggregate —
    no driver round-trip, one scan feeding both sides."""
    ev = load(spark, sf_dir, "events")
    mx = ev.agg(F.max("ts").alias("max_ts"))
    return (
        ev.join(F.broadcast(mx))
        .filter(F.col("ts") < F.col("max_ts") - F.expr("INTERVAL 24 HOUR"))
        .select("event_id", "ts", "event_type")
    )


@query(
    "distinct_pairs",
    oracle="""
    SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
    """,
)
def distinct_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A-6 (reference elasticsearch_integration.py:475-482 — SELECT DISTINCT)."""
    return load(spark, sf_dir, "lineitem").select("l_returnflag", "l_linestatus").distinct()


@query(
    "left_join_enrich",
    oracle="""
    SELECT o_orderkey,
           coalesce(c_name, 'unknown')            AS customer_name,
           coalesce(round(c_acctbal + 1e-7, 2), 0.0)     AS acctbal
    FROM orders LEFT JOIN customer ON o_custkey = c_custkey
    """,
)
def left_join_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1 (reference elasticsearch_integration.py:357-369 — enrichment
    left join docs×direct_links with COALESCE defaults). Small side
    broadcast."""
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    return o.join(F.broadcast(c), o.o_custkey == c.c_custkey, "left").select(
        "o_orderkey",
        F.coalesce("c_name", F.lit("unknown")).alias("customer_name"),
        F.coalesce(stable_round("c_acctbal", 2), F.lit(0.0)).alias("acctbal"),
    )


@query(
    "anti_join_missing",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer
    WHERE c_custkey NOT IN (
        SELECT o_custkey FROM orders WHERE o_orderdate < TIMESTAMP '1995-06-01'
    )
    """,
)
def anti_join_missing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J3 (reference scanner.py:447-454 — DELETE ... WHERE NOT IN, i.e.
    the removed-files anti-join). Filtered right side keeps the result
    non-trivial at every scale factor."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1995-06-01").cast("timestamp_ntz")
    )
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select("c_custkey", "c_name")


@query(
    "semi_join_active",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer
    WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    """,
)
def semi_join_active(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J5 complement (reference elasticsearch_integration.py:491-514 did
    set-intersection driver-side with a 10k cap; the semi join is the
    distributed, uncapped fix)."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select("c_custkey", "c_name")


@query(
    "work_discovery_stale",
    oracle="""
    SELECT p.p_partkey, p.p_name
    FROM part p
    LEFT JOIN (
        SELECT l_partkey, max(l_shipdate) AS last_ship FROM lineitem GROUP BY l_partkey
    ) s ON p.p_partkey = s.l_partkey
    WHERE s.l_partkey IS NULL OR s.last_ship < TIMESTAMP '2001-06-01'
    """,
)
def work_discovery_stale(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J2/P9 (reference direct_links.py:204-233 — files with no link OR
    a stale one: LEFT JOIN + IS NULL-or-stale predicate)."""
    p = load(spark, sf_dir, "part")
    last = (
        load(spark, sf_dir, "lineitem")
        .groupBy("l_partkey")
        .agg(F.max("l_shipdate").alias("last_ship"))
    )
    return (
        p.join(last, p.p_partkey == last.l_partkey, "left")
        .filter(
            F.col("l_partkey").isNull()
            | (F.col("last_ship") < F.lit("2001-06-01").cast("timestamp_ntz"))
        )
        .select("p_partkey", "p_name")
    )


@query(
    "topk_orders",
    oracle="""
    SELECT o_orderkey, round(o_totalprice + 1e-7, 2) AS total, o_orderdate
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 25
    """,
)
def topk_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O1/O2 (reference direct_links.py:221-238 — ORDER BY … LIMIT work
    queue; the OFFSET-pagination pathology is replaced by one global
    top-k, executed as per-partition top-k + single merge)."""
    return (
        load(spark, sf_dir, "orders")
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(25)
        .select("o_orderkey", stable_round("o_totalprice", 2).alias("total"), "o_orderdate")
    )


@query(
    "topk_per_group",
    oracle="""
    SELECT o_custkey, o_orderkey, round(o_totalprice + 1e-7, 2) AS total
    FROM (
        SELECT o_custkey, o_orderkey, o_totalprice,
               row_number() OVER (PARTITION BY o_custkey
                                  ORDER BY o_totalprice DESC, o_orderkey) AS rn
        FROM orders
    ) WHERE rn <= 3
    """,
)
def topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k per group via window (natural Spark extension of O1;
    single shuffle on the group key, no OFFSET loop)."""
    w = Window.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (
        load(spark, sf_dir, "orders")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("o_custkey", "o_orderkey", stable_round("o_totalprice", 2).alias("total"))
    )


@query(
    "union_set_ops",
    oracle="""
    SELECT c_nationkey AS nationkey, 'customer' AS side, count(*) AS n
    FROM customer GROUP BY c_nationkey
    UNION ALL
    SELECT s_nationkey AS nationkey, 'supplier' AS side, count(*) AS n
    FROM supplier GROUP BY s_nationkey
    """,
)
def union_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.7 — the parallel scanner's merge of per-directory result sets
    is an implicit UNION ALL (parallel_scanner.py:861-866)."""
    c = (
        load(spark, sf_dir, "customer")
        .groupBy(F.col("c_nationkey").alias("nationkey"))
        .agg(F.count(F.lit(1)).alias("n"))
        .withColumn("side", F.lit("customer"))
    )
    s = (
        load(spark, sf_dir, "supplier")
        .groupBy(F.col("s_nationkey").alias("nationkey"))
        .agg(F.count(F.lit(1)).alias("n"))
        .withColumn("side", F.lit("supplier"))
    )
    return c.unionByName(s).select("nationkey", "side", "n")
