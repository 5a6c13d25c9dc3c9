"""Fourth extension batch: adapted q02/q09/q11/q12/q16/q20/q21 (the
star schema has no partsupp/shipmode/commitdate, so cost, stock value
and lateness are derived from the available columns — the
JOIN/subquery shapes are intact)."""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..tables import ckpt_shared, load
from .registry import query, stable_round


@query(
    "q09_product_profit",
    oracle="""
    SELECT nation, o_year, round(sum(amount) + 1e-7, 2) AS sum_profit
    FROM (
        SELECT n_name AS nation, year(o_orderdate) AS o_year,
               l_extendedprice * (1 - l_discount)
                 - 0.6 * p_retailprice * l_quantity AS amount
        FROM part, supplier, lineitem, orders, nation
        WHERE s_suppkey = l_suppkey AND p_partkey = l_partkey
          AND o_orderkey = l_orderkey AND s_nationkey = n_nationkey
          AND p_name LIKE '%widget%'
    )
    GROUP BY nation, o_year
    """,
)
def q09_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape (cost = 0.6·retailprice·qty in lieu of
    ps_supplycost): profit by supplier nation and order year."""
    p = load(spark, sf_dir, "part").filter(F.col("p_name").like("%widget%"))
    s = load(spark, sf_dir, "supplier")
    l = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders")
    n = load(spark, sf_dir, "nation")
    amount = F.col("l_extendedprice") * (1 - F.col("l_discount")) - 0.6 * F.col(
        "p_retailprice"
    ) * F.col("l_quantity")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy(
            F.col("n_name").alias("nation"), F.year("o_orderdate").alias("o_year")
        )
        .agg(stable_round(F.sum(amount), 2).alias("sum_profit"))
    )


@query(
    "q12_late_shipping",
    oracle="""
    SELECT CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                THEN 'high' ELSE 'low' END AS prio_class,
           count(*) AS late_items
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    WHERE l_shipdate > o_orderdate + INTERVAL 90 DAY
    GROUP BY 1
    """,
)
def q12_late_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape (lateness threshold in lieu of shipmode):
    priority-class counts of items shipped >90 days after ordering."""
    o = load(spark, sf_dir, "orders")
    l = load(spark, sf_dir, "lineitem")
    prio = F.when(
        F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"), "high"
    ).otherwise("low")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .filter(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAY"))
        .groupBy(prio.alias("prio_class"))
        .agg(F.count(F.lit(1)).alias("late_items"))
    )


@query(
    "q20_bulk_part_suppliers",
    oracle="""
    SELECT s_suppkey, s_name
    FROM supplier
    WHERE s_suppkey IN (
        SELECT l_suppkey
        FROM lineitem JOIN part ON p_partkey = l_partkey
        WHERE p_name LIKE '%widget%'
          AND l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate <  TIMESTAMP '1997-01-01'
        GROUP BY l_suppkey
        HAVING sum(l_quantity) > 100
    )
    """,
)
def q20_bulk_part_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: IN-subquery over a grouped HAVING (suppliers
    who moved >100 units of widget parts in 1996)."""
    s = load(spark, sf_dir, "supplier")
    p = load(spark, sf_dir, "part").filter(F.col("p_name").like("%widget%"))
    l = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp_ntz"))
    )
    bulk = (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .groupBy("l_suppkey")
        .agg(F.sum("l_quantity").alias("q"))
        .filter(F.col("q") > 100)
        .select("l_suppkey")
    )
    return s.join(bulk, s.s_suppkey == bulk.l_suppkey, "left_semi").select(
        "s_suppkey", "s_name"
    )


@query(
    "q21_waiting_suppliers",
    oracle="""
    WITH li AS (
        SELECT l_orderkey, l_suppkey,
               max(CASE WHEN l_shipdate > o_orderdate + INTERVAL 60 DAY
                        THEN 1 ELSE 0 END) AS late
        FROM lineitem JOIN orders ON o_orderkey = l_orderkey
        GROUP BY l_orderkey, l_suppkey
    )
    SELECT s_name, count(*) AS numwait
    FROM li l1 JOIN supplier ON s_suppkey = l1.l_suppkey
    WHERE l1.late = 1
      AND EXISTS (SELECT 1 FROM li l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey AND l2.late = 0)
    GROUP BY s_name
    """,
)
def q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape: late supplier on an order where another
    supplier shipped on time — self-join EXISTS over a grouped CTE."""
    o = load(spark, sf_dir, "orders")
    l = load(spark, sf_dir, "lineitem")
    s = load(spark, sf_dir, "supplier")
    li = (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .groupBy("l_orderkey", "l_suppkey")
        .agg(
            F.max(
                F.when(
                    F.col("l_shipdate")
                    > F.col("o_orderdate") + F.expr("INTERVAL 60 DAY"),
                    1,
                ).otherwise(0)
            ).alias("late")
        )
        .transform(ckpt_shared)
    )
    l1 = li.filter(F.col("late") == 1).alias("l1")
    ontime = li.filter(F.col("late") == 0).select(
        F.col("l_orderkey").alias("ok2"), F.col("l_suppkey").alias("sk2")
    )
    waited = l1.join(
        ontime,
        (F.col("l1.l_orderkey") == F.col("ok2"))
        & (F.col("l1.l_suppkey") != F.col("sk2")),
        "left_semi",
    )
    return (
        waited.join(F.broadcast(s), F.col("l1.l_suppkey") == s.s_suppkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
    )


@query(
    "q11_important_stock",
    oracle="""
    SELECT l_partkey, round(sum(l_extendedprice) + 1e-7, 2) AS value
    FROM lineitem JOIN supplier ON s_suppkey = l_suppkey
                  JOIN nation ON n_nationkey = s_nationkey
    WHERE n_name = 'NATION_7'
    GROUP BY l_partkey
    HAVING round(sum(l_extendedprice) + 1e-7, 2) > (
        SELECT round(sum(l_extendedprice) * 0.0002 + 1e-7, 2)
        FROM lineitem JOIN supplier ON s_suppkey = l_suppkey
                      JOIN nation ON n_nationkey = s_nationkey
        WHERE n_name = 'NATION_7')
    """,
)
def q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape (lineitem value in lieu of partsupp
    supplycost·availqty): per-part value within one nation, kept only
    above a fraction of the nation's total — grouped agg HAVING a
    scalar subquery. The scalar threshold joins in as a broadcast
    1-row aggregate (never a driver collect), and the nation-filtered
    supplier dim broadcasts, so the only shuffle is the partkey agg."""
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_7")
    l = load(spark, sf_dir, "lineitem")
    supplied = l.join(
        F.broadcast(s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)),
        l.l_suppkey == F.col("s_suppkey"),
    )
    per_part = supplied.groupBy("l_partkey").agg(
        F.sum("l_extendedprice").alias("_v")
    )
    # Threshold derived FROM per_part (sum of per-part sums == total),
    # so the fact scan + broadcast join subtree runs ONCE, not twice
    # (the common subtree ends before any exchange, so Spark's
    # exchange reuse can't deduplicate a second `supplied` branch).
    # The membership comparison rounds BOTH sides to 2 decimals first:
    # raw double sums are partial-aggregation-order dependent, and a
    # part landing within ulps of the threshold would flip row
    # membership between runs/engines — the one flake stable_round on
    # the OUTPUT cannot mask.
    threshold = per_part.agg((F.sum("_v") * 0.0002).alias("_t"))
    return (
        per_part.join(F.broadcast(threshold))
        .filter(stable_round("_v", 2) > stable_round("_t", 2))
        .select("l_partkey", stable_round("_v", 2).alias("value"))
    )


@query(
    "q02_min_cost_part",
    oracle="""
    SELECT p.p_brand, p.p_partkey, p.p_name, round(p.p_retailprice + 1e-7, 2) AS price
    FROM part p
    WHERE p.p_retailprice = (
        SELECT min(p2.p_retailprice) FROM part p2 WHERE p2.p_brand = p.p_brand
    )
    ORDER BY p.p_brand, p.p_partkey
    """,
)
def q02_min_cost_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape (correlated MIN subquery): the cheapest part(s)
    per brand, decorrelated into a per-group aggregate join."""
    p = load(spark, sf_dir, "part")
    mn = p.groupBy(F.col("p_brand").alias("b")).agg(
        F.min("p_retailprice").alias("mn")
    )
    return (
        p.join(F.broadcast(mn), (p.p_brand == F.col("b")) & (p.p_retailprice == F.col("mn")))
        .orderBy("p_brand", "p_partkey")
        .select(
            "p_brand",
            "p_partkey",
            "p_name",
            stable_round("p_retailprice", 2).alias("price"),
        )
    )


@query(
    "q16_supplier_diversity",
    oracle="""
    SELECT p_brand, p_size, count(DISTINCT l_suppkey) AS supplier_cnt
    FROM part JOIN lineitem ON p_partkey = l_partkey
    WHERE p_size IN (1, 14, 23, 45)
    GROUP BY p_brand, p_size
    """,
)
def q16_supplier_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape (lineitem in lieu of partsupp): distinct
    supplier count per brand/size — COUNT(DISTINCT) expands to a
    two-phase aggregate, partial-dedup before the shuffle."""
    p = load(spark, sf_dir, "part").filter(F.col("p_size").isin(1, 14, 23, 45))
    l = load(spark, sf_dir, "lineitem")
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .groupBy("p_brand", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )
