"""Remaining small operators from the SURVEY §2 inventory: ES
term/terms filters, the work-queue pagination shape, the two-format
date parse, and the accumulator stats summary."""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from ..functions import format_size
from ..tables import load
from .registry import query


@query(
    "terms_filter",
    oracle="""
    SELECT event_id, event_type, user_id
    FROM events
    WHERE event_type IN ('purchase', 'signup') AND user_id = 7
    """,
)
def terms_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.9 ES `terms` + `term` filters (elasticsearch_integration.py:
    530-536) → isin + equality, both pushed to the scan."""
    ev = load(spark, sf_dir, "events")
    return ev.filter(
        F.col("event_type").isin("purchase", "signup") & (F.col("user_id") == 7)
    ).select("event_id", "event_type", "user_id")


@query(
    "pagination_page",
    oracle="""
    SELECT o_orderkey, o_orderdate
    FROM (
        SELECT o_orderkey, o_orderdate,
               row_number() OVER (ORDER BY o_orderdate DESC, o_orderkey) AS rn
        FROM orders
    ) WHERE rn > 100 AND rn <= 150
    """,
)
def pagination_page(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O1 — the reference's ORDER BY … LIMIT/OFFSET work queue
    (direct_links.py:221-238). Declared as a rank-range window (the
    deterministic form); in the pipeline the whole work set is
    processed partition-wise instead of paging (no OFFSET re-sort
    per page)."""
    o = load(spark, sf_dir, "orders")
    w = Window.orderBy(F.desc("o_orderdate"), F.asc("o_orderkey"))
    return (
        o.withColumn("rn", F.row_number().over(w))
        .filter((F.col("rn") > 100) & (F.col("rn") <= 150))
        .select("o_orderkey", "o_orderdate")
    )


@query(
    "parse_two_format_dates",
    oracle="""
    SELECT o_orderkey,
           coalesce(
               try_strptime(date_str, '%b %-d %Y'),
               try_strptime(date_str || ' 1996', '%b %-d %H:%M %Y')
           ) AS parsed
    FROM (
        SELECT o_orderkey,
               CASE WHEN o_orderkey % 2 = 0
                    THEN strftime(o_orderdate, '%b %-d %Y')
                    ELSE strftime(o_orderdate, '%b %-d %H:%M') END AS date_str
        FROM orders
    )
    """,
)
def parse_two_format_dates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P6 — the `find -ls` two-format date parse (scanner.py:148-164)
    round-tripped through strings generated from o_orderdate: even
    keys get 'Mon D YYYY', odd keys 'Mon D HH:MM' (resolved against a
    fixed year for determinism)."""
    o = load(spark, sf_dir, "orders")
    date_str = F.when(
        F.col("o_orderkey") % 2 == 0,
        F.date_format("o_orderdate", "MMM d yyyy"),
    ).otherwise(F.date_format("o_orderdate", "MMM d HH:mm"))
    staged = o.select("o_orderkey", date_str.alias("date_str"))
    parsed = F.coalesce(
        F.try_to_timestamp(F.col("date_str"), F.lit("MMM d yyyy")),
        F.try_to_timestamp(
            F.concat(F.col("date_str"), F.lit(" 1996")), F.lit("MMM d HH:mm yyyy")
        ),
    )
    return staged.select("o_orderkey", parsed.cast("timestamp_ntz").alias("parsed"))


@query(
    "stats_summary",
    oracle="""
    SELECT count(*) AS total_entries,
           count(*) FILTER (WHERE l_returnflag = 'R') AS returned,
           CAST(sum(l_quantity) AS BIGINT) AS total_qty,
           CASE
               WHEN sum(l_quantity) * 1024 < 1024 THEN printf('%.1f', sum(l_quantity) * 1024 / 1.0 + 1e-7) || ' B'
               WHEN sum(l_quantity) * 1024 < 1048576 THEN printf('%.1f', sum(l_quantity) * 1024 / 1024.0 + 1e-7) || ' KB'
               WHEN sum(l_quantity) * 1024 < 1073741824 THEN printf('%.1f', sum(l_quantity) * 1024 / 1048576.0 + 1e-7) || ' MB'
               WHEN sum(l_quantity) * 1024 < 1099511627776 THEN printf('%.1f', sum(l_quantity) * 1024 / 1073741824.0 + 1e-7) || ' GB'
               WHEN sum(l_quantity) * 1024 < 1125899906842624 THEN printf('%.1f', sum(l_quantity) * 1024 / 1099511627776.0 + 1e-7) || ' TB'
               ELSE printf('%.1f', sum(l_quantity) * 1024 / 1125899906842624.0 + 1e-7) || ' PB'
           END AS total_human
    FROM lineitem
    """,
)
def stats_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A-7 — the workflow stats summary (workflow_stats.py:49-70):
    totals + the human-readable size string, as one aggregate row.
    (In the pipeline these come from observe() at zero extra cost.)"""
    l = load(spark, sf_dir, "lineitem")
    return l.agg(
        F.count(F.lit(1)).alias("total_entries"),
        F.sum(F.when(F.col("l_returnflag") == "R", 1).otherwise(0)).alias("returned"),
        F.sum("l_quantity").cast("long").alias("total_qty"),
        format_size(F.sum("l_quantity") * 1024).alias("total_human"),
    )


@query(
    "percentile_stats",
    oracle="""
    SELECT o_orderpriority,
           round(quantile_cont(o_totalprice, 0.5) + 1e-7, 2) AS p50,
           round(quantile_cont(o_totalprice, 0.9) + 1e-7, 2) AS p90,
           round(quantile_cont(o_totalprice, 0.99) + 1e-7, 2) AS p99
    FROM orders GROUP BY o_orderpriority
    """,
)
def percentile_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles (Spark `percentile` ≡ DuckDB
    `quantile_cont` — both linear interpolation over the sorted set).
    At 100 TB switch to `approx_percentile` (t-digest) — sketches are
    engine-specific, so the exact form is the oracle-checked one."""
    from .registry import stable_round as _sr

    o = load(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        _sr(F.percentile("o_totalprice", F.lit(0.5)), 2).alias("p50"),
        _sr(F.percentile("o_totalprice", F.lit(0.9)), 2).alias("p90"),
        _sr(F.percentile("o_totalprice", F.lit(0.99)), 2).alias("p99"),
    )
