"""As-of and range join declared queries over the events table,
oracle-checked against DuckDB's native ASOF JOIN / inequality join —
the strongest possible parity evidence for composed operators.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..operators.timejoin import asof_join, maintain_asof_view, range_join
from ..tables import load
from .registry import query, stable_round


def _asof_sides(ev: DataFrame):
    """Shared shaping for the as-of pair: purchases as the left probe,
    clicks pre-aggregated per (user, ts) so exact ties are unambiguous
    in both engines."""
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    clicks = (
        ev.filter(F.col("event_type") == "click")
        .groupBy("user_id", "ts")
        .agg(
            F.max("event_id").alias("click_event"),
            F.max("value").alias("click_value"),
        )
    )
    return purchases, clicks


@query(
    "asof_click_before_purchase",
    oracle="""
    WITH p AS (
        SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'
    ),
    c AS (
        SELECT user_id, ts, max(event_id) AS click_event, max(value) AS click_value
        FROM events WHERE event_type = 'click' GROUP BY user_id, ts
    )
    SELECT p.event_id, p.user_id, p.ts,
           c.click_event AS click_event,
           round(c.click_value + 1e-7, 2) AS click_value
    FROM p ASOF LEFT JOIN c ON p.user_id = c.user_id AND p.ts >= c.ts
    """,
)
def asof_click_before_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: for every purchase, the user's most recent click at
    or before it (NULL when none) — union-sort-fill vs DuckDB's native
    ASOF LEFT JOIN. Right side pre-aggregated per (user, ts) so exact
    ties are unambiguous in both engines."""
    ev = load(spark, sf_dir, "events")
    purchases, clicks = _asof_sides(ev)
    out = asof_join(
        purchases,
        clicks,
        on="ts",
        by="user_id",
        value_cols=["click_event", "click_value"],
    )
    return out.select(
        "event_id",
        "user_id",
        "ts",
        F.col("right_click_event").alias("click_event"),
        stable_round(F.col("right_click_value"), 2).alias("click_value"),
    )


@query(
    "incremental_view_asof",
    oracle="""
    WITH post AS (
        SELECT * FROM events
        WHERE event_id % 7 = 0 OR event_id % 11 <> 0
    ),
    p AS (
        SELECT event_id, user_id, ts FROM post WHERE event_type = 'purchase'
    ),
    c AS (
        SELECT user_id, ts, max(event_id) AS click_event, max(value) AS click_value
        FROM post WHERE event_type = 'click' GROUP BY user_id, ts
    )
    SELECT p.event_id, p.user_id, p.ts,
           c.click_event AS click_event,
           round(c.click_value + 1e-7, 2) AS click_value
    FROM p ASOF LEFT JOIN c ON p.user_id = c.user_id AND p.ts >= c.ts
    """,
)
def incremental_view_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MAINTAINED as-of join view — the temporal-join member of the
    incremental_view_* family. Yesterday's materialized view (as-of
    over the base state, event_id % 7 != 0) is updated through one
    change window carrying both INSERTS (the % 7 == 0 rows) and
    DELETES (base rows with % 11 == 0) via maintain_asof_view: keys
    absent from the feed carry forward verbatim (anti-join), touched
    users' slices re-run the union-sort-fill as-of over post-state
    semi-joined slices. The oracle recomputes the as-of from scratch
    over the post state with DuckDB's NATIVE ASOF LEFT JOIN, so the
    hash gate proves delta-bound maintenance — including the hard
    case, delete-induced RE-MATCHING to an earlier click — equals the
    full recompute.

    Touched keys are restricted to feed rows of the two participating
    event types: a changed 'view'/'error' row cannot alter this view,
    and at 100 TB that type filter is the difference between
    recomputing 0.1% of users and recomputing every user that did
    anything."""
    ev = load(spark, sf_dir, "events")
    eid = F.col("event_id")
    base = ev.filter(eid % 7 != 0)
    inserts = ev.filter(eid % 7 == 0)
    deletes = base.filter(eid % 11 == 0)
    post = ev.filter((eid % 7 == 0) | (eid % 11 != 0))

    old_p, old_c = _asof_sides(base)
    old_view = asof_join(
        old_p, old_c, on="ts", by="user_id",
        value_cols=["click_event", "click_value"],
    )
    touched = (
        inserts.unionByName(deletes)
        .filter(F.col("event_type").isin("purchase", "click"))
        .select("user_id")
        .distinct()
    )
    new_p, new_c = _asof_sides(post)
    view2 = maintain_asof_view(
        old_view, new_p, new_c, touched,
        on="ts", by="user_id", value_cols=["click_event", "click_value"],
    )
    return view2.select(
        "event_id",
        "user_id",
        "ts",
        F.col("right_click_event").alias("click_event"),
        stable_round(F.col("right_click_value"), 2).alias("click_value"),
    )


@query(
    "range_join_error_after_purchase",
    oracle="""
    WITH p AS (
        SELECT event_id AS p_event, user_id, ts AS p_ts
        FROM events WHERE event_type = 'purchase'
    ),
    e AS (
        SELECT event_id AS e_event, user_id, ts AS e_ts
        FROM events WHERE event_type = 'error'
    )
    SELECT p_event, e_event, user_id,
           date_diff('microsecond', p_ts, e_ts) AS gap_us
    FROM p JOIN e USING (user_id)
    WHERE e_ts > p_ts AND e_ts <= p_ts + INTERVAL 600 SECOND
    """,
)
def range_join_error_after_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range join: errors within 10 minutes AFTER a purchase by the
    same user — bucketized equi-join + exact filter vs DuckDB's
    inequality join."""
    ev = load(spark, sf_dir, "events")
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("p_event"), "user_id", F.col("ts").alias("p_ts")
    )
    e = ev.filter(F.col("event_type") == "error").select(
        F.col("event_id").alias("e_event"), "user_id", F.col("ts").alias("e_ts")
    )
    out = range_join(
        p, e, left_time="p_ts", right_time="e_ts", by="user_id", max_gap_seconds=600
    )
    gap = F.expr("timestampdiff(MICROSECOND, p_ts, e_ts)")
    return out.select("p_event", "e_event", "user_id", gap.alias("gap_us"))


@query(
    "funnel_view_click_purchase",
    oracle="""
    WITH v AS (
        SELECT user_id, min(ts) AS t1 FROM events
        WHERE event_type = 'view' GROUP BY 1
    ), c AS (
        SELECT e.user_id, min(e.ts) AS t2
        FROM events e JOIN v USING (user_id)
        WHERE e.event_type = 'click' AND e.ts > v.t1 GROUP BY 1
    ), p AS (
        SELECT e.user_id, min(e.ts) AS t3
        FROM events e JOIN c USING (user_id)
        WHERE e.event_type = 'purchase' AND e.ts > c.t2 GROUP BY 1
    )
    SELECT (SELECT count(*) FROM v) AS n_viewed,
           (SELECT count(*) FROM c) AS n_clicked,
           (SELECT count(*) FROM p) AS n_purchased,
           round((SELECT count(*) FROM p)::DOUBLE
                 / (SELECT count(*) FROM v) + 1e-7, 4) AS conversion
    """,
)
def funnel_view_click_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel conversion: users whose first view precedes a
    later first click precedes a later first purchase. Each step is a
    user-keyed MIN aggregate over events filtered to the step type and
    AFTER the previous step's time — three hash aggregations + two
    user-keyed joins; every step's frame shrinks, and all stages
    co-partition on user_id (one shuffle key throughout, AQE reuses
    the exchange). The final single-row roll-up joins three 1-row
    aggregates — keyless but O(1)·O(1)."""
    ev = load(spark, sf_dir, "events")
    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    c = (
        ev.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(F.col("ts") > F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(F.col("ts") > F.col("t2"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"))
    )
    nv = v.agg(F.count(F.lit(1)).alias("n_viewed"))
    nc = c.agg(F.count(F.lit(1)).alias("n_clicked"))
    np_ = p.agg(F.count(F.lit(1)).alias("n_purchased"))
    return (
        nv.join(nc)
        .join(np_)
        .select(
            "n_viewed",
            "n_clicked",
            "n_purchased",
            stable_round(
                F.col("n_purchased").cast("double") / F.col("n_viewed"), 4
            ).alias("conversion"),
        )
    )


def _funnel_user_view(ev: DataFrame) -> DataFrame:
    """Per-user funnel step times: t1 = first view, t2 = first click
    after t1, t3 = first purchase after t2 (NULL when a step is never
    reached). One row per user who viewed — the keyed state the global
    funnel rolls up from."""
    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    c = (
        ev.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(F.col("ts") > F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(F.col("ts") > F.col("t2"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"))
    )
    return (
        v.join(c, "user_id", "left")
        .join(p, "user_id", "left")
        .select("user_id", "t1", "t2", "t3")
    )


@query(
    "incremental_view_funnel",
    oracle="""
    WITH post AS (
        SELECT * FROM events
        WHERE event_id % 7 = 0 OR event_id % 11 <> 0
    ),
    v AS (
        SELECT user_id, min(ts) AS t1 FROM post
        WHERE event_type = 'view' GROUP BY 1
    ), c AS (
        SELECT e.user_id, min(e.ts) AS t2
        FROM post e JOIN v USING (user_id)
        WHERE e.event_type = 'click' AND e.ts > v.t1 GROUP BY 1
    ), p AS (
        SELECT e.user_id, min(e.ts) AS t3
        FROM post e JOIN c USING (user_id)
        WHERE e.event_type = 'purchase' AND e.ts > c.t2 GROUP BY 1
    )
    SELECT (SELECT count(*) FROM v) AS n_viewed,
           (SELECT count(*) FROM c) AS n_clicked,
           (SELECT count(*) FROM p) AS n_purchased,
           round((SELECT count(*) FROM p)::DOUBLE
                 / (SELECT count(*) FROM v) + 1e-7, 4) AS conversion
    """,
)
def incremental_view_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MAINTAINED ordered-funnel state: the per-user (t1, t2, t3) step
    table is a pure per-user function of the user's events, so it
    maintains on the keyed-slice combinator — a changed user's whole
    funnel row rebuilds from post state (ORDERED steps make per-row
    patching genuinely wrong: a deleted first view can resurrect a
    later view as t1 and invalidate t2/t3 downstream; slice recompute
    handles the cascade by construction), untouched users carry
    forward verbatim. The global rollup re-aggregates the maintained
    per-user state — O(users who viewed), never O(events). Oracle =
    from-scratch funnel over the post state."""
    from ..operators.ivm import maintain_keyed_slices

    ev = load(spark, sf_dir, "events")
    eid = F.col("event_id")
    base = ev.filter(eid % 7 != 0)
    post = ev.filter((eid % 7 == 0) | (eid % 11 != 0))
    inserts = ev.filter(eid % 7 == 0)
    deletes = base.filter(eid % 11 == 0)

    old_view = _funnel_user_view(base)
    touched = (
        inserts.unionByName(deletes)
        .filter(F.col("event_type").isin("view", "click", "purchase"))
        .select("user_id")
        .distinct()
    )
    view2 = maintain_keyed_slices(
        old_view,
        touched,
        "user_id",
        lambda t: _funnel_user_view(post.join(t, ["user_id"], "left_semi")),
    )
    return view2.agg(
        F.count("t1").alias("n_viewed"),
        F.count("t2").alias("n_clicked"),
        F.count("t3").alias("n_purchased"),
        stable_round(
            F.count("t3").cast("double") / F.count("t1"), 4
        ).alias("conversion"),
    )
