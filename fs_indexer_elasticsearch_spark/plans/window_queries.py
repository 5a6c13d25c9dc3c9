"""Event-time window queries over the ``events`` table.

The reference's only event-time logic is last_seen/modified_time
comparisons (SURVEY §2.10) — tumbling/hopping/session windows are the
natural Spark extension the engine exposes (same operators power the
streaming pipeline in streaming/).

Oracle note: Spark's ``window()`` starts are epoch-aligned, so the
DuckDB twin computes ``TIMESTAMP '1970-01-01' + floor(epoch/width)*width``
— identical bucketing, no timezone involved (all NTZ).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from ..tables import load
from .registry import query, stable_round


@query(
    "window_tumbling_10m",
    oracle="""
    SELECT TIMESTAMP '1970-01-01 00:00:00'
             + CAST(floor(epoch(ts) / 600) * 600 AS BIGINT) * INTERVAL 1 SECOND
               AS window_start,
           event_type,
           count(*) AS n,
           round(sum(value) + 1e-7, 2) AS total_value
    FROM events
    GROUP BY 1, 2
    """,
)
def window_tumbling_10m(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 10-minute windows per event type — one shuffle on
    (window, type), map-side partial aggregation."""
    ev = load(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "10 minutes").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), stable_round(F.sum("value"), 2).alias("total_value"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n", "total_value")
    )


@query(
    "window_hopping_10m_5m",
    oracle="""
    SELECT TIMESTAMP '1970-01-01 00:00:00'
             + (CAST(floor(epoch(ts) / 300) * 300 AS BIGINT) - shift) * INTERVAL 1 SECOND
               AS window_start,
           count(*) AS n,
           round(avg(value) + 1e-7, 2) AS avg_value
    FROM events, (SELECT unnest([0, 300]) AS shift)
    GROUP BY 1
    """,
)
def window_hopping_10m_5m(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hopping (sliding) windows: 10-minute width, 5-minute slide —
    every event lands in exactly two windows."""
    ev = load(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "10 minutes", "5 minutes").alias("w"))
        .agg(F.count(F.lit(1)).alias("n"), stable_round(F.avg("value"), 2).alias("avg_value"))
        .select(F.col("w.start").alias("window_start"), "n", "avg_value")
    )


@query(
    "window_session_30m",
    oracle="""
    WITH marked AS (
        SELECT user_id, ts, event_id, value,
               CASE WHEN lag(ts) OVER w IS NULL
                         OR ts - lag(ts) OVER w >= INTERVAL 30 MINUTE
                    THEN 1 ELSE 0 END AS new_session
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    sessions AS (
        -- ORDER BY ts, event_id: same tiebreak as the marked CTE. On
        -- ts alone the cumsum could order a same-timestamp tie row
        -- BEFORE its session-boundary sibling (ROWS frames over a
        -- nondeterministic tie order), splitting two same-ts events
        -- across sessions where Spark's session_window merges them.
        SELECT user_id, ts, value,
               sum(new_session) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id
                                      ROWS UNBOUNDED PRECEDING) AS session_no
        FROM marked
    )
    SELECT user_id, min(ts) AS session_start, count(*) AS n_events,
           round(sum(value) + 1e-7, 2) AS total_value
    FROM sessions GROUP BY user_id, session_no
    """,
)
def window_session_30m(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user session windows, 30-minute inactivity gap.

    Spark's ``session_window`` (gap-merge semantics: an event at
    exactly prev_ts+gap starts a NEW session) matches the oracle's
    lag/cumsum formulation with ``>= INTERVAL 30 MINUTE``.
    """
    ev = load(spark, sf_dir, "events")
    return (
        ev.groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"), stable_round(F.sum("value"), 2).alias("total_value"))
        .select(
            "user_id", F.col("w.start").alias("session_start"), "n_events", "total_value"
        )
    )


@query(
    "window_rank_lag_gap",
    oracle="""
    SELECT user_id,
           count(*) AS n_events,
           round(avg(gap_us / 1000000.0) + 1e-7, 1) AS avg_gap_sec
    FROM (
        SELECT user_id,
               date_diff('microsecond', lag(ts) OVER (PARTITION BY user_id
                                                      ORDER BY ts, event_id), ts) AS gap_us
        FROM events
    )
    GROUP BY user_id
    HAVING count(*) >= 5
    """,
)
def window_rank_lag_gap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Analytic-window surface (lag + per-group aggregation): average
    inter-event gap per user. avg ignores the first-event NULL gap in
    both engines."""
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.expr("timestampdiff(MICROSECOND, lag_ts, ts)")
    return (
        ev.withColumn("lag_ts", F.lag("ts").over(w))
        .withColumn("gap_us", gap)
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            stable_round(F.avg(F.col("gap_us") / 1000000.0), 1).alias("avg_gap_sec"),
        )
        .filter(F.col("n_events") >= 5)
    )


@query(
    "freshness_last_hours",
    oracle="""
    SELECT event_type, count(*) AS n
    FROM events
    WHERE ts > (SELECT max(ts) FROM events) - INTERVAL 72 HOUR
    GROUP BY event_type
    """,
)
def freshness_last_hours(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P9 — the direct-link freshness/TTL predicate
    (direct_links.py:117-122: last_updated > now - INTERVAL 1 HOUR)
    anchored to max(ts) for determinism."""
    ev = load(spark, sf_dir, "events")
    mx = ev.agg(F.max("ts").alias("max_ts"))
    return (
        ev.join(F.broadcast(mx))
        .filter(F.col("ts") > F.col("max_ts") - F.expr("INTERVAL 72 HOUR"))
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@query(
    "window_moving_avg_7d",
    oracle="""
    WITH daily AS (
        SELECT event_type,
               date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS day_idx,
               count(*) AS n,
               round(sum(value) + 1e-7, 2) AS daily_value
        FROM events GROUP BY 1, 2
    )
    SELECT event_type, CAST(day_idx AS BIGINT) AS day_idx,
           CAST(n AS BIGINT) AS n,
           round(avg(n) OVER w + 1e-7, 4) AS ma7_n,
           round(sum(daily_value) OVER w + 1e-7, 2) AS ma7_value
    FROM daily
    WINDOW w AS (PARTITION BY event_type ORDER BY day_idx
                 RANGE BETWEEN 6 PRECEDING AND CURRENT ROW)
    """,
)
def window_moving_avg_7d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing 7-day moving average per event type — a VALUE-RANGE
    window frame (RANGE BETWEEN 6 PRECEDING on the day index), the
    frame kind the rank/lag query can't exercise: when a type has gap
    days, the frame still spans exactly 7 calendar days, not 7 rows.
    Daily pre-aggregation collapses the event volume map-side first,
    so the window runs over (type × days) rows — at 100 TB the window
    input is calendar-sized, never event-sized. Daily float sums are
    stable_round-ed BEFORE the frame sum so both engines add identical
    doubles."""
    ev = load(spark, sf_dir, "events")
    day_idx = F.datediff(
        F.col("ts").cast("date"), F.lit("2024-01-01").cast("date")
    ).alias("day_idx")
    daily = ev.groupBy("event_type", day_idx).agg(
        F.count(F.lit(1)).alias("n"),
        stable_round(F.sum("value"), 2).alias("daily_value"),
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("day_idx")
        .rangeBetween(-6, Window.currentRow)
    )
    return daily.select(
        "event_type",
        F.col("day_idx").cast("long").alias("day_idx"),
        F.col("n").cast("long").alias("n"),
        stable_round(F.avg("n").over(w), 4).alias("ma7_n"),
        stable_round(F.sum("daily_value").over(w), 2).alias("ma7_value"),
    )


@query(
    "retention_cohorts",
    oracle="""
    WITH w AS (
        SELECT DISTINCT user_id,
               CAST(floor(date_diff('day', DATE '2024-01-01',
                                    CAST(ts AS DATE)) / 7.0) AS BIGINT) AS wk
        FROM events
    ), c AS (
        SELECT user_id, min(wk) AS cohort FROM w GROUP BY 1
    )
    SELECT CAST(c.cohort AS BIGINT) AS cohort_week,
           CAST(w.wk - c.cohort AS BIGINT) AS week_offset,
           CAST(count(*) AS BIGINT) AS n_users
    FROM w JOIN c USING (user_id)
    GROUP BY 1, 2
    """,
)
def retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly retention cohorts: each user joins the cohort of their
    first active week; the matrix counts users from cohort k active
    again at week k+offset — the standard retention triangle. One
    DISTINCT user-week projection (map-side combine collapses the
    event volume), a user-keyed MIN, and a final (cohort, offset)
    hash agg; the join key is user_id throughout, so the exchange is
    reused. Week index = floor(days-since-anchor / 7) — explicit
    floor() in BOTH engines (DuckDB's ``//`` truncates toward zero, so
    a pre-anchor timestamp would diverge: -7 // 2 = -3 but
    floor(-7/2) = -4)."""
    ev = load(spark, sf_dir, "events")
    wk = F.floor(
        F.datediff(F.col("ts").cast("date"), F.lit("2024-01-01").cast("date"))
        / 7
    ).alias("wk")
    w = ev.select("user_id", wk).distinct()
    c = w.groupBy("user_id").agg(F.min("wk").alias("cohort"))
    return (
        w.join(c, "user_id")
        .groupBy(
            F.col("cohort").cast("long").alias("cohort_week"),
            (F.col("wk") - F.col("cohort")).cast("long").alias("week_offset"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n_users"))
    )


def _sessionize(ev: DataFrame) -> DataFrame:
    """Shared session rollup (the window_session_30m shape)."""
    return (
        ev.groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            stable_round(F.sum("value"), 2).alias("total_value"),
        )
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            "n_events",
            "total_value",
        )
    )


@query(
    "incremental_view_sessions",
    oracle="""
    WITH post AS (
        SELECT * FROM events
        WHERE event_id % 7 = 0 OR event_id % 11 <> 0
    ),
    marked AS (
        SELECT user_id, ts, event_id, value,
               CASE WHEN lag(ts) OVER w IS NULL
                         OR ts - lag(ts) OVER w >= INTERVAL 30 MINUTE
                    THEN 1 ELSE 0 END AS new_session
        FROM post
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    sessions AS (
        SELECT user_id, ts, value,
               sum(new_session) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id
                                      ROWS UNBOUNDED PRECEDING) AS session_no
        FROM marked
    )
    SELECT user_id, min(ts) AS session_start, count(*) AS n_events,
           round(sum(value) + 1e-7, 2) AS total_value
    FROM sessions GROUP BY user_id, session_no
    """,
)
def incremental_view_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MAINTAINED sessionization — the windowed-analytics member of the
    incremental_view_* family, on the keyed-slice combinator
    (operators/ivm.maintain_keyed_slices): sessions are a pure per-user
    function of the user's events, so a change window invalidates
    exactly the users it touches; their session sets rebuild from the
    post state while every other user's sessions carry forward
    verbatim. Slice recomputation gets the two genuinely hard session
    mutations for free — an INSERT landing inside a >=30-minute gap
    MERGES two sessions into one, and a DELETE opening a gap SPLITS a
    session — which per-row patching of a session table cannot express.
    The oracle recomputes sessionization from scratch over the post
    state (the window_session_30m lag/cumsum formulation). At 100 TB:
    O(view) anti-join + sessionizing only touched users' events."""
    from ..operators.ivm import maintain_keyed_slices

    ev = load(spark, sf_dir, "events")
    eid = F.col("event_id")
    base = ev.filter(eid % 7 != 0)
    post = ev.filter((eid % 7 == 0) | (eid % 11 != 0))
    inserts = ev.filter(eid % 7 == 0)
    deletes = base.filter(eid % 11 == 0)

    old_view = _sessionize(base)
    touched = inserts.unionByName(deletes).select("user_id").distinct()
    return maintain_keyed_slices(
        old_view,
        touched,
        "user_id",
        lambda t: _sessionize(post.join(t, ["user_id"], "left_semi")),
    )


def _retention_contrib(ev: DataFrame) -> DataFrame:
    """Per-user retention contributions: the user's DISTINCT active
    weeks tagged with their cohort (min week). A pure per-user function
    of the user's own events — exactly the keyed-slice contract."""
    wk = F.floor(
        F.datediff(F.col("ts").cast("date"), F.lit("2024-01-01").cast("date"))
        / 7
    ).alias("wk")
    w = ev.select("user_id", wk).distinct()
    c = w.groupBy("user_id").agg(F.min("wk").alias("cohort"))
    return w.join(c, "user_id").select("user_id", "wk", "cohort")


@query(
    "incremental_view_retention",
    oracle="""
    WITH post AS (
        SELECT * FROM events
        WHERE event_id % 7 = 0 OR event_id % 11 <> 0
    ),
    w AS (
        SELECT DISTINCT user_id,
               CAST(floor(date_diff('day', DATE '2024-01-01',
                                    CAST(ts AS DATE)) / 7.0) AS BIGINT) AS wk
        FROM post
    ), c AS (
        SELECT user_id, min(wk) AS cohort FROM w GROUP BY 1
    )
    SELECT CAST(c.cohort AS BIGINT) AS cohort_week,
           CAST(w.wk - c.cohort AS BIGINT) AS week_offset,
           CAST(count(*) AS BIGINT) AS n_users
    FROM w JOIN c USING (user_id)
    GROUP BY 1, 2
    """,
)
def incremental_view_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MAINTAINED retention triangle — the cohort-analytics member of
    the incremental_view_* family, via the two-level decomposition
    every cross-key aggregate of a per-key function admits: the
    per-user contribution frame (distinct active weeks + cohort tag)
    is a pure per-user function of the user's own events, so it
    maintains on the keyed-slice combinator (untouched users carry
    forward verbatim; touched users' contributions rebuild from the
    post state — a delete that removes a user's FIRST week retags the
    user's whole cohort, which slice recomputation handles by
    construction and per-row patching cannot); the public (cohort,
    offset) matrix is then one distributive hash-agg over the
    maintained frame. Same insert/delete window as the sessions twin;
    the oracle recomputes the triangle from scratch over the post
    state. At 100 TB: the maintained object is O(users·weeks) — far
    smaller than events — and only touched users' event slices are
    re-read."""
    from ..operators.ivm import maintain_keyed_slices

    ev = load(spark, sf_dir, "events")
    eid = F.col("event_id")
    base = ev.filter(eid % 7 != 0)
    post = ev.filter((eid % 7 == 0) | (eid % 11 != 0))
    inserts = ev.filter(eid % 7 == 0)
    deletes = base.filter(eid % 11 == 0)

    old_contrib = _retention_contrib(base)
    touched = inserts.unionByName(deletes).select("user_id").distinct()
    contrib = maintain_keyed_slices(
        old_contrib,
        touched,
        "user_id",
        lambda t: _retention_contrib(post.join(t, ["user_id"], "left_semi")),
    )
    return contrib.groupBy(
        F.col("cohort").cast("long").alias("cohort_week"),
        (F.col("wk") - F.col("cohort")).cast("long").alias("week_offset"),
    ).agg(F.count(F.lit(1)).cast("long").alias("n_users"))
