"""Skew-mitigation under the oracle gate.

AQE's skew-join splitting (on by default in session.py) covers most
sort-merge joins; ``operators.skew.salted_join`` covers the case AQE
can't — hot keys hammering single tasks in a shuffled join, or
streaming epochs where AQE is unavailable. Until now the salt utility
was exercised only by a unit test; this module registers a query whose
PLAN contains the salt fan-out (explode of the dimension across salt
values + the composite (key, salt) join) and whose RESULT hash-matches
a plain-join DuckDB oracle — proving the salting is a pure execution
strategy with zero semantic footprint.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..operators.skew import salted_join
from ..tables import load
from .registry import query, stable_round


@query(
    "skew_salted_hot_join",
    oracle="""
    WITH fact AS (
        SELECT event_id, value,
               CASE WHEN event_type = 'view' THEN 0
                    ELSE user_id % 25 END AS nk
        FROM events
    )
    SELECT n.n_name, CAST(count(*) AS BIGINT) AS n_events,
           round(sum(f.value) + 1e-7, 4) AS total_value
    FROM fact f JOIN nation n ON n.n_nationkey = f.nk
    GROUP BY n.n_name
    """,
)
def skew_salted_hot_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hot-key join through ``salted_join``: all 'view' events (the
    dominant event type) collapse onto nation key 0 — the deliberate
    pathology where a vanilla shuffle join sends one key's entire
    volume to one task. The salt (xxhash64 of the row-unique event_id,
    mod 8) splits the hot key across 8 tasks; the 25-row dimension is
    exploded 8× (200 rows — replication factor × |dim|, trivially
    broadcastable) and the join runs on the composite (nk, _salt) key.
    The oracle is the PLAIN join — salting must be invisible in the
    result. At 100 TB the same shape holds: replication cost scales
    with |dim| × factor, never with the fact table."""
    ev = load(spark, sf_dir, "events")
    fact = ev.select(
        "event_id",
        "value",
        F.when(F.col("event_type") == "view", F.lit(0).cast("long"))
        .otherwise(F.col("user_id") % 25)
        .alias("nk"),
    )
    dim = load(spark, sf_dir, "nation").select(
        F.col("n_nationkey").cast("long").alias("nk"), "n_name"
    )
    joined = salted_join(fact, dim, "nk", salt_col="event_id", factor=8)
    return joined.groupBy("n_name").agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        stable_round(F.sum("value"), 4).alias("total_value"),
    )
