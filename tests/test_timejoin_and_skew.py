"""As-of/range join operators + salted-join skew utility."""

from __future__ import annotations

import pyspark.sql.functions as F

from fs_indexer_elasticsearch_spark.operators.skew import salted_join
from fs_indexer_elasticsearch_spark.operators.timejoin import asof_join, range_join


def test_asof_backward_and_forward(spark):
    quotes = spark.createDataFrame(
        [("A", 1.0, 10.0), ("A", 5.0, 11.0), ("B", 2.0, 20.0)],
        "sym string, t double, px double",
    ).select("sym", F.col("t").cast("timestamp").alias("t"), "px")
    trades = spark.createDataFrame(
        [("A", 0.5), ("A", 1.0), ("A", 6.0), ("B", 1.0)],
        "sym string, t double",
    ).select("sym", F.col("t").cast("timestamp").alias("t"))

    back = asof_join(trades, quotes, on="t", by="sym", value_cols=["px"])
    got = {(r.sym, r.t.timestamp()): r.right_px for r in back.collect()}
    assert got[("A", 0.5)] is None        # before first quote
    assert got[("A", 1.0)] == 10.0        # exact tie matches
    assert got[("A", 6.0)] == 11.0        # most recent carried
    assert got[("B", 1.0)] is None

    fwd = asof_join(trades, quotes, on="t", by="sym", value_cols=["px"],
                    direction="forward")
    gotf = {(r.sym, r.t.timestamp()): r.right_px for r in fwd.collect()}
    assert gotf[("A", 0.5)] == 10.0
    assert gotf[("A", 6.0)] is None       # nothing after
    assert gotf[("B", 1.0)] == 20.0


def test_range_join_bounds(spark):
    left = spark.createDataFrame(
        [(1, "u", 100.0), (2, "u", 1000.0)], "p_event long, user string, p_t double"
    ).select("p_event", "user", F.col("p_t").cast("timestamp").alias("p_t"))
    right = spark.createDataFrame(
        [(10, "u", 100.0), (11, "u", 150.0), (12, "u", 700.0), (13, "u", 1600.5),
         (14, "v", 120.0)],
        "e_event long, user string, e_t double",
    ).select("e_event", "user", F.col("e_t").cast("timestamp").alias("e_t"))

    out = range_join(left, right, left_time="p_t", right_time="e_t",
                     by="user", max_gap_seconds=600)
    pairs = {(r.p_event, r.e_event) for r in out.collect()}
    # p1@100: e11@150 (+50s), e12@700 (+600s inclusive); NOT e10 (same
    # instant, gap must be > 0), NOT e14 (other user).
    # p2@1000: e13@1600.5 (+600.5s exclusive) must NOT match.
    assert pairs == {(1, 11), (1, 12)}


def test_salted_join_matches_plain_join(spark):
    # One hot key dominating, correctness must be unchanged by salting.
    skewed = spark.createDataFrame(
        [(i, "hot" if i % 10 else f"cold{i}") for i in range(1000)],
        "row_id long, k string",
    )
    dim = spark.createDataFrame(
        [("hot", "H")] + [(f"cold{i}", f"C{i}") for i in range(0, 1000, 10)],
        "k string, v string",
    )
    plain = skewed.join(dim, "k").select("row_id", "v")
    salted = salted_join(skewed, dim, "k", salt_col="row_id", factor=8).select(
        "row_id", "v"
    )
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))
    # The salted plan spreads the hot key across `factor` join keys.
    p = salted._jdf.queryExecution().executedPlan().toString()
    assert "_salt" in p


def test_skew_salted_hot_join_query(spark):
    """The registered skew query equals its unsalted twin row-for-row,
    and its physical plan carries the salt fan-out (explode of the
    dimension across salt values)."""
    from tests.conftest import SF_DIR

    from fs_indexer_elasticsearch_spark.plans import QUERIES
    from fs_indexer_elasticsearch_spark.tables import load

    out = QUERIES["skew_salted_hot_join"](spark, SF_DIR)
    ev = load(spark, SF_DIR, "events")
    fact = ev.select(
        "value",
        F.when(F.col("event_type") == "view", F.lit(0).cast("long"))
        .otherwise(F.col("user_id") % 25)
        .alias("nk"),
    )
    dim = load(spark, SF_DIR, "nation").select(
        F.col("n_nationkey").cast("long").alias("nk"), "n_name"
    )
    plain = (
        fact.join(dim, "nk")
        .groupBy("n_name")
        .agg(F.count(F.lit(1)).cast("long").alias("n_events"))
    )
    got = {(r.n_name, r.n_events) for r in out.collect()}
    want = {(r.n_name, r.n_events) for r in plain.collect()}
    assert {(n, c) for n, c in got} == want
    p = out._jdf.queryExecution().executedPlan().toString()
    assert "_salt" in p and ("Explode" in p or "explode" in p)


def test_funnel_is_monotone(spark):
    """Each funnel step is a strict refinement of the previous one —
    counts can only shrink; conversion is a valid ratio."""
    from fs_indexer_elasticsearch_spark.plans import QUERIES

    r = QUERIES["funnel_view_click_purchase"](
        spark, "/root/testdata/sf0.001"
    ).collect()[0]
    assert r.n_viewed >= r.n_clicked >= r.n_purchased > 0
    assert 0 < r.conversion <= 1.0 + 1e-9


def test_retention_cohorts_triangle(spark):
    """Retention counts never exceed the cohort's week-0 size, and
    week 0 contains every cohort member by construction."""
    from fs_indexer_elasticsearch_spark.plans import QUERIES

    rows = QUERIES["retention_cohorts"](spark, "/root/testdata/sf0.001").collect()
    assert rows
    base = {r.cohort_week: r.n_users for r in rows if r.week_offset == 0}
    for r in rows:
        assert r.week_offset >= 0
        assert r.cohort_week in base
        assert r.n_users <= base[r.cohort_week]


def test_salted_join_rejects_outer_types(spark):
    """The replicated side exists `factor` times, so right/full outer
    would emit `factor` null-extended copies of every unmatched other
    row — salted_join must refuse rather than return wrong counts."""
    import pytest

    from fs_indexer_elasticsearch_spark.operators.skew import salted_join

    a = spark.createDataFrame([(1, "x")], "k long, v string")
    b = spark.createDataFrame([(2, "y")], "k long, w string")
    for how in ("right", "full", "outer", "full_outer", "rightouter"):
        with pytest.raises(ValueError, match="does not support"):
            salted_join(a, b, "k", salt_col="v", factor=4, how=how)
    # left join: the one unmatched OTHER row must NOT appear, and the
    # unmatched skewed row appears exactly once.
    out = salted_join(a, b, "k", salt_col="v", factor=4, how="left").collect()
    assert len(out) == 1 and out[0].k == 1 and out[0].w is None


def test_asof_join_carries_matched_row_atomically(spark):
    """A matched right row with a NULL value column must arrive
    verbatim (ASOF LEFT JOIN semantics) — per-column ignorenulls fill
    tore rows, pairing the newest row's non-null columns with OLDER
    rows' values for its null columns (a franken-row no input had)."""
    from fs_indexer_elasticsearch_spark.operators.timejoin import asof_join

    left = spark.createDataFrame([(1, 11)], "user long, t long")
    right = spark.createDataFrame(
        [(1, 1, 2, 7.0), (1, 10, 5, None)],
        "user long, t long, ev long, val double",
    )
    got = asof_join(
        left, right, on="t", by="user", value_cols=["ev", "val"]
    ).collect()
    assert len(got) == 1
    # The match at t=10 carries (ev=5, val=NULL) — NOT val=7.0 from t=1.
    assert got[0].right_ev == 5 and got[0].right_val is None
    # And a left row before any right row gets all-NULL attributes.
    early = spark.createDataFrame([(1, 0)], "user long, t long")
    g2 = asof_join(
        early, right, on="t", by="user", value_cols=["ev", "val"]
    ).collect()
    assert g2[0].right_ev is None and g2[0].right_val is None
