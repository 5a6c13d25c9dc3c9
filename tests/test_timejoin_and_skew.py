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


# ---------------------------------------------------------------------------
# maintain_asof_view (the incremental_view_asof maintainer)
# ---------------------------------------------------------------------------


def _asof_from_scratch(spark, left, right):
    from fs_indexer_elasticsearch_spark.operators.timejoin import asof_join

    return asof_join(left, right, on="t", by="u", value_cols=["px"])


def test_maintain_asof_delete_rematch(spark):
    """The hard case: deleting the matched right row must RE-MATCH the
    left row to the next-earlier right row (or NULL), which per-row
    incremental algebra can't do — slice recomputation must."""
    from fs_indexer_elasticsearch_spark.operators.timejoin import (
        asof_join,
        maintain_asof_view,
    )

    right0 = spark.createDataFrame(
        [(1, 10, 100.0), (1, 20, 200.0), (2, 10, 900.0)], "u long, t long, px double"
    )
    left = spark.createDataFrame([(1, 25, "a"), (2, 25, "b")], "u long, t long, tag string")
    view0 = asof_join(left, right0, on="t", by="u", value_cols=["px"])
    assert {(r.u, r.right_px) for r in view0.collect()} == {(1, 200.0), (2, 900.0)}

    # delete user 1's t=20 row -> its left row must fall back to t=10
    right1 = right0.filter(~((F.col("u") == 1) & (F.col("t") == 20)))
    touched = spark.createDataFrame([(1,)], "u long")
    view1 = maintain_asof_view(
        view0, left, right1, touched, on="t", by="u", value_cols=["px"]
    )
    got = {(r.u, r.right_px) for r in view1.collect()}
    assert got == {(1, 100.0), (2, 900.0)}
    # untouched user 2's row carried forward verbatim (not recomputed)
    assert view1.filter(F.col("u") == 2).count() == 1


def test_maintain_asof_equals_full_recompute_random_masks(spark):
    """Property: for several insert/delete masks, maintained view ==
    from-scratch as-of over the post state (row-level comparison)."""
    import random

    from fs_indexer_elasticsearch_spark.operators.timejoin import maintain_asof_view

    rng = random.Random(7)
    rows_l = [(rng.randrange(6), i, f"l{i}") for i in range(60)]
    rows_r = [(rng.randrange(6), rng.randrange(100), float(i)) for i in range(80)]
    left_all = spark.createDataFrame(rows_l, "u long, t long, tag string")
    right_all = (
        spark.createDataFrame(rows_r, "u long, t long, px double")
        .groupBy("u", "t")
        .agg(F.max("px").alias("px"))
    )
    for mod_ins, mod_del in [(3, 4), (5, 2), (2, 7)]:
        lbase = left_all.filter(F.col("t") % mod_ins != 0)
        rbase = right_all.filter(F.col("t") % mod_ins != 0)
        lpost = left_all.filter((F.col("t") % mod_ins == 0) | (F.col("t") % mod_del != 0))
        rpost = right_all.filter((F.col("t") % mod_ins == 0) | (F.col("t") % mod_del != 0))
        view0 = _asof_from_scratch(spark, lbase, rbase)
        # touched = every key in either side's symmetric difference
        touched = (
            lbase.select("u").subtract(lpost.select("u"))
            .union(lpost.select("u"))
            .union(rbase.select("u"))
            .union(rpost.select("u"))
            .distinct()
        )
        # (coarse over-approximation is always SOUND; tightness is a
        # perf concern, exactness is what this asserts)
        maintained = maintain_asof_view(
            view0, lpost, rpost, touched, on="t", by="u", value_cols=["px"]
        )
        want = sorted(
            (r.u, r.t, r.tag, r.right_px)
            for r in _asof_from_scratch(spark, lpost, rpost).collect()
        )
        got = sorted((r.u, r.t, r.tag, r.right_px) for r in maintained.collect())
        assert got == want, (mod_ins, mod_del)
