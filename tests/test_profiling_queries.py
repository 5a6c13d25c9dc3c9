"""Profiling/sketch layer (plans.profiling_queries).

The DuckDB oracle gate is the primary correctness check; this file
covers the sketch-quality properties the hash-compare can't see:
HLL relative error, CMS one-sidedness, and profile-shape sanity.
"""

from __future__ import annotations

from tests.conftest import SF_DIR

from fs_indexer_elasticsearch_spark.plans import ORACLES, QUERIES

NEW = ["column_profile", "approx_distinct_tolerance", "cms_heavy_hitters"]


def test_registered_with_oracles():
    for name in NEW:
        assert name in QUERIES and name in ORACLES


def test_column_profile_shape(spark):
    rows = QUERIES["column_profile"](spark, SF_DIR).collect()
    by_col = {r.column_name: r for r in rows}
    assert set(by_col) == {
        "o_orderkey",
        "o_custkey",
        "o_orderstatus",
        "o_totalprice",
        "o_orderdate",
        "o_orderpriority",
    }
    ok = by_col["o_orderkey"]
    assert ok.n_nulls == 0 and ok.n_distinct > 0
    assert by_col["o_orderstatus"].n_distinct <= 3
    # money renders with exactly two decimals
    assert "." in by_col["o_totalprice"].min_value
    assert len(by_col["o_totalprice"].min_value.rsplit(".", 1)[1]) == 2


def test_approx_distinct_within_tolerance(spark):
    """The within_tol flag IS the gate; re-assert it here so a sketch
    regression fails fast in CI, not only at the oracle compare."""
    rows = QUERIES["approx_distinct_tolerance"](spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert r.n_exact > 0
        assert r.within_tol, f"{r.event_type}: HLL drifted past 3*rsd"


def test_cms_heavy_hitters_one_sided_and_tight(spark):
    rows = QUERIES["cms_heavy_hitters"](spark, SF_DIR).collect()
    assert len(rows) == 20
    total_exact = sum(r.exact_cnt for r in rows)
    assert total_exact > 0
    for r in rows:
        # the CMS guarantee: never underestimates
        assert r.overestimate_ok and r.est_cnt >= r.exact_cnt
        # heavy hitters sit far above the collision noise floor; the
        # estimate should be within 2x for this corpus/width
        assert r.est_cnt <= 2 * r.exact_cnt
