"""Scale-pattern layer (plans.scale_queries).

Oracle gate covers value parity; this file covers the algebraic and
convergence properties the hash can't see.
"""

from __future__ import annotations

import pyspark.sql.functions as F

from tests.conftest import SF_DIR

from fs_indexer_elasticsearch_spark.plans import ORACLES, QUERIES
from fs_indexer_elasticsearch_spark.tables import load

NEW = ["incremental_agg_maintenance", "pagerank_neardup_graph"]


def test_registered_with_oracles():
    for name in NEW:
        assert name in QUERIES and name in ORACLES


def test_incremental_merge_equals_rescan(spark):
    """The algebraic identity directly: merged partials == one-shot
    aggregate over the union, per group."""
    merged = {
        r.event_type: r for r in QUERIES["incremental_agg_maintenance"](spark, SF_DIR).collect()
    }
    full = {
        r.event_type: r
        for r in load(spark, SF_DIR, "events")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value") + F.lit(1e-7), 4).alias("s"),
        )
        .collect()
    }
    assert set(merged) == set(full)
    for et, m in merged.items():
        assert m.n_events == full[et].n
        assert abs(m.total_value - full[et].s) < 1e-6
        assert 0 < m.n_delta < m.n_events


def test_pagerank_top10_properties(spark):
    rows = QUERIES["pagerank_neardup_graph"](spark, SF_DIR).collect()
    assert len(rows) == 10
    ranks = [r.rank for r in rows]
    assert ranks == sorted(ranks, reverse=True)
    # rank mass: every rank positive; the top-10 never exceed the
    # total mass of 1 (at small SFs the graph is all degree-1 twins,
    # so ties across the whole top-10 are legitimate)
    for r in rows:
        assert 0.0 < r.rank < 1.0
    assert sum(ranks) <= 1.0 + 1e-6
