"""Physical-plan assertions: the 100-TB-survival checks.

Each declared query must compile to the plan we designed, not merely
a correct one: filters pushed into the parquet scan, dims broadcast,
columns pruned, top-k as TakeOrdered, no accidental cartesian joins.
"""

from __future__ import annotations

import pytest

from fs_indexer_elasticsearch_spark.plans import QUERIES

SF = "/root/testdata/sf0.001"


def plan_of(spark, name: str) -> str:
    df = QUERIES[name](spark, SF)
    return df._jdf.queryExecution().executedPlan().toString() + "\n" + (
        df._jdf.queryExecution().toString()
    )


def test_q01_scan_pushdown_and_pruning(spark):
    p = plan_of(spark, "q01_pricing_summary")
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in p
    # Column pruning: unused lineitem columns never leave the scan.
    assert "l_orderkey" not in p.split("ReadSchema")[1].split("\n")[0]
    assert "HashAggregate" in p  # partial+final agg, not sort-based


def test_q03_broadcasts_dimension(spark):
    p = plan_of(spark, "q03_top_revenue_orders")
    assert "BroadcastHashJoin" in p
    assert "TakeOrderedAndProject" in p  # top-k, not global sort


def test_q05_star_join_broadcast_only_fact_shuffle(spark):
    p = plan_of(spark, "q05_regional_supplier_volume")
    assert p.count("BroadcastHashJoin") >= 4  # all dims broadcast
    assert "CartesianProduct" not in p


def test_topk_orders_is_take_ordered(spark):
    p = plan_of(spark, "topk_orders")
    assert "TakeOrderedAndProject" in p  # per-partition top-k + merge


def test_rollup_is_linear_no_nested_loop(spark):
    p = plan_of(spark, "rollup_directory_sizes")
    assert "BroadcastNestedLoopJoin" not in p  # the reference's O(n²) shape
    assert "CartesianProduct" not in p
    assert "Generate explode" in p or "Generate" in p  # ancestors explode


def test_scalar_max_is_broadcast_not_collect(spark):
    # The 1-row aggregate joins in as a broadcast, not a driver value.
    p = plan_of(spark, "scalar_max_filter")
    assert "BroadcastNestedLoopJoin" in p or "BroadcastExchange" in p


def test_merge_join_strategy_matches_batch_shape(spark):
    # Two contracts (operators/merge.py upsert_newer_wins): a
    # TABLE-SIZED batch (this query's ~70%-of-orders batch,
    # delta_batch=False) must take the spill-safe SortMergeJoin —
    # ShuffledHashJoin's build side doesn't spill; a DELTA-SIZED batch
    # (delta_batch=True, the SnapshotStore.merge path) must keep the
    # shuffle_hash hint so the current side streams with no sort.
    p = plan_of(spark, "merge_upsert_newer_wins")
    assert "FullOuter" in p
    assert "SortMergeJoin" in p
    assert "ShuffledHashJoin" not in p

    import pyspark.sql.functions as F

    from fs_indexer_elasticsearch_spark.operators.merge import upsert_newer_wins

    cur = spark.range(1000).select(
        F.col("id").alias("k"), F.lit(1).alias("v"), F.lit("a").alias("p")
    )
    delta = spark.range(10).select(
        F.col("id").alias("k"), F.lit(2).alias("v"), F.lit("b").alias("p")
    )
    dp = upsert_newer_wins(cur, delta, key="k", version_col="v")
    splan = dp._jdf.queryExecution().executedPlan().toString()
    assert "ShuffledHashJoin" in splan and "SortMergeJoin" not in splan


def test_anti_and_semi_joins(spark):
    assert "LeftAnti" in plan_of(spark, "anti_join_missing")
    assert "LeftSemi" in plan_of(spark, "semi_join_active")


@pytest.mark.parametrize(
    "name",
    [
        "q01_pricing_summary",
        "q03_top_revenue_orders",
        "q05_regional_supplier_volume",
        "left_join_enrich",
        "rollup_directory_sizes",
        "window_tumbling_10m",
        "dedup_exact",
    ],
)
def test_no_cartesian_anywhere(spark, name):
    assert "CartesianProduct" not in plan_of(spark, name)


def test_asof_join_single_shuffle_no_join(spark):
    # The as-of composition is union + window — there must be NO join
    # operator at all, just one shuffle on the by-key.
    p = plan_of(spark, "asof_click_before_purchase")
    assert "SortMergeJoin" not in p and "BroadcastHashJoin" not in p.split("Window")[0]
    assert "Window" in p


def test_range_join_is_hash_join(spark):
    p = plan_of(spark, "range_join_error_after_purchase")
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p  # the naive inequality plan
    assert "Join" in p  # bucketized equi-join


def test_ivf_centroids_broadcast(spark):
    p = plan_of(spark, "similarity_ivf_topk")
    assert "BroadcastExchange" in p
    assert "CartesianProduct" not in p


def test_q08_all_dims_broadcast(spark):
    p = plan_of(spark, "q08_market_share")
    assert p.count("BroadcastHashJoin") >= 6
    assert "CartesianProduct" not in p


def test_registry_priority_prefix_covers_llm_layer():
    """External verifiers may sample a registry prefix; the dedup /
    similarity / window / as-of / text-analysis layer must land inside
    the first 50 entries, each with an oracle."""
    from fs_indexer_elasticsearch_spark.plans import ORACLES

    names = list(QUERIES.keys())
    first50 = set(names[:50])
    required = {
        "dedup_exact", "dedup_minhash_lsh", "dedup_connected_components",
        "similarity_lsh_ann_topk",
        # The prefix holds EVERY never-driver-checked query and every
        # query whose plan fingerprint changed this round (enforced
        # mechanically by tools/rotation_check.py in the gate), plus
        # one anchor per core family; multi-round driver-green
        # queries rotate below — the driver's hard signal goes to the
        # least-tested first (late r12 rotated window_rank_lag_gap,
        # range_join, pagerank, incremental_agg_maintenance,
        # quantized_ann, char_bigram_nll, curriculum_deciles below
        # the boundary to admit the seven late-r12 newcomers; r13
        # rotated window_session_30m, asof_click_before_purchase,
        # merge_upsert_newer_wins, snapshot_diff_changes,
        # rollup_directory_sizes below to admit the four r13
        # newcomers plus the plan-changed q15_top_suppliers; r14
        # admitted three newcomers + three plan-changed rotations and
        # rebalanced five multi-round-green IVM siblings below the
        # boundary — histogram_chained, joined_dimchange,
        # minmax_chained, summinmax, hll_distinct — so the window /
        # tokenization / packing / skew anchors stay in the prefix;
        # their families remain anchored by histogram, joined, minmax,
        # joined_minmax and cms_topk).
        # r14 (late) newcomers — all never-driver-checked, so the
        # mechanical rule pins them in the prefix; fourteen multi-round
        # driver-green IVM/IVF siblings slid below (families stay
        # anchored by join_membership, histogram, topk, minmax, joined,
        # ann_ivf_maintain_topk and the sketch pair).
        "ann_ivfpq_topk", "ann_ivfpq_recall",
        "graph_label_propagation", "zorder_bloom_lookup",
        "graph_triangle_count", "graph_link_prediction_jaccard",
        "quantized_ann_pq_topk", "ann_pq_recall",
        "zorder_pruned_scan", "zorder_incremental_scan",
        "incremental_view_asof", "incremental_view_sessions",
        "incremental_view_retention", "incremental_view_funnel",
        "incremental_view_sketch_quantiles_hc",
        "incremental_view_bm25_topk",
        "bm25_store_search_topk",
        "dedup_simhash",
        "similarity_ivf_topk",
        "multimodal_pcm_windows",
        "incremental_view_join_membership",
        "decontaminate_bloom",
        "dedup_incremental_cc",
        "incremental_view_joined",
        "dedup_incremental_tombstone",
        "store_read_changes",
        "text_quality_stats",
        "ann_recall_at_k",
        "sequence_packing_stats",
        "skew_salted_hot_join",
        "window_moving_avg_7d",
        # r15 rotation (r14 verdict #10): the five queries whose r14
        # eager-checkpoint flips changed executed-plan topology without
        # changing analyzed plans — rotated in for driver verification.
        # (This set was STALE after the r14 rebalance — nine displaced
        # queries were still listed here, and the resulting red test is
        # what the r14 driver's tests_ok:false tail actually hid; the
        # required set now tracks the committed _PRIORITY prefix.)
        "pagerank_neardup_graph",
        "curation_pipeline_e2e",
        "q21_waiting_suppliers",
        "crossdoc_shingle_boilerplate",
        "substring_dedup_clean",
    }
    assert required <= first50, sorted(required - first50)
    assert len(names) == len(set(names))
    missing_oracles = [n for n in names if n not in ORACLES]
    assert missing_oracles == []


def test_window_moving_avg_range_frame_spans_calendar_days(spark):
    """The RANGE frame must cover 7 calendar DAYS, not 7 rows: with
    gap days, a day's frame includes only days within day_idx-6..day_idx,
    so ma7_n * frame_days == sum of the included daily counts."""
    from tests.conftest import SF_DIR

    rows = QUERIES["window_moving_avg_7d"](spark, SF_DIR).collect()
    assert rows
    daily = {(r.event_type, r.day_idx): r.n for r in rows}
    for r in rows:
        window = [
            daily.get((r.event_type, d))
            for d in range(r.day_idx - 6, r.day_idx + 1)
            if (r.event_type, d) in daily
        ]
        assert window, r
        expect = sum(window) / len(window)
        assert abs(r.ma7_n - expect) < 1e-3, (r, expect)


def test_robust_zscore_runs_arrow_grouped_map(spark):
    """The robust z-score query must execute through the Arrow
    grouped-map operator (FlatMapGroupsInPandas), never row-at-a-time
    Python, and its median property must hold: within each language,
    about half the docs score <= 0."""
    from tests.conftest import SF_DIR

    df = QUERIES["robust_zscore_by_lang"](spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "FlatMapGroupsInPandas" in plan
    assert "BatchEvalPython" not in plan
    rows = df.collect()
    assert rows
    by_lang: dict[str, list] = {}
    for r in rows:
        by_lang.setdefault(r.lang, []).append(r.rz)
    for lang, zs in by_lang.items():
        neg = sum(1 for z in zs if z <= 0)
        assert 0.3 <= neg / len(zs) <= 0.7, (lang, neg, len(zs))


def test_every_oracle_token_split_matches_engine():
    """Every inline token-split fragment in every registered oracle
    must use EXACTLY the engine's TOKEN_PATTERN — the oracle twin of
    functions.text.tokens appears inline in ~20 long oracle strings
    (rewriting them to interpolate a constant would churn hash-gated
    SQL), so this guard pins them mechanically: a tokenizer change
    that misses one copy fails here, not silently at the driver gate."""
    import re

    from fs_indexer_elasticsearch_spark.functions.text import (
        TOKEN_PATTERN,
        TOKS_SQL,
    )
    from fs_indexer_elasticsearch_spark.plans import ORACLES

    assert TOKEN_PATTERN in TOKS_SQL
    # Match qualified columns (lower(d.text)) and stray whitespace too,
    # or a drifted copy in such a fragment escapes the guard (r6 advice).
    pat = re.compile(r"regexp_split_to_array\(\s*lower\(\s*[\w.]+\s*\),\s*'([^']+)'\)")
    seen = 0
    for name, sql in ORACLES.items():
        for m in pat.finditer(sql):
            assert m.group(1) == TOKEN_PATTERN, (
                f"{name}: oracle token split uses {m.group(1)!r}, "
                f"engine tokenizes with {TOKEN_PATTERN!r}"
            )
            seen += 1
    assert seen >= 15  # the fragment really is everywhere
