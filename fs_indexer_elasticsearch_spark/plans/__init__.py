"""Declared query library: import all query modules to populate the
registry, then expose QUERIES / ORACLES."""

from .registry import ORACLES, QUERIES, query  # noqa: F401

# Import order is load order in the registry; keep stable.
from . import relational  # noqa: E402,F401
from . import relational_ext  # noqa: E402,F401
from . import relational_ext2  # noqa: E402,F401
from . import relational_ext3  # noqa: E402,F401
from . import relational_ext4  # noqa: E402,F401
from . import pipeline_queries  # noqa: E402,F401
from . import window_queries  # noqa: E402,F401
from . import llm_queries  # noqa: E402,F401
from . import llm_pipeline2  # noqa: E402,F401
from . import llm_pipeline3  # noqa: E402,F401
from . import llm_pipeline4  # noqa: E402,F401
from . import llm_pipeline5  # noqa: E402,F401
from . import llm_pipeline6  # noqa: E402,F401
from . import profiling_queries  # noqa: E402,F401
from . import scale_queries  # noqa: E402,F401
from . import misc_queries  # noqa: E402,F401
from . import olap_queries  # noqa: E402,F401
from . import timejoin_queries  # noqa: E402,F401
from . import sql_surface  # noqa: E402,F401
from . import skew_queries  # noqa: E402,F401
from . import arrow_surface  # noqa: E402,F401
from . import domain_queries  # noqa: E402,F401
from . import curation_pipeline  # noqa: E402,F401
from . import graph_queries  # noqa: E402,F401
from . import layout_queries  # noqa: E402,F401

# Assembled below: the 50-query driver prefix. Priority = never-driver-
# checked first (the newest queries are the least battle-tested), then
# one anchor per SURVEY.md §2 family.

# Registry priority order. External verifiers may sample a prefix of the
# registry, so the queries exercising the widest operator surface — the
# dedup / similarity / window / as-of / text-analysis layer plus one
# representative per SURVEY.md §2 family — register first. The remaining
# TPC-H adaptations re-exercise join/agg machinery already covered above.
#
# The rotation is MECHANICAL, not a judgment call: the prefix must
# contain every query whose normalized analyzed-plan fingerprint is
# new or changed since the last driver round commit
# (PLAN_FINGERPRINTS.json, diffed by tools/rotation_check.py, which
# gate.py runs and fails on). r12's set: 14 new queries — the early
# seven (holistic-histogram IVM pair, IVF cold-cell merge gate, top-k
# view, moment view, joined histogram, HLL dual) and the late seven
# (join-membership partition pair, rollup cascade, bloom
# decontamination, incremental connected components, maintained CMS,
# maintained stratified sample). Runtime-only r12 changes
# (full-coverage legacy-layout gcd, v0-pinned hot-cell split reads,
# streaming self-heal + deterministic batch dedup, the streaming
# histogram/partition maintainers) leave registered plans untouched
# and are pytest-verified. Displaced below the boundary this round:
# store_read_changes_hardlink, dedup_simhash,
# ann_neardup_recall_multiprobe, dedup_incremental_rebucket,
# ann_incremental_ivf_manifest, incremental_view_maintenance,
# bm25_search_topk, and (late) window_rank_lag_gap,
# range_join_error_after_purchase, pagerank_neardup_graph,
# incremental_agg_maintenance, quantized_ann_int8_topk,
# char_bigram_nll, curriculum_quality_deciles, length_percentile_band,
# binary_payload_meta (multimodal anchored by frame_sample + wav_stats)
# (all driver-green for multiple rounds, plans unchanged, families
# still anchored in the prefix).
#
# r13's set: 4 new queries (windowed PCM features, 16-bit stereo WAV,
# dyadic rank sketch, composed IVF maintenance policy) plus
# q15_top_suppliers rotated back in (scalar-max plan changed per r12
# verdict #5); the other r13 plan changes (pointer-doubled CC in
# dedup_connected_components + dedup_incremental_cc, bloom word-
# packing in decontaminate_bloom) sit inside the prefix already.
# Displaced below the boundary: window_session_30m,
# asof_click_before_purchase, merge_upsert_newer_wins,
# snapshot_diff_changes, rollup_directory_sizes (all multi-round
# driver-green, plans unchanged; their operator families stay
# anchored by window_tumbling_10m/window_moving_avg_7d, the
# range/as-of pair in timejoin tests, store_read_changes, and the
# incremental-CC/merge machinery in the prefix).
#
# r14's set: 2 new queries (distributed per-stratum quantile serving,
# incremental BM25) + 3 plan-changed rotations (dedup_simhash's
# single-int band key; similarity_ivf_topk / ann_recall_at_k riding
# assign_cells' n_keep=1 argmin fast path); the sketch pair's shared
# executor-side serve also changed plans but already sits in the
# prefix. Five multi-round driver-green queries slide below the
# boundary by order; every family keeps a prefix anchor.
_PRIORITY = [
    # New in r14 (late) — IVF-PQ (IVFADC): coarse inverted-file pruning
    # + product quantization on RESIDUALS + per-(query, probed-cell)
    # ADC LUTs + exact float rerank — the composed cascade a 100 TB ANN
    # deployment runs; and its measured recall gate vs exact float-L2
    # truth (bounded above by the coarse quantizer, by design).
    "ann_ivfpq_topk",
    "ann_ivfpq_recall",
    # New in r14 (late) — deterministic synchronous label propagation
    # (4 unrolled rounds, ties to the smallest label): communities
    # FINER than connected components over the same near-dup graph —
    # the exemplar-per-duplicate-pile granularity.
    "graph_label_propagation",
    # New in r14 (late) — Bloom file-skipping sidecar on the Z-ordered
    # layout: point lookups on a NON-curve column open only the cells
    # whose per-cell filter claims the key (the third physical-design
    # axis: hash buckets / zone maps / bloom point-in-set).
    "zorder_bloom_lookup",
    # New in r14 (late) — exact per-node triangle participation over
    # the near-dup graph (clique-vs-hub dedup signal; two keyed
    # self-joins on the canonical low→high edge list, O(Σ deg²) wedge
    # rows, nothing quadratic in |V|).
    "graph_triangle_count",
    # ... and neighborhood-Jaccard link prediction (the LSH recall
    # repair: unlinked pairs sharing most of their near-dup
    # neighborhoods), on the same wedge frame.
    "graph_link_prediction_jaccard",
    # New in r14 (late) — product-quantization ANN (ADC serving):
    # deterministic 8x16 codebooks, keyed encode/LUT/serve joins only
    # (no broadcast-NLJ), recall gated in tests against the float
    # brute-force ground truth.
    "quantized_ann_pq_topk",
    # ... and its measured-quality gate (recall@3 vs exact float-L2
    # truth, the ann_recall_at_k discipline on the quantized path).
    "ann_pq_recall",
    # New in r14 (late) — Z-order clustered layout + zone-map pruned
    # rectangle scan (the multi-dimensional range complement of the
    # store's hash-bucket pruning; oracle scans the raw table, tests
    # assert the pruning ratio and property-check soundness).
    "zorder_pruned_scan",
    # ... and its MAINTAINED form: base write + idempotent appended
    # delta with zone-map widening, same rectangle, oracle = raw-table
    # recompute.
    "zorder_incremental_scan",
    # New in r14 (late) — maintained as-of join view (delta-bound key
    # recompute incl. delete-induced re-matching; oracle = DuckDB
    # native ASOF LEFT JOIN over the post state).
    "incremental_view_asof",
    # New in r14 (late) — maintained sessionization on the same keyed-
    # slice combinator (gap-insert session MERGES and delete SPLITS
    # fall out of slice recomputation; oracle = from-scratch
    # lag/cumsum sessionization over the post state).
    "incremental_view_sessions",
    # ... and the maintained RETENTION triangle: per-user contribution
    # frame on the keyed-slice combinator (a deleted first week retags
    # the user's cohort via slice recompute), distributive re-agg on top.
    "incremental_view_retention",
    # ... and maintained ORDERED-funnel state (per-user step times on
    # the same combinator — a deleted first view cascades through
    # t2/t3, which slice recompute handles by construction).
    "incremental_view_funnel",
    # New in r14 — distributed per-stratum quantile serving off the
    # grouped dyadic rank sketch (~1,200 strata; the binary-search
    # descent runs as `levels` chained DataFrame rounds over all
    # strata at once, nothing collected to the driver; the oracle
    # unrolls the same twelve rounds as chained CTEs).
    "incremental_view_sketch_quantiles_hc",
    # New in r14 — incremental BM25: maintained query-term postings +
    # turnstile corpus normalizer, top-k served from state, oracle =
    # from-scratch recompute over the post-state corpus.
    "incremental_view_bm25_topk",
    # ... and its OPEN-VOCABULARY dual: the persisted term-bucketed
    # postings index (inverted-index shard layout; arbitrary queries
    # read |terms| buckets; tombstone deletions adjust the turnstile
    # normalizer via the doc-keyed length sidecar in O(removal)).
    "bm25_store_search_topk",
    # Rotated into the prefix for the r15 OPTIMIZATION round (r14
    # verdict #10): the five queries whose r14 eager-checkpoint flips
    # changed executed-plan topology WITHOUT changing analyzed plans —
    # the hole the plan-only rotation rule could not see (fingerprints
    # now carry a checkpoint-topology component so this class rotates
    # mechanically from r16 on). All five also ride this round's
    # ckpt_shared policy conversion.
    "pagerank_neardup_graph",
    "curation_pipeline_e2e",
    "q21_waiting_suppliers",
    "crossdoc_shingle_boilerplate",
    "substring_dedup_clean",
    # Rotated into the prefix for the r14 OPTIMIZATION round (plans
    # changed, mechanical rule): the embeddings-family scan now
    # round-robin spreads past the single-file parquet scan before the
    # per-row fold work (spread_small — no-op on wide real scans), the
    # recall gates checkpoint their ground truth EAGERLY instead of
    # recomputing it per consumer, and dedup_embedding_cosine /
    # the k-means family inherit the spread through their shared
    # augmented/fitted frames.
    "similarity_bruteforce_topk",
    "dedup_embedding_cosine",
    "quantized_ann_int8_topk",
    "semantic_dedup_clusters",
    "embedding_outliers",
    "kmeans_cluster_profile",
    "ann_neardup_recall_lsh",
    "ann_neardup_recall_multiprobe",
    # ... and the minhash/ngram operators' shared frames moved from
    # cache() to eager checkpoints (cache let the self-join legs race
    # and leaked reuse across warm runs): the two callers not already
    # behind their own checkpoint rotate in.
    "dedup_cascade_attrition",
    "ngram_jaccard_pairs",
    # Rotated into the prefix for r14 (plans changed, mechanical rule):
    # dedup_simhash — single-int band key (band<<16 | value) self-join;
    # similarity_ivf_topk / ann_recall_at_k — assign_cells' n_keep=1
    # argmin fast path (array_min instead of full-array sort) sits on
    # their one-shot assignment path. (The sketch pair's serve refactor
    # also changed plans; both already live in the prefix.)
    "dedup_simhash",
    "similarity_ivf_topk",
    "ann_recall_at_k",
    # New in r13 — the windowed-PCM feature extraction over the
    # DECODED audio stream (real RIFF parse -> per-sample explode ->
    # per-window energy/RMS/zero-crossings; the frame-the-waveform
    # shape of a speech pipeline, oracle-reproduced from the
    # closed-form sample function over exploded windows) and the
    # 16-bit STEREO decode gate (signed little-endian samples,
    # frame-vs-interleaved-sample accounting, channel interleave
    # proven byte-exact by the raw-PCM md5).
    "multimodal_pcm_windows",
    # ... and the maintained dyadic count-min RANK sketch: the
    # turnstile quantile complement (one CMS per dyadic level;
    # rank(x) = sum of min-over-depth reads along [0,x)'s <=levels
    # nodes) — deletes subtract exactly, state O(levels*depth*width),
    # the one-sided rank guarantee pinned as a gated column.
    # ... and its GROUPED form: one independent sketch per stratum
    # (the per-language length-quantile shape curation caps need),
    # maintained by the same single signed aggregation.
    # ... and the composed IVF maintenance policy (split-until-quiesce
    # + hysteresis cold merge in ONE maintain_cells invocation — the
    # call the streaming growth-hint/cadence triggers fire), proven
    # content-preserving by an all-cells probe vs brute force.
    # Rotated into the prefix for r13: q15's scalar max moved from an
    # unpartitioned window to a 1-row aggregate + keyless broadcast
    # join (r12 verdict #5) — plan changed, so the driver re-verifies.
    # New in r12 (late additions) — the join-membership (semi/anti
    # partition) maintenance pair: every fact row tagged with live dim
    # membership, dim-key appearance/disappearance flipping flags on
    # rows the view already owns (zero fact rescans), and the chained
    # form where window 2 consumes window 1's output across dedicated
    # three-version fact/dim stores (delete-then-reinsert keys on both
    # sides make the feedback loop unfakeable).
    "incremental_view_join_membership",
    # ... and the day->month rollup cascade: the coarse level is
    # maintained from the fine level's delta (feed aggregated once,
    # O(changed days) per coarser level, zero base rescans) — the
    # composition law N-level rollup trees need at 100 TB.
    # ... and the broadcast-bloom decontamination pre-filter: eval
    # vocabulary -> 512 KiB bitmap broadcast, train shingles screened
    # map-side before the exact confirm join (result exact; the
    # petabyte-shuffle killer for train >> eval).
    "decontaminate_bloom",
    # ... and incremental connected components: the near-dup cluster
    # labeling maintained through edge adds (cluster-grain merge
    # contraction, O(feed)) and edge deletes (affected-component
    # subgraph recompute) — the graph is maintained, not rebuilt.
    "dedup_incremental_cc",
    # ... and the maintained count-min sketch: the turnstile
    # (delete-capable) sketch dual of the HLL view — O(depth x width)
    # state, removals subtract exactly, maintained cells bit-equal a
    # from-scratch rebuild.
    # ... and the maintained deterministic stratified sample: top-k
    # per stratum by md5 rank through churn — the stable held-out
    # subset a training pipeline pins, O(feed) per cycle.
    # ... and the three-table joined view: orders x customer x nation
    # maintained through ALL THREE feeds by the telescoping
    # decomposition dF*C1*N1 + F2*dC*N1 + F2*C2*dN, every term
    # changed-key-pruned — the n-table snowflake ladder.
    # ... and the audio arm of the multimodal family: a genuine
    # hermetic RIFF/PCM parse (decode_wav) under the oracle gate —
    # sample sum / peak / duration / raw-PCM md5 reproduced from the
    # closed-form sample function.
    # ... and the last composition-matrix cell: joined TOP-K — the
    # k-deep extremum over fact⋈dim through both feeds (horizon rule
    # + dim-move candidates, deduped against the feed's own images).
    # New in r12 — never driver-checked: the HOLISTIC-aggregate IVM
    # (exact COUNT(DISTINCT)/MEDIAN/MODE through the maintained
    # per-(group, value) histogram — delete-capable where sketches
    # are not) and its chained steady-state form across the bucket
    # evolution store; the IVF cold-cell merge content gate (the
    # split's inverse — bounded centroid state under churn); the
    # top-k view (horizon-ruled k-deep extrema); and the moment view
    # (mean/variance over decimal(38,0) accumulators — a long sum of
    # squares wraps silently at scale); and the joined histogram
    # (holistic stats over fact⋈dim through BOTH feeds — bins compose
    # with the two-term decomposition, no recompute branch); and the
    # HLL sketch dual for insert-only near-unique distinct counts
    # (union == from-scratch; delete-bearing windows refused loudly)
    # New in r11 — one driver round old: the composed IVM algebras
    # (extremum measures over a joined view, both stores changing),
    # the NULL-group joined view (r10 verdict #4/#5), the combined
    # sum+min/max view the streaming maintainer publishes, and the
    # IVF hot-cell split content gate (r10 verdict #6/#7)
    # New in r10 — one driver round old (changing-dim joined IVM +
    # its chained steady-state form; the mass-delete high-cardinality
    # min/max IVM / SCALE_STRESS probe)
    # Changed in r10 — plan fingerprints flipped (PLAN_FINGERPRINTS
    # diff vs the r9 base, tools/rotation_check.py): the min/max IVM
    # recompute became a broadcast semi-join; frame sampling became a
    # real container demux with new gated columns
    # r9 prefix carried forward
    "incremental_view_joined",
    "store_read_changes",
    # New in r8 — two driver rounds old. Displaced below the boundary
    # this round to make room for the r10 newcomers:
    # decontaminate_clean, store_point_lookup,
    # substring_incremental_tombstone (all unchanged since r8,
    # driver-green twice, families still anchored in the prefix).
    "dedup_incremental_tombstone",
    # Dedup / similarity core + quality gates
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_connected_components",
    "similarity_lsh_ann_topk",
    # Text analysis / profiling
    "text_quality_stats",
    # Corpus curation / analytics layer (r5; first driver rows)
    # Training-export layer (r6): packing, sharding, curriculum,
    # context sizing, sampling
    "sequence_packing_stats",
    # Skew demonstration (r6)
    "skew_salted_hot_join",
    # Event-time windows and temporal joins (+ r6 range-frame MA) —
    # window_moving_avg_7d is the family's prefix anchor
    "window_moving_avg_7d",
    "incremental_curation_cycle",
    "multimodal_frame_sample",
    # Evicted from the prefix by the r14 optimization round's eight
    # rotations (plans unchanged since their last driver green;
    # families stay anchored: wav_stats16/pcm_windows/frame_sample for
    # multimodal, joined/join_membership/sketch pair for IVM,
    # text_quality_stats + sequence_packing_stats for text analytics,
    # dedup_exact/minhash/CC for dedup):
    "multimodal_wav_stats",
    "incremental_view_histogram",
    "incremental_view_topk",
    "incremental_view_minmax",
    "vocab_concentration",
    "token_budget_mixture",
    "collocations_pmi",
    "dedup_keep_best",
    # Rebalanced below the boundary for the r14-late admissions
    # (IVF-PQ pair, label propagation, bloom lookup, retention +
    # the earlier nine r14-late newcomers): fourteen multi-round
    # driver-green IVM/IVF siblings slide below by order; their
    # families stay anchored in the prefix by join_membership,
    # histogram, topk, minmax, joined, ann_ivf_maintain_topk and
    # the sketch pair.
    "incremental_view_join_membership_chained",
    "incremental_view_rollup_cascade",
    "incremental_view_cms_topk",
    "incremental_view_sample",
    "incremental_view_joined3",
    "incremental_view_joined_topk",
    "ann_ivf_coldmerge_topk",
    "incremental_view_moments",
    "incremental_view_joined_histogram",
    "incremental_view_joined_minmax",
    "incremental_view_joined_nullgroup",
    "ann_ivf_split_topk",
    "incremental_view_joined_chained",
    "incremental_view_minmax_hicard",
    # Displaced below the boundary by the r14 rebalance (the six
    # r14 prefix entries would otherwise have evicted the window /
    # tokenization / packing / skew family anchors entirely): five
    # multi-round driver-green IVM siblings whose families stay
    # anchored by histogram / joined / minmax / joined_minmax /
    # cms_topk in the prefix.
    "incremental_view_histogram_chained",
    "incremental_view_joined_dimchange",
    "incremental_view_minmax_chained",
    "incremental_view_summinmax",
    "incremental_view_hll_distinct",
    # Displaced to the boundary by the r13 grouped-sketch newcomer:
    # shard_balance_audit (packing family stays anchored by
    # sequence_packing_stats + token_budget_mixture above).
    "shard_balance_audit",
    "window_session_30m",
    "asof_click_before_purchase",
    # Flagship merge / diff / rollup — must stay inside any first-50
    # prefix sample.
    "merge_upsert_newer_wins",
    "snapshot_diff_changes",
    "rollup_directory_sizes",
    # --- 50-query prefix boundary (driver samples a prefix; everything
    # above is new/changed in r12 (mechanically verified:
    # tools/rotation_check.py diffs PLAN_FINGERPRINTS.json against the
    # last driver round), recent, or anchors a §2 family; everything
    # below is driver-green from an earlier round and stays green
    # under the local replica gate) ---
    # Displaced below the boundary by the r15 rotation (all driver-
    # green in r14, plans unchanged this round; families stay
    # anchored above: sketch_quantiles_hc for the dyadic sketch,
    # pcm_windows for multimodal decode, the IVF-PQ pair +
    # similarity_ivf_topk for IVF maintenance, q21_waiting_suppliers
    # for TPC-H relational):
    "multimodal_wav_stats16",
    "incremental_view_quantile_sketch",
    "incremental_view_quantile_sketch_grouped",
    "ann_ivf_maintain_topk",
    "q15_top_suppliers",
    # Rotated below late in r12 to make room for the 8 late-r12
    # newcomers (all driver-green multiple rounds, plans unchanged;
    # families still anchored above: window_session_30m + window_moving_avg_7d for windows,
    # asof_click_before_purchase for temporal joins, the 15-query IVM
    # block for maintenance, dedup_incremental_cc + dedup_exact/
    # minhash/cc for graph dedup, ann_recall_at_k + the split/
    # coldmerge content gates for ANN, text_quality_stats +
    # vocab_concentration + collocations_pmi for text,
    # sequence_packing_stats + shard_balance_audit for export):
    "window_rank_lag_gap",
    "range_join_error_after_purchase",
    "length_percentile_band",
    "binary_payload_meta",
    "robust_zscore_by_lang",
    "incremental_agg_maintenance",
    "char_bigram_nll",
    "curriculum_quality_deciles",
    # Rotated below in r12 (driver-green r9-r11, plans unchanged in
    # r12; families still anchored above: store_read_changes for the
    # feed, dedup_exact/minhash/cc for dedup, ann_recall_at_k +
    # quantized_ann for recall):
    "store_read_changes_hardlink",
    "dedup_incremental_rebucket",
    "ann_incremental_ivf_manifest",
    "incremental_view_maintenance",
    "bm25_search_topk",
    # Rotated below in r11 (driver-green r9+r10, plans unchanged in
    # r11, families still anchored above: frame_sample/ binary_payload
    # for multimodal, store_read_changes+hardlink for the feed,
    # recall_multiprobe+ann_recall_at_k for recall,
    # incremental_curation_cycle for curation):
    "multimodal_ppm_decode",
    "store_read_changes_rebucket",
    "decontaminate_clean",
    "store_point_lookup",
    "substring_incremental_tombstone",
    "per_domain_cap",
    "quality_classifier_score",
    "minhash_estimate_quality",
    "dedup_incremental_batch",
    "substring_dup_incremental",
    "substring_dup_spans",
    "dedup_incremental_batch_manifest",
    "ann_incremental_ivf_topk",
    "q01_pricing_summary",
    "retention_cohorts",
    "funnel_view_click_purchase",
    "token_count_exact",
    "url_canonical_dedup",
    "domain_extract_counts",
    "domain_blocklist_filter",
    "gopher_quality_flags",
    "column_profile",
    "token_count_histogram",
    "approx_distinct_tolerance",
    "cms_heavy_hitters",
    "weighted_sample_stats",
    "length_percentile_band_approx",
    "template_prefix_by_source",
    "chunk_documents",
    "context_truncation_loss",
    "mixture_temperature_weights",
    "tfidf_top_terms",
    "dataset_split_summary",
    "stratified_sample_per_lang",
    "split_contamination_ngrams",
    "pii_detection",
    "boilerplate_repetition",
    "bpe_token_estimate",
    "binary_header_parse",
    "doc_fingerprints",
    "window_tumbling_10m",
    "window_hopping_10m_5m",
    "sql_api_passthrough",
    "lang_id_confusion",
    "ancestor_path_search",
    "agg_grouping_sets",
    "parse_two_format_dates",
    "stats_summary",
    "q03_top_revenue_orders",
    "q05_regional_supplier_volume",
    "agg_count_by_type",
    "agg_conditional_sum",
    "scalar_max_filter",
    "q02_min_cost_part",
    "q07_nation_volume",
    "q09_product_profit",
    "q12_late_shipping",
    "q16_supplier_diversity",
    "distinct_pairs",
    "left_join_enrich",
    "anti_join_missing",
    "semi_join_active",
    "work_discovery_stale",
    "topk_orders",
    "freshness_last_hours",
    "terms_filter",
    "pagination_page",
    "percentile_stats",
    "agg_totals",
    "topk_per_group",
    "union_set_ops",
    "insert_or_replace_lww",
    "set_intersect_except",
    "skip_pattern_filter",
    "project_derived_columns",
    "search_multi_match",
    "json_props_extract",
    # Tail (r10 verdict #8): the remaining registered queries, listed
    # EXPLICITLY so rotation position is intentional — before this,
    # they appended in registration order and their place in the
    # rotation prefix math was accidental. All driver-green from
    # earlier rounds; TPC-H-derived and SQL-surface queries whose
    # plans have been stable since r4-r6.
    "q04_priority_exists",
    "q10_returned_items",
    "q14_promo_ratio",
    "q17_small_quantity_avg",
    "q18_large_orders",
    "q19_disjunctive_predicates",
    "q22_idle_customers",
    "grouping_sets_rollup",
    "cube_order_matrix",
    "pivot_status_by_priority",
    "q08_market_share",
    "q13_order_count_distribution",
    "json_struct_surface",
    "q06_forecast_revenue",
    "window_rank_functions",
    "fuzzy_name_match",
    "calendar_breakdown",
    "q20_bulk_part_suppliers",
    "q11_important_stock",
]


def _apply_priority_order() -> None:
    missing = [n for n in _PRIORITY if n not in QUERIES]
    if missing:  # pragma: no cover - registration bug guard
        raise RuntimeError(f"priority list names unregistered queries: {missing}")
    unlisted = [n for n in QUERIES if n not in set(_PRIORITY)]
    if unlisted:  # pragma: no cover - registration bug guard
        # Every registered query must hold an EXPLICIT rotation
        # position (r10 verdict #8) — an implicit registration-order
        # tail made prefix math accidental.
        raise RuntimeError(
            f"queries registered but not listed in _PRIORITY: {unlisted}"
        )
    ordered = {n: QUERIES[n] for n in _PRIORITY}
    QUERIES.clear()
    QUERIES.update(ordered)
    oracle_ordered = {n: ORACLES[n] for n in QUERIES if n in ORACLES}
    ORACLES.clear()
    ORACLES.update(oracle_ordered)


_apply_priority_order()

__all__ = ["QUERIES", "ORACLES", "query"]
