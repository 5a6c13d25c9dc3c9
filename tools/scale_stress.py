#!/usr/bin/env python
"""Weak-scaling stress harness: measure how the heaviest operators
scale as the input grows.

SCALE.md argues each operator's plan is linear (banded LSH, O(log n)
connected components, per-shard packing windows). This tool MEASURES
it: amplify the documents/events tables by k in (1, 4, 16) with
replica-disjoint mutations, run each stressed operator at every k, and
fit the scaling exponent

    alpha = log(t_k / t_1) / log(k)

alpha ~ 1 is linear; alpha >= SUPERLINEAR_ALPHA (1.35) flags a plan
whose cost curve bends the wrong way (an all-pairs term, a
single-partition window, a broadcast that stopped fitting). Fixed
per-job overhead makes measured alpha UNDER-estimate the true
exponent at these sizes, so a flagged operator is genuinely bending.

Amplification keeps the *structure* of the workload linear on purpose:

- documents: replica i suffixes every token with ``x<i>`` (an
  alphanumeric joint — it must survive the engine tokenizer) — replica
  token sets are pairwise disjoint, so no cross-replica near-dups
  exist and the original dup/near-dup cluster structure replicates
  exactly k times (a mutation that left replicas near-identical would
  create size-k clusters and O(k^2) candidate pairs BY CONSTRUCTION,
  measuring the generator, not the operator).
- events / orders / lineitem: replica i offsets the ids
  (user_id/event_id, o_orderkey/l_orderkey) by i*REPLICA_OFFSET —
  per-user session and per-order join structure replicates k times,
  timestamps and dimension keys untouched.

Tables the stressed queries don't touch are symlinked from the source
scale factor, so registry queries run unmodified against each
amplified directory.

Usage: python tools/scale_stress.py [--sf-dir /root/testdata/sf0.1]
       [--out SCALE_STRESS.json] [--ks 1,4,16]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

sys.path.insert(0, "/root/repo")

SUPERLINEAR_ALPHA = 1.35

#: Replica id offset. MUST be divisible by every small modulus the
#: query library uses for deterministic subsetting (doc_id % 5 / 7 /
#: 10, vec_id % 5, ...) — lcm(1..10) = 2520 — or each replica's
#: modular selections (e.g. _aug_corpus's %7 trunc planting) pick a
#: DIFFERENT subset and the structure no longer replicates exactly
#: k times (caught as +0.5% dup-row drift in the x4/x16 artifacts).
REPLICA_OFFSET = 2_520_000_000

#: Investigated flags whose superlinearity is a property of the
#: SYNTHETIC DATA's density, not of the physical plan — kept flagged
#: (the measurement is real) but annotated so the artifact records the
#: diagnosis next to the number.
DENSITY_BOUND_NOTES = {
    "dedup_simhash": (
        "Highest constant in the suite, fingerprint-density bound, not "
        "plan bound: each replica draws its token bags from a ~31-token "
        "vocabulary, so 64-bit SimHash fingerprints concentrate within "
        "a replica (the top band-0 byte covers ~40% of a replica's "
        "docs) and the exact-recall byte-pair band test truly fires for "
        "~10% of ALL doc pairs (measured on the clean x16 corpus: 325M "
        "candidate slots over 80k docs). The optimized plan already "
        "folds the Hamming predicate into the join condition, so the "
        "cost is Theta(true collision mass) — the floor any "
        "exact-recall blocker pays. On natural-vocabulary corpora band "
        "bytes are near-uniform and the same plan is linear; see "
        "operators/dedup.py:simhash_pairs docstring. (Before the "
        "byte-pair blocking and the tokenizer-safe amplification joint, "
        "this measured 2.5e9 slots / 40s at x16 — the two fixes cut it "
        "to 325M / ~10s.)"
    ),
    "dedup_minhash_lsh": (
        "Verified-pair counts replicate k-times only approximately "
        "(4625 vs 4x1177=4708 at x4): LSH banding recall is "
        "probabilistic per hash values, and each replica's shingles "
        "hash differently. Operator-inherent, not a generator artifact "
        "— exact-dedup, merge, diff and session rows replicate "
        "exactly."
    ),
}

#: Operators under stress and the amplified table each one exercises.
STRESSED = {
    "dedup_exact": "documents",
    "dedup_minhash_lsh": "documents",
    # r7: the incremental cycle must scale with the BATCH, which the
    # amplification grows k-fold along with the corpus — alpha ~ 1
    # means seed+match+merge stays delta/corpus-proportional with no
    # quadratic candidate term hiding in the band join.
    "dedup_incremental_batch": "documents",
    "token_count_exact": "documents",
    # r7: stride-1 positional shingling is the widest explode in the
    # library (~n_words rows per doc); the hot-set join and island
    # window must stay linear in corpus size or substring dedup dies
    # first at 100 TB.
    "substring_dup_spans": "documents",
    "substring_dedup_clean": "documents",
    "substring_dup_incremental": "documents",
    "dedup_connected_components": "documents",
    "dedup_simhash": "documents",
    "bm25_search_topk": "documents",
    "sequence_packing_stats": "documents",
    "window_tumbling_10m": "events",
    "window_session_30m": "events",
    "merge_upsert_newer_wins": "orders",
    "snapshot_diff_changes": "orders",
    # r8: the change feed must scale with the CHANGED slice (the base,
    # delta and removal sets all grow k-fold under amplification) —
    # alpha ~ 1 means changed-bucket resolution + the classification
    # join stay delta-proportional, no full-table diff hiding inside.
    "store_read_changes": "orders",
    # r10: min/max IVM in the mass-delete regime — the amplified
    # window deletes/re-prices k-fold more rows while the o_custkey
    # group count stays fixed, so alpha ~ 1 proves the broadcast
    # semi-join recompute (operators/ivm.py) stays row-linear with no
    # group-proportional driver term.
    "incremental_view_minmax_hicard": "orders",
    # r10: both-sides-changing joined-view IVM — fact feed and
    # per-changed-customer aggregates grow k-fold against the fixed
    # dim; alpha ~ 1 proves the two-term delta (dF joined to D1 +
    # semi-join-restricted F2 joined to dD) stays feed-proportional.
    "incremental_view_joined_dimchange": "orders",
    # r11: the composed algebras — extremum measures over the joined
    # view; alpha ~ 1 proves the add-candidate algebra plus the
    # group-pruned recompute (D2 semi-joined to affected groups FIRST,
    # fact scan pruned by the key join) stay feed-proportional as the
    # fact side grows k-fold.
    "incremental_view_joined_minmax": "orders",
    # r12: holistic-aggregate IVM — the maintained per-(group, value)
    # histogram's bin domain is FIXED (pk has <=1000 values per
    # status) while the feed grows k-fold; alpha ~ 1 proves
    # maintenance stays feed-proportional (one feed groupBy + one
    # bin-sized outer join) with no row-proportional term hiding in
    # the stats windows (they run over bins, not rows).
    "incremental_view_histogram": "orders",
    # r12: top-k view IVM — the k-deep extremum generalization; the
    # amplified mass delete retires horizon members k-fold more often
    # while the group count stays fixed, so alpha ~ 1 proves the O(k)
    # array merge + group-pruned recompute stay feed-proportional.
    "incremental_view_topk": "orders",
    # r12: moment view — fully distributive decimal(38,0) algebra;
    # alpha ~ 1 is near-tautological but guards the decimal sum path
    # against a codegen fallback sneaking in a row-at-a-time term.
    "incremental_view_moments": "orders",
    # r12: joined histogram — fact feed and per-changed-customer value
    # multisets grow k-fold against the fixed dim; alpha ~ 1 proves
    # the composed bin algebra (ΔF⋈D1 + F2⋈ΔD at bin grain) stays
    # feed-proportional with no recompute term.
    "incremental_view_joined_histogram": "orders",
    # r12 (late): join-membership partition maintenance — the fact
    # feed and the orphan/matched partitions grow k-fold against the
    # fixed dim; alpha ~ 1 proves the flag-flip joins and the one
    # column-pruned dim key probe stay feed-proportional with no
    # fact-rescan term in either flip direction.
    "incremental_view_join_membership": "orders",
    # r12 (late): rollup cascade — both grains' deltas grow with the
    # feed; alpha ~ 1 proves the coarse level really is fed by the
    # fine DELTA (a hidden feed re-aggregation or base rescan at the
    # month level would bend the curve).
    "incremental_view_rollup_cascade": "orders",
    # r12 (late): joined top-k — the k-deep extremum over the joined
    # view; the amplified mass delete retires horizon members and the
    # re-nations carry candidates k-fold more often against the fixed
    # dim, so alpha ~ 1 proves the candidate ranking + group-pruned
    # recompute stay feed-proportional.
    "incremental_view_joined_topk": "orders",
    # r12 (late): three-table joined IVM — the fact feed and both
    # per-changed-key aggregates grow k-fold against the fixed dims;
    # alpha ~ 1 proves all three telescoping terms stay
    # feed/changed-slice-proportional with no rescan term.
    "incremental_view_joined3": "orders",
    # r12 (late): incremental connected components — the chain graph's
    # component count and both feed directions (heals + cuts) grow
    # k-fold while components stay <=100 nodes; alpha ~ 1 proves the
    # cluster-grain merge contraction and the affected-component
    # recompute stay feed/affected-proportional with no full-graph
    # pass (CC rounds are log-bounded and the affected subgraph is a
    # fixed fraction of the chain).
    "dedup_incremental_cc": "orders",
    # r13: dyadic count-min rank sketch — the feed grows k-fold while
    # the cell frame is FIXED (levels x depth x width); alpha ~ 1
    # proves maintenance stays one feed-proportional signed
    # aggregation (a cell-domain- or rank-probe-proportional term
    # would bend the curve) and the serving reads stay O(probes).
    "incremental_view_quantile_sketch": "orders",
    # r13: grouped rank sketch — per-stratum cells are FIXED per group
    # while the feed grows k-fold; alpha ~ 1 proves the group columns
    # ride the same single signed aggregation with no per-group pass.
    "incremental_view_quantile_sketch_grouped": "orders",
    # r14: distributed per-stratum quantile serving — strata count and
    # per-stratum mass both grow with the corpus; rounds stay fixed
    # (4 wide-fan descent jobs) and the serve is join-only, so the
    # probe should amortize: alpha well below 1.
    "incremental_view_sketch_quantiles_hc": "orders",
    # r14: incremental BM25 — the change window grows k-fold with the
    # corpus; maintenance tokenizes only changed docs, so alpha tracks
    # the feed, not the corpus.
    "incremental_view_bm25_topk": "documents",
    # r14: open-vocabulary BM25 index — seed is O(corpus tokens) but
    # the gate fixture replays to pruned reads; the serving read is
    # |terms| buckets regardless of corpus size.
    "bm25_store_search_topk": "documents",
    # r13: windowed PCM features — clips, samples and windows all grow
    # k-fold; alpha ~ 1 proves the decode-explode stays clip-local
    # (per-asset lead windows, hash groupBy) with no cross-asset term.
    "multimodal_pcm_windows": "documents",
    # r12 (late): broadcast-bloom decontamination — the train side
    # grows k-fold while the eval vocabulary (and so the bitmap build)
    # replicates too; alpha ~ 1 proves the map-side screen + confirm
    # join stay shingle-linear with no vocabulary-squared term.
    "decontaminate_bloom": "documents",
    # r14 (late): exact triangle counting — replica token sets are
    # pairwise disjoint, so the near-dup graph (and its triangles)
    # replicates exactly k times with no cross-replica wedges; alpha
    # ~ 1 proves the two wedge joins stay O(sum deg^2) with per-node
    # degrees FIXED by construction (a cross-replica candidate term
    # would bend it).
    "graph_triangle_count": "documents",
    # r14 (late): PQ ADC + rerank — codebook (16 lowest vec_ids) and
    # query set (8) stay FIXED while candidates grow k-fold; alpha ~ 1
    # proves encode (N*m rows vs the broadcast codebook), the
    # (subspace, code) ADC join and the 50-deep rerank all stay
    # candidate-linear.
    "quantized_ann_pq_topk": "embeddings",
    # r14 (late): maintained as-of join — users (and so touched keys)
    # replicate k-fold while per-user event counts stay fixed; alpha
    # ~ 1 proves the anti/semi slice recompute stays
    # touched-rows-proportional with no full re-join term.
    "incremental_view_asof": "events",
    # r14 (late): zone-map pruned rectangle scan — the layout build
    # amortizes into iteration 1 (min-of-2 timing); the measured read
    # grows with the rectangle's matching rows (timestamps replicate
    # in place, so selectivity is k-invariant); alpha ~ 1 proves the
    # pruned read stays matching-cells-proportional.
    "zorder_pruned_scan": "events",
    # r14 (late): IVF-PQ — coarse centroids (16), codebook (16) and
    # query set (8) stay FIXED while the corpus grows k-fold; alpha
    # ~ 1 proves assignment, residual encode, the (cell, subspace,
    # code) ADC join and the shortlist rerank all stay corpus-linear
    # (a probed-cell blowup or LUT fanout term would bend it).
    "ann_ivfpq_topk": "embeddings",
    # r14 (late): label propagation — replica components replicate
    # k-fold with disjoint labels and FIXED per-node degrees; the
    # round count is static (4), so alpha ~ 1 proves each round's
    # edge join + argmax stays O(|E|) with no cross-replica term.
    "graph_label_propagation": "documents",
    # r14 (late): bloom point lookup — the key list is FIXED (4) while
    # the layout grows k-fold; the sidecar build amortizes into
    # iteration 1 (min-of-2 timing) and the probe is O(cells·k) rows,
    # so the measured read should grow only with the claiming cells'
    # file sizes: alpha well below 1.
    "zorder_bloom_lookup": "events",
    # r14 (late): maintained retention triangle — users (and touched
    # keys) replicate k-fold with per-user week sets fixed; alpha ~ 1
    # proves the contribution-frame slice recompute and the final
    # (cohort, offset) agg stay touched/frame-proportional.
    "incremental_view_retention": "events",
    "q01_pricing_summary": "lineitem",
    "q03_top_revenue_orders": "lineitem+orders",
    "similarity_lsh_ann_topk": "embeddings",
    "similarity_ivf_topk": "embeddings",
    "kmeans_cluster_profile": "embeddings",
    "embedding_outliers": "embeddings",
}

ALL_TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def build_session():
    from fs_indexer_elasticsearch_spark.session import get_spark

    return get_spark(app_name="scale-stress")


AMPLIFIABLE = ("documents", "events", "orders", "lineitem", "embeddings")


def amplify(spark, src_dir: str, base: str, k: int, tables=None) -> str:
    """Materialize an amplified copy of ``src_dir`` at replication
    factor k (documents/events amplified, everything else symlinked).
    Returns the directory path. Idempotent per (src, k, tables).

    ``tables`` restricts which tables are amplified (default: all of
    AMPLIFIABLE) — an ``--only`` run at a large k (e.g. the x64
    extension for the density-bound queries) must not pay a 64x
    lineitem materialization it never reads. Subset caches carry a
    subset-suffixed marker so they can never satisfy a full run."""
    import pyspark.sql.functions as F

    tables = set(AMPLIFIABLE if tables is None else tables)
    # Cache key includes the SOURCE dir name — a smoke run at sf0.001
    # must never satisfy a later sf0.1 run's marker check.
    suffix = "" if tables == set(AMPLIFIABLE) else "-" + "-".join(sorted(tables))
    out = os.path.join(
        base, f"{os.path.basename(os.path.normpath(src_dir))}-x{k}{suffix}"
    )
    # Marker is versioned by the amplification scheme: bump when the
    # set of amplified tables or the mutation changes, so stale caches
    # regenerate.
    marker = os.path.join(out, "_READY_v5")
    if os.path.exists(marker):
        return out
    shutil.rmtree(out, ignore_errors=True)
    os.makedirs(out)
    for t in ALL_TABLES:
        src = os.path.join(src_dir, f"{t}.parquet")
        dst = os.path.join(out, f"{t}.parquet")
        if t not in tables or k == 1:
            os.symlink(src, dst)
            continue
        df = spark.read.parquet(src)
        rep = df.withColumn(
            "_r", F.explode(F.sequence(F.lit(0), F.lit(k - 1)))
        )
        if t == "documents":
            # Replica-disjoint token sets: suffix every token with the
            # replica index (replica 0 keeps the original bytes so the
            # k=1 corpus is a strict subset). The joint must survive
            # the ENGINE's tokenizer (functions.text.TOKEN_PATTERN
            # treats any non-[a-z0-9] as a separator — an '_' joint
            # would split 'word_3' into 'word','3' and replicas would
            # share the base vocabulary), so it is a bare alphanumeric
            # 'x<r>'.
            mutated = F.when(F.col("_r") == 0, F.col("text")).otherwise(
                F.array_join(
                    F.transform(
                        F.split(F.col("text"), " "),
                        lambda x: F.concat(x, F.lit("x"), F.col("_r")),
                    ),
                    " ",
                )
            )
            # doc_id is int64 — offset each replica into a disjoint id
            # range, preserving the column type.
            rep = rep.withColumn("text", mutated).withColumn(
                "doc_id",
                F.col("doc_id") + F.col("_r").cast("long") * F.lit(REPLICA_OFFSET),
            )
        elif t in ("orders", "lineitem"):
            # Fact-table growth against FIXED dimensions: orderkeys
            # offset into disjoint ranges (consistently across orders
            # and lineitem, so the orderkey join structure replicates
            # k times); custkey/partkey/suppkey untouched — each dim
            # row simply gains k times the fact rows, which is what
            # fact growth looks like in production.
            keycol = "o_orderkey" if t == "orders" else "l_orderkey"
            rep = rep.withColumn(
                keycol,
                F.col(keycol) + F.col("_r").cast("long") * F.lit(REPLICA_OFFSET),
            )
        elif t == "embeddings":
            # Candidate-corpus growth against a FIXED query set (the
            # ANN queries select vec_id < 8, which stays in replica 0):
            # vec_ids offset into disjoint ranges; vectors perturbed
            # per (replica, dim) with a deterministic shift so replicas
            # are geometrically distinct — identical copies would pile
            # k replicas into the same LSH bucket / IVF cell and
            # measure pile-up, not corpus growth.
            pert = F.transform(
                F.col("embedding"),
                lambda x, i: (
                    x.cast("double")
                    + 0.05 * F.sin(F.col("_r").cast("double") * 7919 + i)
                ).cast("float"),
            )
            rep = rep.withColumn(
                "embedding",
                F.when(F.col("_r") == 0, F.col("embedding")).otherwise(pert),
            ).withColumn(
                "vec_id",
                F.col("vec_id") + F.col("_r").cast("long") * F.lit(REPLICA_OFFSET),
            )
        else:  # events: replicate per-user structure, keep timestamps.
            # Ids are numeric — offset each replica into a disjoint id
            # range (10^9 per replica, far above any testdata id), so
            # per-user session/window structure replicates k times and
            # the column types survive unchanged.
            for c in ("user_id", "event_id"):
                rep = rep.withColumn(
                    c, F.col(c) + F.col("_r").cast("long") * F.lit(REPLICA_OFFSET)
                )
        rep.drop("_r").write.mode("overwrite").parquet(dst)
    open(marker, "w").close()
    return out


def _build_tree(n_files: int) -> str:
    """Delegates to bench.build_ingest_tree — ONE builder, because the
    two consumers deliberately share the /tmp/bench-tree-{n} cache and
    a drifting copy would silently poison the other's files/sec."""
    from bench import build_ingest_tree

    return build_ingest_tree(n_files)


def ingest_stress(spark, ns: list[int]) -> dict:
    """Weak-scaling of the full ingest pipeline (parallel walk ->
    normalize -> snapshot merge -> publish) against tree size — the
    reference's headline 'processing rate' axis. min-of-2 per size
    after one untimed JIT warm-up at the smallest size."""
    import math
    import tempfile

    from fs_indexer_elasticsearch_spark.pipeline import run_pipeline
    from fs_indexer_elasticsearch_spark.sources.config import PipelineConfig

    out = tempfile.mkdtemp(prefix="stress-ingest-")

    def cycle(tree: str, tag: str) -> float:
        cfg = PipelineConfig(
            root_path=tree,
            skip_patterns=[".complete"],
            snapshot_path=os.path.join(out, f"snap-{tag}"),
            direct_links_enabled=False,
            num_buckets=32,
        )
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        run_pipeline(spark, cfg, out_dir=out)
        return time.perf_counter() - t0

    trees = {n: _build_tree(n) for n in ns}
    cycle(trees[ns[0]], "jit-warmup")
    timings: dict[str, float] = {}
    rates: dict[str, int] = {}
    for n in ns:
        best = min(cycle(trees[n], f"{n}-{i}") for i in range(2))
        timings[f"n{n}"] = round(best, 3)
        rates[f"n{n}"] = int(n / best)
    a, b = ns[-2], ns[-1]
    alpha_tail = math.log(timings[f"n{b}"] / timings[f"n{a}"]) / math.log(b / a)
    k0, k1 = ns[0], ns[-1]
    alpha = math.log(timings[f"n{k1}"] / timings[f"n{k0}"]) / math.log(k1 / k0)
    entry = {
        "seconds": timings,
        "files_per_sec": rates,
        "alpha": round(alpha, 3),
        "alpha_tail": round(alpha_tail, 3),
        "superlinear": alpha_tail >= SUPERLINEAR_ALPHA,
    }
    print(
        "ingest_pipeline                  "
        + "  ".join(f"n{n}={timings[f'n{n}']:.2f}s" for n in ns)
        + f"  alpha={alpha:.2f} tail={alpha_tail:.2f}"
        + ("  ** SUPERLINEAR" if entry["superlinear"] else "")
    )
    return entry


def ivf_hot_split_stress(spark, ks: list[int]) -> dict:
    """Weak-scaling of the IVF hot-cell SPLIT path (r10 verdict #7):
    50% of every corpus lands in ONE cell by construction, the corpus
    grows k-fold, and ``split_hot_cells`` runs with a FIXED absolute
    threshold — so the split tree deepens with k and every live cell
    stays bounded. Measured per k: post-split probe latency (min-of-2,
    nprobe=2 — the number that must stay FLAT: without the split it
    is O(hot cell) = O(k); with it, O(threshold)), the one-off split
    cost (expected ~linear in hot rows — maintenance, not the probe
    path), and recall@k of the post-split probe against brute force
    (gate: >= 0.8). Synthetic, self-contained — no amplified tables."""
    import math
    import shutil
    import tempfile

    import pyspark.sql.functions as F

    from fs_indexer_elasticsearch_spark.operators.incremental_ann import (
        IvfIndexStore,
    )
    from fs_indexer_elasticsearch_spark.operators.similarity import (
        brute_force_topk,
    )

    N0, DIM, NCENT, THRESH, TOPK = 2000, 16, 16, 1500, 5

    def vec(cluster: int, i: int) -> list[float]:
        v = [0.0] * DIM
        v[cluster % DIM] = 10.0
        v[(cluster + 1 + i % 5) % DIM] = 1.0 + (i % 7) * 0.15
        v[(cluster + 3 + i % 3) % DIM] = 0.5 + (i % 11) * 0.05
        return v

    probe_s: dict[str, float] = {}
    split_s: dict[str, float] = {}
    recalls: dict[str, float] = {}
    for k in ks:
        n = N0 * k
        rows = [
            # 50% into cluster 0 (the hot cell), the rest spread.
            (i, vec(0 if i % 2 == 0 else 1 + (i % (NCENT - 1)), i))
            for i in range(n)
        ]
        corpus = spark.createDataFrame(rows, "vec_id long, emb array<double>")
        cents = spark.createDataFrame(
            [(c, vec(c, 0)) for c in range(NCENT)],
            "vec_id long, emb array<double>",
        )
        path = tempfile.mkdtemp(prefix=f"stress-ivfsplit-x{k}-")
        shutil.rmtree(path)
        store = IvfIndexStore(spark, path, num_buckets=32)
        store.seed(corpus, cents, "vec_id", "emb")
        t0 = time.perf_counter()
        seq, rounds = 1, 0
        while store.split_hot_cells(threshold=THRESH, seq=seq) is not None:
            seq += 1
            rounds += 1
            if rounds > 12:
                raise RuntimeError("ivf split did not quiesce")
        split_s[f"x{k}"] = round(time.perf_counter() - t0, 3)
        queries = corpus.filter(F.col("vec_id") % (n // 20) == 3)
        best = None
        got = None
        for _ in range(2):
            t0 = time.perf_counter()
            got = store.search(
                queries, "vec_id", "emb", k=TOPK, nprobe=2
            ).collect()
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        probe_s[f"x{k}"] = round(best, 3)
        want = brute_force_topk(
            corpus, queries, "vec_id", "emb", k=TOPK
        ).collect()
        got_pairs = {(r.query_id, r.neighbor_id) for r in got}
        want_pairs = {(r.query_id, r.neighbor_id) for r in want}
        recalls[f"x{k}"] = round(
            len(got_pairs & want_pairs) / max(1, len(want_pairs)), 3
        )
        shutil.rmtree(path, ignore_errors=True)
    ka, kb = ks[-2], ks[-1]
    alpha_tail = math.log(
        max(probe_s[f"x{kb}"], 1e-3) / max(probe_s[f"x{ka}"], 1e-3)
    ) / math.log(kb / ka)
    entry = {
        "probe_seconds": probe_s,
        "split_seconds": split_s,
        "recall_at_k": recalls,
        "alpha_tail": round(alpha_tail, 3),
        "superlinear": alpha_tail >= SUPERLINEAR_ALPHA,
        "recall_gate_ok": min(recalls.values()) >= 0.8,
    }
    print(
        "ivf_hot_split                    "
        + "  ".join(f"x{k}={probe_s[f'x{k}']:.2f}s" for k in ks)
        + f"  tail={alpha_tail:.2f}  recall_min={min(recalls.values()):.2f}"
        + ("  ** SUPERLINEAR" if entry["superlinear"] else "")
        + ("" if entry["recall_gate_ok"] else "  ** RECALL<0.8")
    )
    return entry


def run(
    sf_dir: str,
    ks: list[int],
    out_path: str,
    ingest_ns: list[int] | None = None,
    only: list[str] | None = None,
    merge_into: str | None = None,
    with_ivf_split: bool = False,
) -> int:
    import math

    from fs_indexer_elasticsearch_spark.plans import QUERIES

    spark = build_session()
    base = "/tmp/scale_stress"
    os.makedirs(base, exist_ok=True)
    stressed = (
        {n: STRESSED[n] for n in only} if only else dict(STRESSED)
    )
    needed = None
    if only:
        needed = {p for spec in stressed.values() for p in spec.split("+")}
    dirs = {k: amplify(spark, sf_dir, base, k, tables=needed) for k in ks}

    results: dict[str, dict] = {}
    flagged: list[str] = []
    for name, table in stressed.items():
        timings: dict[str, float] = {}
        rows: dict[str, int] = {}
        for k in ks:
            # Two runs, keep the min: the first pays JIT/shuffle-file
            # warmup, and per-run noise on this box is ±40%.
            best = None
            for _ in range(2):
                t0 = time.perf_counter()
                n = QUERIES[name](spark, dirs[k]).count()
                dt = time.perf_counter() - t0
                best = dt if best is None else min(best, dt)
            timings[f"x{k}"] = round(best, 3)
            rows[f"x{k}"] = n
        k0, k1 = ks[0], ks[-1]
        alpha = math.log(timings[f"x{k1}"] / timings[f"x{k0}"]) / math.log(
            k1 / k0
        )
        # Tail exponent (last two points): the fixed per-job overhead
        # that dominates small inputs dilutes the full-range exponent —
        # the original single-byte SimHash blocking measured alpha=1.00
        # full-range while its x4->x16 tail ran at 1.55. Flag on the
        # tail, where overhead matters least.
        ka, kb = ks[-2], ks[-1]
        alpha_tail = math.log(timings[f"x{kb}"] / timings[f"x{ka}"]) / math.log(
            kb / ka
        )
        entry = {
            "table": table,
            "seconds": timings,
            "rows": rows,
            "alpha": round(alpha, 3),
            "alpha_tail": round(alpha_tail, 3),
            "superlinear": alpha_tail >= SUPERLINEAR_ALPHA,
        }
        results[name] = entry
        if entry["superlinear"]:
            flagged.append(name)
        print(
            f"{name:32s} " + "  ".join(f"x{k}={timings[f'x{k}']:.2f}s" for k in ks)
            + f"  alpha={alpha:.2f} tail={alpha_tail:.2f}"
            + ("  ** SUPERLINEAR" if entry["superlinear"] else "")
        )

    ingest = ingest_stress(spark, ingest_ns) if ingest_ns else None
    if ingest and ingest["superlinear"]:
        flagged.append("ingest_pipeline")

    ivf_split = None
    if not only or with_ivf_split:  # full runs carry the synthetic probes
        ivf_split = ivf_hot_split_stress(spark, ks)
        if ivf_split["superlinear"] or not ivf_split["recall_gate_ok"]:
            flagged.append("ivf_hot_split")

    if merge_into:
        # Extend an existing artifact in place: replace the re-run
        # entries (now carrying the longer ks column), recompute the
        # flagged list over the union, and record which entries run
        # the extended range.
        with open(merge_into) as f:
            artifact = json.load(f)
        artifact["results"].update(results)
        if ingest is not None:  # a re-run ingest pass replaces the old one
            artifact["ingest"] = ingest
        if ivf_split is not None:
            artifact["ivf_hot_split"] = ivf_split
        artifact["flagged"] = sorted(
            n for n, e in artifact["results"].items() if e["superlinear"]
        ) + (
            ["ingest_pipeline"]
            if (artifact.get("ingest") or {}).get("superlinear")
            else []
        ) + (
            ["ivf_hot_split"]
            if (artifact.get("ivf_hot_split") or {}).get("superlinear")
            or (
                artifact.get("ivf_hot_split") is not None
                and not artifact["ivf_hot_split"]["recall_gate_ok"]
            )
            else []
        )
        ext = artifact.setdefault("ks_extended", {})
        for n in results:
            ext[n] = ks
        out_path = merge_into
    else:
        artifact = {
            "sf_dir": sf_dir,
            "ks": ks,
            "superlinear_alpha": SUPERLINEAR_ALPHA,
            "results": results,
            "ingest": ingest,
            "ivf_hot_split": ivf_split,
            "flagged": flagged,
            # Always recorded (not only when the variance-straddled flag
            # trips): the diagnosis belongs next to the number.
            "notes": DENSITY_BOUND_NOTES,
        }
    with open(out_path, "w") as f:
        json.dump(artifact, f, indent=1)
    flagged = artifact["flagged"]
    print(f"\nwrote {out_path}; {len(flagged)} flagged: {flagged or 'none'}")
    spark.stop()
    return 1 if flagged else 0


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--out", default="SCALE_STRESS.json")
    ap.add_argument("--ks", default="1,4,16")
    ap.add_argument(
        "--ingest-ns",
        default="12500,50000,200000",
        help="comma-separated tree sizes for the ingest weak-scaling pass; '' skips",
    )
    ap.add_argument(
        "--only",
        default="",
        help="comma-separated stressed-query names to re-run (subset mode)",
    )
    ap.add_argument(
        "--merge-into",
        default="",
        help="existing artifact to update in place with this run's entries",
    )
    ap.add_argument(
        "--with-ivf-split",
        action="store_true",
        help="run the synthetic IVF hot-cell split probe even in --only "
        "subset mode",
    )
    a = ap.parse_args()
    ns = [int(x) for x in a.ingest_ns.split(",") if x]
    sys.exit(
        run(
            a.sf_dir,
            [int(x) for x in a.ks.split(",")],
            a.out,
            ns,
            only=[x for x in a.only.split(",") if x] or None,
            merge_into=a.merge_into or None,
            with_ivf_split=a.with_ivf_split,
        )
    )
