"""Deduplication operators for large-scale training-data pipelines.

Four dedup families, all shuffle-architected for 100 TB:
 - exact: hash-groupBy on a content fingerprint (one shuffle on the
   16-byte hash; map-side combine keeps it tiny).
 - MinHash + LSH: shingle → signature → band → bucket self-join.
   The candidate join shuffles on (band_index, band_hash) — buckets
   are small by construction, so the join is linear-ish; the exact
   Jaccard verify touches only candidate pairs, never the full cross
   product.
 - SimHash: 64-bit fingerprints (two portable 32-bit words),
   8×8-bit banding for blocking (exact recall to Hamming 7), Hamming
   verify on candidates.
 - n-gram Jaccard: exact all-pairs within a blocking key (for
   bounded blocks only — the LSH paths are the scale route).
 - connected components: near-dup PAIRS from LSH are edges of a
   similarity graph; transitive closure assigns every document a
   canonical cluster id (min member). Alternating large-star /
   small-star (Kiveris et al., "Connected Components in MapReduce
   and Beyond", 2014) converges in O(log n) rounds of pure
   join/groupBy — no collect_list, so a super-node (10^6 copies of
   one document) stays a hash-aggregate, never a giant array row.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from ..functions.text import (
    band_hashes,
    distinct_tokens,
    hamming64,
    hex_word32,
    minhash_base,
    minhash_signature,
    simhash32_from_hashes,
    tokens,
    word_shingles,
)
from ..functions.rounding import stable_round
from ..tables import ckpt_shared, spread_small


def exact_duplicates(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Exact dedup groups: (keeper_id, n_dups, content_hash) for every
    content hash appearing more than once; keeper = min id.

    NULL-text rows are excluded BEFORE hashing: md5(NULL) is NULL and
    groupBy collects all NULL hashes into one group, which would
    report documents whose content was never compared as "exact
    duplicates" of each other (and a downstream dedup would drop
    them)."""
    return (
        df.filter(F.col(text_col).isNotNull())
        .select(F.col(id_col), F.md5(F.col(text_col)).alias("content_hash"))
        .groupBy("content_hash")
        .agg(F.min(id_col).alias("keeper_id"), F.count(F.lit(1)).alias("n_dups"))
        .filter(F.col("n_dups") > 1)
    )


def shingle_sets(df: DataFrame, id_col: str, text_col: str, n: int = 3) -> DataFrame:
    # Two-step projection: materialize the token array BEFORE building
    # shingles. Inlining tokens() into word_shingles would re-evaluate
    # the regex split inside every element_at of the shingle lambda
    # (no CSE across lambda bodies) — O(tokens²) regex work per doc.
    # spread_small: HOF lambdas are interpreted (not codegen'd) and
    # inherit scan parallelism — a one-row-group local file would pin
    # the whole tokenize+shingle pass to a single core.
    df = spread_small(df)
    return df.select(
        F.col(id_col).alias("sid"), tokens(F.col(text_col)).alias("tk")
    ).select("sid", word_shingles(F.col("tk"), n).alias("shingles"))


def _validate_minhash_config(num_hashes: int, bands: int) -> None:
    from ..functions.text import MINHASH_AB

    if num_hashes > len(MINHASH_AB):
        raise ValueError(
            f"num_hashes={num_hashes} exceeds the {len(MINHASH_AB)}-entry "
            "permutation table (functions.text.MINHASH_AB) — extend the "
            "table to use more hashes (silently indexing past it was an "
            "IndexError at plan build)."
        )
    if num_hashes % bands != 0:
        raise ValueError(
            f"bands={bands} must divide num_hashes={num_hashes}: "
            "band_hashes floors rows-per-band and would silently drop "
            f"the trailing {num_hashes % bands} signature value(s), "
            "changing the S-curve from the requested configuration."
        )


def minhash_band_rows(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    num_hashes: int = 16,
    bands: int = 4,
    shingle_n: int = 3,
) -> DataFrame:
    """The PERSISTABLE form of the MinHash-LSH index: one row per
    (document, band) — ``(sid, sig array<long>, b, h)`` where ``h`` is
    the band hash and ``sig`` the full signature. Identical hashing
    chain to :func:`minhash_lsh_pairs` (same base hash, permutation
    table, and band md5), so rows computed for a DELTA batch join
    bit-compatibly against rows persisted for the corpus in an earlier
    run — the foundation of incremental batch-vs-corpus dedup
    (operators/incremental_dedup.py), where the reference's whole
    design is incremental upsert (scanner.py:225-244) and a nightly 1%
    delta must cost O(delta), not a full-corpus re-dedup.

    Carrying ``sig`` on every band row costs bands x num_hashes longs
    per doc (~512 B at 4x16) and buys candidate verification straight
    off the index — no second lookup into a corpus-text table (which
    would be an O(corpus) scan per batch on an engine without keyed
    point reads)."""
    _validate_minhash_config(num_hashes, bands)
    sh = shingle_sets(df, id_col, text_col, shingle_n)
    based = sh.select("sid", minhash_base(F.col("shingles")).alias("mhb"))
    mh_cols = [f"mh_{i}" for i in range(num_hashes)]
    # Band hashes come from the SAME band_hashes helper the self-join
    # path (minhash_lsh_pairs) uses — one formula, so persisted index
    # rows and in-memory candidates cannot drift (r7 review finding).
    wide = based.select(
        "sid", *minhash_signature(F.col("mhb"), num_hashes)
    ).select(
        "sid",
        F.array(*mh_cols).alias("sig"),
        *band_hashes(mh_cols, bands),
    )
    band_structs = [
        F.struct(F.lit(b).alias("b"), F.col(f"band_{b}").alias("h"))
        for b in range(bands)
    ]
    return wide.select(
        "sid", "sig", F.explode(F.array(*band_structs)).alias("bd")
    ).select("sid", "sig", F.col("bd.b").alias("b"), F.col("bd.h").alias("h"))


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    num_hashes: int = 16,
    bands: int = 4,
    shingle_n: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """Near-duplicate pairs (id_a < id_b, jaccard) via MinHash-LSH
    candidate generation + exact Jaccard verification.

    With b bands of r rows, a pair with true Jaccard s is a candidate
    with probability 1-(1-s^r)^b (the standard S-curve); the exact
    verify then removes false positives, so precision is exact and
    recall follows the curve.
    """
    _validate_minhash_config(num_hashes, bands)
    # Eager checkpoint, not cache (optimization round r14): the frame
    # has three parallel consumers (the signature chain and both
    # verify legs), and BOTH cache() and a lazy checkpoint let those
    # consumers race-compute the partitions on first materialization;
    # cache() additionally persists keyed on the logical plan, leaking
    # reuse across repeated invocations in one session (bench warm
    # runs must recompute). One job here; consumers read blocks.
    sh = shingle_sets(df, id_col, text_col, shingle_n).transform(ckpt_shared)
    # Base hash materialized in its own projection: ONE md5 per
    # shingle; the 16 permutations are integer arithmetic over it
    # (universal-hash family — 16× less hashing than keyed-md5-min).
    based = sh.select("sid", "shingles", minhash_base(F.col("shingles")).alias("mhb"))
    sig = based.select(
        "sid", "shingles", *minhash_signature(F.col("mhb"), num_hashes)
    )
    banded = sig.select(
        "sid", *band_hashes([f"mh_{i}" for i in range(num_hashes)], bands)
    )
    long = (
        banded.select(
            "sid",
            F.explode(
                F.array(
                    *[
                        F.struct(F.lit(b).alias("b"), F.col(f"band_{b}").alias("h"))
                        for b in range(bands)
                    ]
                )
            ).alias("band"),
        )
        .select("sid", "band.b", "band.h")
        # Eager checkpoint: the self-join would otherwise execute the
        # whole minhash pipeline twice — once per side, and cache()
        # does NOT prevent that (both legs race on first
        # materialization); see sh above.
        .transform(ckpt_shared)
    )
    a = long.alias("a")
    b_ = long.alias("b")
    cands = (
        a.join(b_, (F.col("a.b") == F.col("b.b")) & (F.col("a.h") == F.col("b.h")))
        .filter(F.col("a.sid") < F.col("b.sid"))
        .select(F.col("a.sid").alias("id_a"), F.col("b.sid").alias("id_b"))
        .distinct()
    )
    sa = sh.select(F.col("sid").alias("id_a"), F.col("shingles").alias("sh_a"))
    sb = sh.select(F.col("sid").alias("id_b"), F.col("shingles").alias("sh_b"))
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size("sh_a") + F.size("sh_b") - inter
    jac = inter / union
    return (
        cands.join(sa, "id_a")
        .join(sb, "id_b")
        .select("id_a", "id_b", stable_round(jac, 3).alias("jaccard"))
        .filter(F.col("jaccard") >= threshold)
    )


def simhash_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    max_hamming: int = 6,
    allow_partial_recall: bool = False,
) -> DataFrame:
    """Near-duplicate pairs by 64-bit SimHash: byte-band blocking
    (8 bands × 8 bits) then Hamming-distance verify on candidates.

    The fingerprint is two 32-bit words (lo = md5 hex 1-8 per token,
    hi = hex 9-16) — overflow-free and byte-portable across engines
    (see functions.text.simhash64_words).

    Blocking adapts to the Hamming budget (Manku/Jain/Das Sarma-style
    multi-block keys, WWW'07 "Detecting Near-Duplicates for Web
    Crawling"):

    - ``max_hamming <= 6`` (the default): key on every PAIR of the 8
      bytes — C(8,2) = 28 keys of 16 bits. Any pair within Hamming 6
      flips bits in at most 6 bands, leaving >= 2 bands intact, so
      some byte-pair key matches (pigeonhole — EXACT recall). 65,536
      bucket values per key vs 256 for single bytes: mean bucket
      occupancy, and with it the quadratic verify term, drops ~256x.
      The weak-scaling stress (SCALE_STRESS.json) caught the
      single-byte scheme bending superlinear (x4->x16 alpha 1.55 on
      the amplified corpus) — 256 buckets cannot block a large
      corpus; 2^16 defers the bend by that factor and the same
      construction extends to triples if a deployment needs more.
    - ``max_hamming == 7``: single-byte bands (8 x 8 bits), exact to
      Hamming 7 by the 1-intact-band pigeonhole.
    - ``max_hamming > 7``: rejected (ValueError) unless the caller
      opts in with ``allow_partial_recall=True``. Beyond 7 flipped
      bits, every 8-bit band can differ and single-byte blocking
      degrades to PROBABILISTIC recall — previously silent, now an
      explicit contract mirroring minhash_lsh_pairs' config
      validation (r6 advice). The opt-in exists for diagnostics
      (e.g. "report the hamming of whatever candidates block
      together"); production budgets past 7 need a wider-band
      construction instead.

    Either way the final predicate verifies true Hamming distance on
    candidates, so the emitted pair set is identical under both
    blockings — which is why the DuckDB oracle twin (single-byte
    blocking) stays byte-for-byte comparable."""
    if max_hamming > 7 and not allow_partial_recall:
        raise ValueError(
            f"max_hamming={max_hamming}: 8-band blocking is exact only to "
            "Hamming 7; recall beyond that is probabilistic. Pass "
            "allow_partial_recall=True to accept that (diagnostics), or "
            "use a wider-band construction."
        )
    s = (
        spread_small(df)
        .select(
            F.col(id_col).alias("sid"), distinct_tokens(F.col(text_col)).alias("tk")
        )
        # md5 array materialized ONCE; both words derive from it.
        .select("sid", F.transform(F.col("tk"), F.md5).alias("mh"))
        .select(
            "sid",
            F.transform(F.col("mh"), lambda m: hex_word32(m, 1)).alias("th_lo"),
            F.transform(F.col("mh"), lambda m: hex_word32(m, 9)).alias("th_hi"),
        )
        .select(
            "sid",
            simhash32_from_hashes("th_lo").alias("lo"),
            simhash32_from_hashes("th_hi").alias("hi"),
        )
        # Eager checkpoint, not cache: the band self-join's two legs
        # race-compute a cached frame on first materialization (see
        # minhash_lsh_pairs).
        .transform(ckpt_shared)
    )
    def byte(k: int) -> F.Column:
        word = F.col("lo") if k < 4 else F.col("hi")
        return F.shiftright(word, 8 * (k % 4)).bitwiseAND(F.lit(255))

    # ONE integer band key (band_index << 16 | band_value) instead of a
    # (b, h) struct: a single-column int equi-join — measured 21%
    # faster than the struct pair at sf0.1 (min 1.62 s vs 2.06 s,
    # alternating min-of-5 in one session).
    #
    # The join shape is deliberately VERIFY-EARLY: the Hamming distance
    # is computed inline on every candidate row and the hamming <= max
    # filter sits after .distinct() in source order, but Catalyst
    # PUSHES it below the distinct (hamming is one of the grouping
    # columns), so candidates are verified before the dedup shuffle and
    # only survivors are deduped. The r13-verdict alternative — dedup
    # bare (id_a, id_b) pairs first, then join the fingerprint frame
    # back and verify once per unique pair — was built and MEASURED
    # SLOWER (min 2.03 s vs 1.67 s at sf0.1, same protocol): the
    # inline verify is a few bit ops per row, far cheaper than the
    # extra join pass, and on real (non-synthetic) corpora the verify
    # is highly selective, making early verification strictly better
    # at scale. Rejected; this comment is the record.
    if max_hamming <= 6:
        combos = [(i, j) for i in range(8) for j in range(i + 1, 8)]
        bands = [
            (F.lit(c << 16) + byte(i) * 256 + byte(j))
            for c, (i, j) in enumerate(combos)
        ]
    else:
        bands = [(F.lit(k << 16) + byte(k)) for k in range(8)]
    long = s.select("sid", "lo", "hi", F.explode(F.array(*bands)).alias("bk"))
    a = long.alias("a")
    b_ = long.alias("b")
    return (
        a.join(b_, F.col("a.bk") == F.col("b.bk"))
        .filter(F.col("a.sid") < F.col("b.sid"))
        .select(
            F.col("a.sid").alias("id_a"),
            F.col("b.sid").alias("id_b"),
            hamming64(
                F.col("a.lo"), F.col("a.hi"), F.col("b.lo"), F.col("b.hi")
            ).alias("hamming"),
        )
        .distinct()
        .filter(F.col("hamming") <= max_hamming)
    )


def _symmetrize(e: DataFrame) -> DataFrame:
    """Both orientations of an edge list, self-loops dropped."""
    fwd = e.filter(F.col("u") != F.col("v"))
    return fwd.union(
        fwd.select(F.col("v").alias("u"), F.col("u").alias("v"))
    ).distinct()


def connected_components(
    edges: DataFrame,
    src: str,
    dst: str,
    *,
    max_iter: int = 40,
) -> DataFrame:
    """Assign every node of an undirected edge list its connected
    component, labeled by the component's MINIMUM node id. Returns
    (node, cluster).

    POINTER-DOUBLED min-label propagation (r12 verdict #7 — the
    previous alternating large-star/small-star needed roughly twice
    the rounds on chain-shaped components, and chains are near-dup
    CC's worst case): per round every node takes the min of (a) its
    current label, (b) its LABEL'S label — the pointer-doubling
    shortcut, which makes label reach double each round instead of
    advancing one hop — and (c) its neighbors' labels. Each round is
    three equi-joins + one groupBy-min, nothing quadratic, no
    per-node neighbor arrays; the fixpoint is provably the min-id
    labeling (labels only decrease, only component-member ids ever
    propagate, and at fixpoint both the neighbor and shortcut
    inequalities force one constant per component, which the
    component minimum m pins to m since l(m) <= m from
    initialization). Per round the frontier is localCheckpoint-ed:
    the convergence test is an action anyway, and truncating lineage
    there keeps round k's plan O(1) instead of O(k) (the same
    iterative-algorithm hygiene GraphX applies internally).

    This is the transitive-closure step of near-dedup at 100 TB: LSH
    emits pairwise edges; clusters (not pairs) are what you keep one
    representative of. Duplicate clusters are shallow, so rounds ~2-3
    in practice; a pathological 10^8-node path needs ~log2(10^8)=27
    doubling rounds where the star alternation paid roughly two jobs
    per halving. ``max_iter`` therefore defaults ABOVE that worst case
    (r13 advice: the old default of 25 sat below the docstring's own
    bound), and exhausting it without reaching the signature fixpoint
    RAISES instead of returning partially-propagated labels — a wrong
    labeling that silently under-merges duplicate clusters is strictly
    worse than a loud retry-with-higher-budget.
    """
    # EAGER: _symmetrize references e TWICE (forward + swapped legs of
    # one union), so a lazy checkpoint would race-compute the caller's
    # upstream plan — for LSH dedup, the expensive candidate-pair
    # pipeline — inside lab's materialization job (ckpt_shared =
    # size-gated policy, tables.py).
    e = edges.select(F.col(src).alias("u"), F.col(dst).alias("v")).transform(
        ckpt_shared
    )
    # Node list from BOTH raw endpoints of the CHECKPOINTED edge list:
    # a node whose only edges are self-loops (u,u) has no row in the
    # symmetrized set (self-loops dropped there) yet is still its own
    # singleton component. Reading the checkpoint keeps the caller's
    # upstream plan (for LSH dedup, the expensive candidate-pair
    # pipeline) executed exactly once.
    nodes = (
        e.select(F.col("u").alias("node"))
        .union(e.select(F.col("v").alias("node")))
        .distinct()
    )
    # LAZY, deliberately (r15 — one job less per CC invocation): sym's
    # first consumer is lab's EAGER materialization right below, which
    # references sym exactly ONCE (no intra-job race) and stores its
    # blocks as a byproduct; every round's cand then reads blocks. An
    # eager sym would spend a dedicated job on the same work.
    sym = _symmetrize(e).localCheckpoint(eager=False)
    # l0(u) = min({u} ∪ Γ(u)); nodes without non-loop edges are
    # absent here and re-enter as singletons in the final join.
    lab = (
        sym.groupBy("u")
        .agg(F.min("v").alias("mv"))
        .select("u", F.least("u", "mv").alias("l"))
        .transform(ckpt_shared)
    )
    prev: tuple | None = None
    for rnd in range(1, max_iter + 1):
        # One join + one groupBy per round (optimization round r14 —
        # the previous shape was a lab⋈lab pointer join, a sym⋈lab
        # neighbor join + groupBy, and a 3-way least() join: ~5
        # exchanges per round where the data needs 2). Encode all
        # three label sources as EDGES into one candidate list:
        #   (u, u)     → contributes l(u)        (own label)
        #   (u, l(u))  → contributes l(l(u))     (pointer doubling)
        #   sym        → contributes l(Γ(u))     (neighbor labels)
        # then newl(u) = min over the joined labels — row-for-row the
        # same value as least(l, l(l), min-neighbor-l), so the label
        # sequence, round count and fixpoint are IDENTICAL to the old
        # shape. Every l(u) is a member id of u's component (it has
        # edges), and (u, u) guarantees each u survives the inner
        # join, so no left-join/coalesce is needed.
        cand = sym.unionByName(
            lab.select("u", F.col("l").alias("v"))
        ).unionByName(lab.select("u", F.col("u").alias("v")))
        lab = cand.join(
            lab.select(F.col("u").alias("v"), F.col("l").alias("_nl")),
            "v",
        ).groupBy("u").agg(F.min("_nl").alias("l"))
        # Probe the fixpoint every SECOND round (optimization round
        # r14): rounds are actions and actions are the cost here —
        # each probe is the job that materializes the (lazy)
        # checkpoint and computes the signature, so probing at
        # cadence 2 fuses two rounds of joins into one job and halves
        # the job count. Detection stays sound: labels only decrease,
        # so equal signatures two rounds apart force lab(k) ==
        # lab(k-1) == lab(k-2) — the same fixpoint, at most one
        # redundant (cheap) round of compute past it. Unprobed rounds
        # are NOT checkpointed: their lineage (one join + one agg)
        # rides into the probe round's materialization.
        if rnd % 2 == 0 or rnd == max_iter:
            lab = lab.localCheckpoint(eager=False)
            # Fixpoint signature: count + order-independent xor of row
            # hashes (xor, not sum: overflow-free under ANSI mode; rows
            # are distinct so no pair cancels its twin).
            sig = tuple(
                lab.agg(
                    F.count(F.lit(1)),
                    F.bit_xor(F.xxhash64(F.col("u"), F.col("l"))),
                ).first()
            )
            if sig == prev:
                break
            prev = sig
    else:
        raise RuntimeError(
            f"connected_components: no fixpoint within max_iter={max_iter} "
            "rounds — labels are only partially propagated (components "
            "would be silently split). Pointer doubling converges in "
            "~log2(longest path) rounds; raise max_iter."
        )
    return (
        nodes.join(lab, nodes.node == lab.u, "left")
        .select(
            F.col("node"),
            F.least(F.col("node"), F.coalesce(F.col("l"), F.col("node"))).alias(
                "cluster"
            ),
        )
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    block_col: str | None = None,
    threshold: float = 0.9,
) -> DataFrame:
    """Exact unigram-set Jaccard over all pairs within a block.
    Quadratic per block — use only with bounded blocks; the LSH
    operators are the unbounded-scale path."""
    t = df.select(
        F.col(id_col).alias("sid"),
        *([F.col(block_col).alias("blk")] if block_col else [F.lit(1).alias("blk")]),
        distinct_tokens(F.col(text_col)).alias("toks"),
        # Eager checkpoint, not cache: self-joined — see minhash_lsh_pairs.
    ).transform(ckpt_shared)
    a = t.alias("a")
    b = t.alias("b")
    inter = F.size(F.array_intersect(F.col("a.toks"), F.col("b.toks")))
    union = F.size(F.col("a.toks")) + F.size(F.col("b.toks")) - inter
    return (
        a.join(b, F.col("a.blk") == F.col("b.blk"))
        .filter(F.col("a.sid") < F.col("b.sid"))
        .select(
            F.col("a.sid").alias("id_a"),
            F.col("b.sid").alias("id_b"),
            stable_round(inter / union, 3).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


def maintain_connected_components(
    edge_store,
    v_from: int,
    v_to: int,
    *,
    src: str,
    dst: str,
    nodes: DataFrame,
    old_labels: DataFrame | None = None,
    debug: bool = False,
) -> DataFrame:
    """Maintain a CONNECTED-COMPONENTS labeling (node -> min-id
    cluster) across one change window of an EDGE STORE — the
    incremental form of :func:`connected_components`, which is the
    transitive-closure step of near-dup clustering: at 100 TB the
    similarity graph is maintained, not rebuilt, as batches add LSH
    edges and retention deletes retire them.

    The two directions are asymmetric, and the algebra respects that:

    - EDGE ADDS only MERGE components, and merging is resolvable at
      CLUSTER grain: map the added edges' endpoints through the old
      labels, contract the resulting cluster-id graph (O(feed) nodes
      — clusters, not members), and apply the mapping to the label
      view with one broadcast-sized join. No member-grain graph work.
    - EDGE DELETES can SPLIT a component, and no label algebra can
      answer "is it still connected" without looking at the
      component again: every (post-merge) cluster containing a
      deleted edge's endpoint is RECOMPUTED from the post-state edges
      of exactly those clusters — a semi-join-pruned subgraph, the
      same affected-set recompute contract as maintain_min_max's
      extremum departures, never a full graph pass.

    ``nodes`` is the label universe (one column ``node``): isolated
    nodes are legitimate singleton clusters (every document is its
    own cluster until merged), so the view never drops a node whose
    last edge disappears, and a fed-back view is RE-BASED onto the
    current universe — nodes that joined since last cycle enter as
    singletons before the feed applies (a growing corpus's new docs),
    nodes no longer listed leave the view. Shrinking the universe is
    only sound when the departed node's edges are deleted in the same
    window (the dedup case: a retired doc's LSH edges are tombstoned
    with it) — a departed node with live edges would leave dangling
    endpoint labels. ``old_labels`` is this function's previous
    output ``(node, cluster)``; omitted, the first derivation runs
    one full CC over the ``v_from`` edges. An edge UPDATE that
    rewires endpoints is handled as delete(pre-pair) + add(post-pair)
    — both directions fire; an update that keeps its endpoints is
    structurally a no-op and triggers neither. Returns
    ``(node, cluster)`` over exactly ``nodes``.

    ``debug=True`` VERIFIES the universe contract instead of trusting
    it (r12 advice: a violation — an added edge with an endpoint
    outside ``nodes``, or a departed node whose edges were NOT
    deleted in the same window — silently yields dangling or
    out-of-universe cluster ids): one anti-join of the post-state
    edge endpoints against ``nodes``, raising with sample offenders
    on non-empty. O(edges) — a debug gate, off on the hot path."""
    if debug:
        # One post-state read, both endpoints exploded from it (r13
        # advice: reading the version once per endpoint doubled the
        # debug path's scan).
        _post = (
            edge_store.read(version=v_to)
            .select(F.explode(F.array(F.col(src), F.col(dst))).alias("_ep"))
        )
        orphans = [
            r._ep
            for r in _post.join(
                nodes.select(F.col("node").alias("_ep")), "_ep", "left_anti"
            )
            .limit(5)
            .collect()
        ]
        if orphans:
            raise ValueError(
                "maintain_connected_components: post-state edges at "
                f"version {v_to} have endpoints outside the node "
                f"universe (sample: {orphans}) — either an added edge "
                "references a node not in `nodes`, or a node departed "
                "the universe without its edges being deleted in the "
                "same window; the labeling would dangle"
            )
    ekey = edge_store.key
    ekeys = [ekey] if isinstance(ekey, str) else list(ekey)
    feed = edge_store.read_changes(
        v_from, v_to, update_images="both"
    )
    is_post = F.col("_change").isin("insert", "update_postimage")
    pair = F.struct(F.col(src).alias("u"), F.col(dst).alias("v"))
    # Per edge key: pre/post endpoint pairs. A rewiring update is
    # delete(pre) + add(post); an endpoint-preserving update (payload
    # columns changed, structure didn't) is filtered out entirely —
    # feeding it through as an add-only would leave the pre-pair's
    # stale merge in place forever (review finding).
    pairs = (
        feed.groupBy(*ekeys)
        .agg(
            F.max(F.when(~is_post, pair)).alias("_pre"),
            F.max(F.when(is_post, pair)).alias("_post"),
        )
        .filter(~F.col("_pre").eqNullSafe(F.col("_post")))
        .transform(ckpt_shared)
    )
    adds = pairs.filter(F.col("_post").isNotNull()).select(
        F.col("_post.u").alias("u"), F.col("_post.v").alias("v")
    )
    dels = pairs.filter(F.col("_pre").isNotNull()).select(
        F.col("_pre.u").alias("u"), F.col("_pre.v").alias("v")
    )
    if old_labels is None:
        base_edges = edge_store.read(version=v_from).select(
            F.col(src).alias("u"), F.col(dst).alias("v")
        )
        cc0 = connected_components(base_edges, "u", "v")
        prior = cc0.select(
            F.col("node").alias("_on"), F.col("cluster").alias("_oc")
        )
    else:
        prior = old_labels.select(
            F.col("node").alias("_on"), F.col("cluster").alias("_oc")
        )
    # Re-base onto the CURRENT universe: new nodes enter as singletons
    # (a fed-back view has never seen them — review finding), departed
    # nodes drop.
    old_labels = (
        nodes.join(prior, nodes["node"] == F.col("_on"), "left")
        .select(
            nodes["node"],
            F.coalesce(F.col("_oc"), nodes["node"]).alias("cluster"),
        )
        .transform(ckpt_shared)
    )

    # -- Phase 1: adds merge at CLUSTER grain ------------------------------
    lbl = old_labels.select(
        F.col("node").alias("_ln"), F.col("cluster").alias("_lc")
    )
    cluster_edges = (
        adds.join(lbl, F.col("u") == F.col("_ln"), "left")
        .select(F.coalesce("_lc", "u").alias("cu"), "v")
        .join(lbl, F.col("v") == F.col("_ln"), "left")
        .select("cu", F.coalesce("_lc", "v").alias("cv"))
    )
    # The cluster-id graph is O(feed); its CC gives old-cluster ->
    # merged-root (roots are min cluster ids == min member ids).
    mapping = connected_components(cluster_edges, "cu", "cv").select(
        F.col("node").alias("_mc"), F.col("cluster").alias("_mroot")
    )
    labels1 = (
        old_labels.join(mapping, F.col("cluster") == F.col("_mc"), "left")
        .select(
            "node", F.coalesce("_mroot", "cluster").alias("cluster")
        )
        .transform(ckpt_shared)
    )
    if dels.isEmpty():
        return labels1

    # -- Phase 2: deletes recompute their (post-merge) clusters ------------
    del_nodes = (
        dels.select(F.col("u").alias("_dn"))
        .union(dels.select(F.col("v").alias("_dn")))
        .distinct()
    )
    affected = (
        labels1.join(del_nodes, F.col("node") == F.col("_dn"), "left_semi")
        .select(F.col("cluster").alias("_ac"))
        .distinct()
    )
    sub_nodes = labels1.join(
        affected, F.col("cluster") == F.col("_ac"), "left_semi"
    ).select("node")
    # Components are label-closed, so pruning on ONE endpoint suffices
    # (the other endpoint's cluster is the same).
    post_edges = edge_store.read(version=v_to).select(
        F.col(src).alias("u"), F.col(dst).alias("v")
    )
    sub_edges = post_edges.join(
        sub_nodes.select(F.col("node").alias("_sn")),
        F.col("u") == F.col("_sn"),
        "left_semi",
    )
    # Self-edges keep now-isolated nodes in the recomputed universe.
    fresh = connected_components(
        sub_edges.unionByName(
            sub_nodes.select(F.col("node").alias("u"), F.col("node").alias("v"))
        ),
        "u",
        "v",
    )
    untouched = labels1.join(
        sub_nodes.select(F.col("node").alias("_sn")),
        F.col("node") == F.col("_sn"),
        "left_anti",
    )
    return untouched.unionByName(fresh.select("node", "cluster"))
