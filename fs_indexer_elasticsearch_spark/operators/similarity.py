"""Embedding similarity search.

Two paths:
 - brute-force cosine top-k: broadcast the query set, fold-based dot
   products, per-query window top-k. Exact; cost O(corpus × queries).
 - LSH-bucketed ANN: sign-random-projection bucket codes (derived
   deterministically from md5, no stored planes), equi-join on the
   bucket → only same-bucket candidates are scored. At 100 TB the
   bucket join replaces the cross join; recall is tunable via
   num_planes (fewer planes → bigger buckets) and multi-probe.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

from ..tables import ckpt_shared

from ..functions.vectors import cosine, lsh_bucket
from ..functions.rounding import stable_round


def _ranked_topk(scored: DataFrame, k: int) -> DataFrame:
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("query_id", "neighbor_id", "cos_sim")
    )


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    *,
    k: int = 3,
) -> DataFrame:
    """Exact cosine top-k: (query_id, neighbor_id, cos_sim).

    ``queries`` must be small (it is broadcast). Similarities are
    stable_round(6)-ed before ranking with an id tiebreak so the
    selected set is engine-stable.
    """
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qvec")
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("nvec")
    )
    scored = (
        c.join(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            stable_round(cosine("qvec", "nvec"), 6).alias("cos_sim"),
        )
    )
    return _ranked_topk(scored, k)


def assign_cells(
    df: DataFrame,
    centroids: DataFrame,
    id_col: str,
    vec_col: str,
    out_id: str,
    out_vec: str,
    n_keep: int,
    keep: tuple[str, ...] = (),
) -> DataFrame:
    """Assign each vector to its ``n_keep`` nearest-centroid cells:
    one 1-row array of (cid, cvec) — the broadcast cross join hands
    every row ALL centroids in-row, so the per-row top-n_keep is a
    pure projection (array_sort + slice), a NARROW stage with no
    shuffle. The previous shape (broadcast join to centroid ROWS +
    row_number window partitioned by vector id) shuffled and sorted
    corpus×centroids rows — an O(table) exchange this function
    explicitly avoids (round-6 review finding; same pattern as
    clustering.assign_clusters). Ordering: struct(-csim, cid)
    ascending == (csim desc, cid asc). Shared by the one-shot
    ivf_ann_topk and the persisted IvfIndexStore
    (operators/incremental_ann.py) so batch and incremental builds
    assign identically by construction."""
    c_arr = centroids.select(
        F.col(id_col).alias("cid"), F.col(vec_col).alias("cvec")
    ).agg(F.collect_list(F.struct("cid", "cvec")).alias("_cs"))
    ranked = F.array_sort(
        F.transform(
            F.col("_cs"),
            lambda cc: F.struct(
                (-stable_round(cosine(F.col(out_vec), cc["cvec"]), 6)).alias(
                    "negsim"
                ),
                cc["cid"].alias("cid"),
            ),
        )
    )
    # ``keep``: extra input columns carried through the projection
    # unchanged (e.g. a visibility seq a maintenance re-assignment
    # must preserve) — a pass-through, NOT a join, so the stage stays
    # narrow.
    ex = [F.col(c) for c in keep]
    base = df.select(
        F.col(id_col).alias(out_id), F.col(vec_col).alias(out_vec), *ex
    ).join(F.broadcast(c_arr))
    if n_keep == 1:
        # Argmin fast path (r14, for the 10⁵-cell regime): array_min
        # of the (negsim, cid) structs is the sort's first element
        # with IDENTICAL tie semantics (struct compare), at O(k) per
        # row instead of the full O(k log k) sort — the path every
        # seed/add/maintenance assignment takes.
        arg = F.array_min(
            F.transform(
                F.col("_cs"),
                lambda cc: F.struct(
                    (
                        -stable_round(cosine(F.col(out_vec), cc["cvec"]), 6)
                    ).alias("negsim"),
                    cc["cid"].alias("cid"),
                ),
            )
        )
        return base.select(
            out_id, out_vec, *keep, arg["cid"].alias("cid")
        )
    return base.select(
        out_id,
        out_vec,
        *keep,
        F.explode(F.slice(ranked, 1, n_keep)).alias("_b"),
    ).select(out_id, out_vec, *keep, F.col("_b.cid").alias("cid"))


def ivf_ann_topk(
    corpus: DataFrame,
    queries: DataFrame,
    centroids: DataFrame,
    id_col: str,
    vec_col: str,
    *,
    k: int = 3,
    nprobe: int = 2,
) -> DataFrame:
    """IVF (inverted-file) ANN: every corpus vector is assigned to its
    nearest centroid (one broadcast pass); a query scores only vectors
    in its ``nprobe`` nearest centroid cells.

    ``centroids`` is caller-provided (id_col, vec_col) — here a
    deterministic seed subset; production would k-means them. At 100 TB
    the assign pass is a broadcast argmin (no shuffle) and the search
    join shuffles on the small centroid-id key.
    """
    corpus_cells = assign_cells(corpus, centroids, id_col, vec_col,
                                "neighbor_id", "nvec", 1)
    query_cells = assign_cells(queries, centroids, id_col, vec_col,
                               "query_id", "qvec", nprobe)
    scored = (
        corpus_cells.join(F.broadcast(query_cells), "cid")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .dropDuplicates(["query_id", "neighbor_id"])
        .select(
            "query_id",
            "neighbor_id",
            stable_round(cosine("qvec", "nvec"), 6).alias("cos_sim"),
        )
    )
    return _ranked_topk(scored, k)


def recall_against(approx: DataFrame, exact: DataFrame, label: str) -> DataFrame:
    """Recall@k of an approximate top-k result against exact ground
    truth: |approx ∩ exact| / |exact|, both (query_id, neighbor_id)
    sets. One equi-join on the id pair + two 1-row aggregates — the
    metric costs nothing next to the searches it grades. Returns a
    single row (method, n_queries, n_truth, n_hits, recall_at_k)."""
    # ``exact`` is consumed twice (the totals row and the hit join) and
    # is typically the brute-force O(corpus × queries) truth scan —
    # without a checkpoint every recall query computed its ground truth
    # TWICE (guide §7.2: duplicated subtrees). EAGER, deliberately: a
    # lazy checkpoint materializes on first touch, and when both
    # consumers run inside one action their tasks RACE on the same
    # blocks and each computes the subtree anyway ("Block rdd_N already
    # exists" — measured as a regression, not a win, in this round's
    # interleaved A/B). Eager spends one k-row job at build time and
    # guarantees every consumer reads blocks.
    e = exact.select("query_id", "neighbor_id").transform(ckpt_shared)
    a = approx.select("query_id", "neighbor_id")
    tot = e.agg(
        F.count(F.lit(1)).alias("n_truth"),
        F.countDistinct("query_id").alias("n_queries"),
    )
    hits = e.join(a, ["query_id", "neighbor_id"]).agg(
        F.count(F.lit(1)).alias("n_hits")
    )
    return (
        hits.join(F.broadcast(tot))
        .select(
            F.lit(label).alias("method"),
            F.col("n_queries").cast("long").alias("n_queries"),
            F.col("n_truth").cast("long").alias("n_truth"),
            F.col("n_hits").cast("long").alias("n_hits"),
            stable_round(
                F.col("n_hits").cast("double") / F.col("n_truth"), 4
            ).alias("recall_at_k"),
        )
    )


def lsh_ann_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    *,
    k: int = 3,
    num_planes: int = 8,
    num_tables: int = 1,
) -> DataFrame:
    """Approximate cosine top-k via sign-projection LSH buckets: only
    candidates sharing a bucket with the query (in ANY of the
    ``num_tables`` independent tables — the OR-construction that
    trades candidate volume for recall) are scored. Deterministic
    (hyperplanes derived from md5) → oracle-reproducible."""

    def coded(df: DataFrame, out_id: str, out_vec: str) -> DataFrame:
        buckets = F.array(
            *[
                F.struct(
                    F.lit(t).alias("t"),
                    lsh_bucket(vec_col, num_planes, table=t).alias("code"),
                )
                for t in range(num_tables)
            ]
        )
        return df.select(
            F.col(id_col).alias(out_id),
            F.col(vec_col).alias(out_vec),
            F.explode(buckets).alias("bk"),
        ).select(out_id, out_vec, "bk.t", "bk.code")

    q = coded(queries, "query_id", "qvec")
    c = coded(corpus, "neighbor_id", "nvec")
    cands = (
        c.join(F.broadcast(q), ["t", "code"])
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "qvec", "neighbor_id", "nvec")
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    scored = cands.select(
        "query_id",
        "neighbor_id",
        stable_round(cosine("qvec", "nvec"), 6).alias("cos_sim"),
    )
    return _ranked_topk(scored, k)


def lsh_multiprobe_ann_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    *,
    k: int = 1,
    num_planes: int = 10,
    num_tables: int = 4,
) -> DataFrame:
    """Multi-probe LSH ANN (Lv et al., VLDB'07): in addition to its
    own bucket, each QUERY probes every bucket at Hamming distance 1
    in code space (the planes most likely to have flipped for a true
    near neighbor). Per table, a near-dup with per-bit agreement q is
    caught with probability q^P + P·q^(P-1)(1-q) instead of q^P — so
    the same recall needs FEWER tables at MORE planes: 4x10+probes
    matches the 8x8 exact construction's recall while storing HALF the
    index rows per corpus vector and computing 40 instead of 64 plane
    projections. Probing expands only the query side (queries are the
    small, broadcast side); the corpus index stays one row per
    (vector, table)."""

    def coded(df: DataFrame, out_id: str, out_vec: str) -> DataFrame:
        buckets = F.array(
            *[
                F.struct(
                    F.lit(t).alias("t"),
                    lsh_bucket(vec_col, num_planes, table=t).alias("code"),
                )
                for t in range(num_tables)
            ]
        )
        return df.select(
            F.col(id_col).alias(out_id),
            F.col(vec_col).alias(out_vec),
            F.explode(buckets).alias("bk"),
        ).select(out_id, out_vec, "bk.t", "bk.code")

    qc = coded(queries, "query_id", "qvec")
    # Probe set: the exact code plus its P one-bit flips.
    probes = F.array(
        F.col("code"),
        *[
            F.col("code").bitwiseXOR(F.lit(1 << j).cast("long"))
            for j in range(num_planes)
        ],
    )
    q = qc.select(
        "query_id", "qvec", "t", F.explode(probes).alias("code")
    )
    c = coded(corpus, "neighbor_id", "nvec")
    cands = (
        c.join(F.broadcast(q), ["t", "code"])
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "qvec", "neighbor_id", "nvec")
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    scored = cands.select(
        "query_id",
        "neighbor_id",
        stable_round(cosine("qvec", "nvec"), 6).alias("cos_sim"),
    )
    return _ranked_topk(scored, k)


def ivfpq_ann_topk(
    corpus: DataFrame,
    queries: DataFrame,
    centroids: DataFrame,
    codebook_src: DataFrame,
    id_col: str,
    vec_col: str,
    *,
    dim: int = 64,
    m: int = 16,
    dsub: int = 4,
    k: int = 3,
    nprobe: int = 2,
    shortlist: int = 50,
) -> DataFrame:
    """IVF-PQ (IVFADC, Jégou et al.): the composed memory-bound scale
    path for 100 TB ANN — a coarse inverted-file quantizer prunes the
    candidate set to ``nprobe`` cells, product quantization compresses
    each candidate's RESIDUAL (vector − its cell centroid) to ``m``
    4-bit codes, a query scores candidates by summing ``m`` precomputed
    residual-LUT entries (asymmetric distance computation — the floats
    are never touched during the scan), and only a ``shortlist``-deep
    prefix is re-ranked with exact float L2. vs the flat-PQ serving
    path (plans/llm_pipeline5.quantized_ann_pq_topk) this adds the two
    IVFADC ingredients that matter at scale: the scan visits only
    probed cells (nprobe/C of the corpus instead of all of it), and
    quantizing residuals instead of raw vectors removes the coarse
    cell's offset from what PQ must encode, so the same code budget
    spends on finer detail.

    Distributed shape — keyed equi-joins only, nothing quadratic:
    coarse assignment is assign_cells' narrow broadcast-argmin pass;
    residuals are a broadcast join on the centroid id + zip_with
    projection; encode is the subvector frame equi-joined on subspace
    id against the broadcast codebook (m·16 rows) with a hash-agg
    argmin; the LUT is per (query, probed cell) — nprobe·m·16 rows per
    query, broadcast; ADC is one equi-join on (cell, subspace, code)
    + hash-agg sum; rerank fetches floats for shortlist/N of the
    corpus by id. Codebooks here are deterministic (the residual
    subvectors of the ``codebook_src`` rows — the random-sample
    baseline from the PQ literature) so the full cascade is
    reproducible in ANSI SQL for the driver gate; production swaps in
    k-means-refined codewords without touching the serving algebra.

    Engine stability: subspace distances are sequential folds (bit-
    identical doubles in Spark and DuckDB), so code assignments cannot
    diverge; the m-term ADC sum and the final L2 are flattened with
    stable_round before every rank cut.
    """
    cv = centroids.select(F.col(id_col).alias("cid"), F.col(vec_col).alias("cv"))
    # Optimization round r14 — the original wiring consumed the coarse
    # assignment three times (residual encode, the ADC scan's cell
    # lookup, and — through the residual subframe — the codebook
    # build), and Spark duplicates a reused subtree per consumer: the
    # physical plan scanned the corpus parquet 18 times and re-ran the
    # broadcast-argmin assignment with every scan (guide §7.2). The
    # fix is structural, not materialization (an interleaved A/B
    # measured lazy localCheckpoints SLOWER at sf0.1 — three extra
    # barrier jobs against a tiny corpus — and only 2× better at 10×
    # data than this shape): (1) the codebook is derived from a
    # semi-join-PRUNED 16-row corpus slice instead of the full
    # residual frame, (2) ``codes`` carries the cell id through its
    # group-by (cid is functionally determined by neighbor_id, so the
    # groups are unchanged), which deletes the corpus_cells re-join in
    # the ADC scan. The corpus-side pipeline is now one linear chain:
    # scan → assign → residual → explode → encode → ADC → shortlist.
    corpus_cells = assign_cells(
        corpus, centroids, id_col, vec_col, "neighbor_id", "nvec", 1
    )
    sub_d2 = F.aggregate(
        F.zip_with(F.col("sub"), F.col("cw"), lambda a, b: (a - b) * (a - b)),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )

    def subframe(df: DataFrame, keep: list[str]) -> DataFrame:
        # residual subvector frame: one row per (vector, subspace)
        return df.select(
            *keep,
            F.explode(F.sequence(F.lit(0), F.lit(m - 1))).alias("s"),
            F.col("r"),
        ).select(*keep, "s", F.slice("r", F.col("s") * dsub + 1, dsub).alias("sub"))

    res = corpus_cells.join(F.broadcast(cv), "cid").select(
        "neighbor_id",
        "cid",
        F.zip_with("nvec", "cv", lambda a, b: a - b).alias("r"),
    )
    rsub = subframe(res, ["neighbor_id", "cid"])
    # Deterministic shared residual codebook: the residual subvectors
    # of the codebook_src ids, renumbered 0..15 by id rank (dense, so
    # the code domain is exactly [0, 16) regardless of which ids the
    # caller sampled). Built from its OWN pruned corpus slice (the
    # semi-join keeps only the 16 codebook rows before any residual
    # work) — same rows as filtering the full residual frame, without
    # hanging a second consumer off the corpus-wide pipeline.
    src_ranked = (
        codebook_src.select(F.col(id_col).alias("_sid"))
        .distinct()
        .agg(F.array_sort(F.collect_list("_sid")).alias("_ids"))
        .select(F.posexplode("_ids").alias("j", "_sid"))
    )
    cb_slice = corpus.join(
        F.broadcast(src_ranked.select(F.col("_sid").alias(id_col))),
        id_col,
        "left_semi",
    )
    cb_res = (
        assign_cells(cb_slice, centroids, id_col, vec_col, "neighbor_id", "nvec", 1)
        .join(F.broadcast(cv), "cid")
        .select(
            "neighbor_id",
            F.zip_with("nvec", "cv", lambda a, b: a - b).alias("r"),
        )
    )
    cb = (
        subframe(cb_res, ["neighbor_id"])
        .join(
            F.broadcast(src_ranked),
            F.col("neighbor_id") == src_ranked["_sid"],
        )
        .select("j", "s", F.col("sub").alias("cw"))
    )
    codes = (
        rsub.join(F.broadcast(cb), "s")
        .select("neighbor_id", "cid", "s", sub_d2.alias("d2"), "j")
        .groupBy("neighbor_id", "cid", "s")
        .agg(F.min(F.struct("d2", "j")).alias("best"))
        .select("neighbor_id", "cid", "s", F.col("best.j").alias("code"))
    )
    query_cells = assign_cells(
        queries, centroids, id_col, vec_col, "query_id", "qvec", nprobe
    )
    qres = query_cells.join(F.broadcast(cv), "cid").select(
        "query_id",
        "cid",
        F.zip_with("qvec", "cv", lambda a, b: a - b).alias("r"),
    )
    lut = (
        subframe(qres, ["query_id", "cid"])
        .join(F.broadcast(cb), "s")
        .select("query_id", "cid", "s", "j", sub_d2.alias("d2"))
    )
    lut_q = lut.select(
        "query_id",
        F.col("cid").alias("qcid"),
        F.col("s").alias("qs"),
        F.col("j").alias("qj"),
        "d2",
    )
    scored = (
        codes.join(
            F.broadcast(lut_q),
            (F.col("cid") == F.col("qcid"))
            & (F.col("s") == F.col("qs"))
            & (F.col("code") == F.col("qj")),
        )
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .groupBy("query_id", "neighbor_id")
        .agg(stable_round(F.sum("d2"), 6).alias("adc_d2"))
    )
    ws = Window.partitionBy("query_id").orderBy("adc_d2", "neighbor_id")
    short = (
        scored.withColumn("rn", F.row_number().over(ws))
        .filter(F.col("rn") <= shortlist)
        .select("query_id", "neighbor_id")
    )
    exact_d2 = F.aggregate(
        F.zip_with(F.col("qe"), F.col("ne"), lambda a, b: (a - b) * (a - b)),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    rerank = (
        short.join(
            F.broadcast(
                queries.select(
                    F.col(id_col).alias("query_id"), F.col(vec_col).alias("qe")
                )
            ),
            "query_id",
        )
        .join(
            corpus.select(
                F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("ne")
            ),
            "neighbor_id",
        )
        .select("query_id", "neighbor_id", stable_round(exact_d2, 6).alias("l2_d2"))
    )
    wr = Window.partitionBy("query_id").orderBy("l2_d2", "neighbor_id")
    return (
        rerank.withColumn("rn", F.row_number().over(wr))
        .filter(F.col("rn") <= k)
        .select("query_id", "neighbor_id", "l2_d2")
    )
