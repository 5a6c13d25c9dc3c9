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
    e = exact.select("query_id", "neighbor_id")
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
