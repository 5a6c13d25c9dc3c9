"""LLM-training-data pipeline queries: deduplication, similarity
search, text analysis, multimodal binary plumbing — first-class engine
extensions beyond the reference's surface (BASELINE.json north star).

The documents corpus carries no planted duplicates, so the dedup
queries build an augmented corpus in-query (exact copies for
doc_id%10, 60%-prefix truncations for doc_id%7) — identical
construction in both engines, so the oracle checks real dedup hits.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..functions.text import (
    EN_STOPWORDS,
    MINHASH_AB,
    MINHASH_P,
    rolling_fingerprint,
    tokens,
)
from ..operators.dedup import (
    connected_components,
    exact_duplicates,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash_pairs,
)
from ..operators.similarity import brute_force_topk, lsh_ann_topk
from ..tables import ckpt_shared, load, spread_small
from .registry import query, stable_round

# --------------------------------------------------------------------------
# Augmented dedup corpus (shared by the three dedup queries)
# --------------------------------------------------------------------------

_CORPUS_SQL = """
    WITH base AS (SELECT doc_id, text FROM documents),
    corpus AS (
        SELECT doc_id, text FROM base
        UNION ALL
        SELECT doc_id + 1000000000000, text FROM base WHERE doc_id % 10 = 0
        UNION ALL
        SELECT doc_id + 2000000000000,
               array_to_string(tk[1:CAST(ceil(len(tk) * 0.6) AS INT)], ' ') AS text
        FROM (
            SELECT doc_id,
                   list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
                               x -> x <> '') AS tk
            FROM base
        )
        WHERE doc_id % 7 = 0 AND len(tk) >= 5
    )
"""

_TOKS_SQL = """
    , toks AS (
        SELECT doc_id,
               list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
                           x -> x <> '') AS tk
        FROM corpus
    )
"""

_SHINGLES_SQL = (
    _TOKS_SQL
    + """
    , sh AS (
        SELECT doc_id AS sid,
               CASE WHEN len(tk) >= 3
                    THEN list_distinct(list_transform(
                             range(1, len(tk) - 1),
                             i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2]))
                    ELSE [array_to_string(tk, ' ')] END AS shingles
        FROM toks
    )
"""
)


def _aug_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    base = load(spark, sf_dir, "documents").select("doc_id", "text")
    copies = base.filter(F.col("doc_id") % 10 == 0).select(
        (F.col("doc_id") + 1_000_000_000_000).alias("doc_id"), "text"
    )
    tk = tokens(F.col("text"))
    truncs = (
        base.select("doc_id", tk.alias("tk"))
        .filter((F.col("doc_id") % 7 == 0) & (F.size("tk") >= 5))
        .select(
            (F.col("doc_id") + 2_000_000_000_000).alias("doc_id"),
            F.array_join(
                F.slice(
                    F.col("tk"),
                    F.lit(1),
                    F.ceil(F.size("tk") * 0.6).cast("int"),
                ),
                " ",
            ).alias("text"),
        )
    )
    return base.unionByName(copies).unionByName(truncs)


@query(
    "dedup_exact",
    oracle=_CORPUS_SQL
    + """
    SELECT md5(text) AS content_hash, min(doc_id) AS keeper_id, count(*) AS n_dups
    FROM corpus WHERE text IS NOT NULL
    GROUP BY md5(text) HAVING count(*) > 1
    """,
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: hash-groupBy on md5(content) — one shuffle on the
    16-byte hash with map-side combine; at 100 TB this is the cheapest
    possible full-corpus dedup."""
    return exact_duplicates(_aug_corpus(spark, sf_dir), "doc_id", "text")


# The 16 permutation expressions, generated from the SAME (a, b)
# constant table the Spark side uses (functions.text.MINHASH_AB) —
# one md5 per shingle, integer arithmetic per permutation.
_MINHASH_SIG_ITEMS = ", ".join(
    f"list_min(list_transform(hb, h -> ({a} * h + {b}) % {MINHASH_P}))"
    for a, b in MINHASH_AB
)


@query(
    "dedup_minhash_lsh",
    oracle=_CORPUS_SQL
    + _SHINGLES_SQL
    + f"""
    , hbase AS (
        SELECT sid, shingles,
               list_transform(shingles,
                   s -> ('0x' || substr(md5(s), 1, 8))::BIGINT % {MINHASH_P}) AS hb
        FROM sh
    ),
    sig AS (
        SELECT sid, shingles, [{_MINHASH_SIG_ITEMS}] AS sg
        FROM hbase
    ),"""
    + """
    bands AS (
        SELECT sid, b, md5(array_to_string(sg[(4*b+1):(4*b+4)], '|')) AS h
        FROM sig, (SELECT unnest(range(0, 4)) AS b)
    ),
    cands AS (
        SELECT DISTINCT a.sid AS id_a, b.sid AS id_b
        FROM bands a JOIN bands b ON a.b = b.b AND a.h = b.h AND a.sid < b.sid
    )
    SELECT id_a, id_b, jaccard FROM (
        SELECT id_a, id_b,
               round(len(list_intersect(x.shingles, y.shingles))::DOUBLE
                     / (len(x.shingles) + len(y.shingles)
                        - len(list_intersect(x.shingles, y.shingles))) + 1e-7,
                     3) AS jaccard
        FROM cands JOIN sh x ON cands.id_a = x.sid JOIN sh y ON cands.id_b = y.sid
    ) WHERE jaccard >= 0.5
    """,
)
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash(16)+LSH(4×4) near-dup pairs with exact-Jaccard verify.
    Candidate generation shuffles on (band, hash) buckets — never the
    cross product — and verification touches candidates only."""
    return minhash_lsh_pairs(
        _aug_corpus(spark, sf_dir), "doc_id", "text",
        num_hashes=16, bands=4, shingle_n=3, threshold=0.5,
    )


# The full minhash chain (corpus → shingles → signatures → bands →
# verified pairs) re-stated for the connected-components oracle, which
# needs the WHOLE WITH clause declared RECURSIVE for the closure step.
_MINHASH_PAIRS_SQL = (
    _CORPUS_SQL.replace("WITH base", "WITH RECURSIVE base", 1)
    + _SHINGLES_SQL
    + f"""
    , hbase AS (
        SELECT sid, shingles,
               list_transform(shingles,
                   s -> ('0x' || substr(md5(s), 1, 8))::BIGINT % {MINHASH_P}) AS hb
        FROM sh
    ),
    sig AS (
        SELECT sid, shingles, [{_MINHASH_SIG_ITEMS}] AS sg
        FROM hbase
    ),"""
    + """
    bands AS (
        SELECT sid, b, md5(array_to_string(sg[(4*b+1):(4*b+4)], '|')) AS h
        FROM sig, (SELECT unnest(range(0, 4)) AS b)
    ),
    cands AS (
        SELECT DISTINCT a.sid AS id_a, b.sid AS id_b
        FROM bands a JOIN bands b ON a.b = b.b AND a.h = b.h AND a.sid < b.sid
    ),
    pairs AS (
        SELECT id_a, id_b FROM (
            SELECT id_a, id_b,
                   round(len(list_intersect(x.shingles, y.shingles))::DOUBLE
                         / (len(x.shingles) + len(y.shingles)
                            - len(list_intersect(x.shingles, y.shingles))) + 1e-7,
                         3) AS jaccard
            FROM cands JOIN sh x ON cands.id_a = x.sid JOIN sh y ON cands.id_b = y.sid
        ) WHERE jaccard >= 0.5
    )
"""
)


@query(
    "dedup_connected_components",
    oracle=_MINHASH_PAIRS_SQL
    + """
    , edges AS (
        SELECT id_a AS u, id_b AS v FROM pairs
        UNION
        SELECT id_b AS u, id_a AS v FROM pairs
    ),
    reach(node, label) AS (
        SELECT u, u FROM (SELECT DISTINCT u FROM edges)
        UNION
        SELECT e.v, r.label FROM reach r JOIN edges e ON e.u = r.node
    ),
    cc AS (SELECT node AS doc_id, min(label) AS cluster_id FROM reach GROUP BY node)
    SELECT doc_id, cluster_id,
           count(*) OVER (PARTITION BY cluster_id) AS cluster_size
    FROM cc
    """,
)
def dedup_connected_components_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup CLUSTER assignment: MinHash-LSH pairs are edges of a
    similarity graph; alternating large-star/small-star connected
    components (O(log n) rounds of join+groupBy-min, no neighbor
    arrays) labels every duplicate with its cluster's min doc_id —
    the transitive-closure step that turns pairwise dedup into
    keep-one-representative dedup. Oracle: the same LSH pair chain
    plus a recursive min-label-reachability CTE."""
    pairs = minhash_lsh_pairs(
        _aug_corpus(spark, sf_dir), "doc_id", "text",
        num_hashes=16, bands=4, shingle_n=3, threshold=0.5,
    ).select("id_a", "id_b")
    cc = connected_components(pairs, "id_a", "id_b")
    from pyspark.sql import Window

    return cc.select(
        F.col("node").alias("doc_id"),
        F.col("cluster").alias("cluster_id"),
        F.count(F.lit(1))
        .over(Window.partitionBy("cluster"))
        .alias("cluster_size"),
    )


@query(
    "dedup_simhash",
    oracle=_CORPUS_SQL
    + _TOKS_SQL
    + """
    , dtoks AS (SELECT doc_id AS sid, list_distinct(tk) AS tk FROM toks),
    hsh AS (SELECT sid, list_transform(tk, t -> md5(t)) AS mh FROM dtoks),
    words AS (
        SELECT sid,
               list_transform(mh, s -> ('0x' || substr(s, 1, 8))::BIGINT) AS th_lo,
               list_transform(mh, s -> ('0x' || substr(s, 9, 8))::BIGINT) AS th_hi
        FROM hsh
    ),
    sim AS (
        SELECT sid,
               list_sum(list_transform(range(0, 32), j ->
                   CASE WHEN 2 * len(list_filter(th_lo, h -> ((h >> j) & 1) = 1))
                          > len(th_lo)
                        THEN (1::BIGINT << j) ELSE 0::BIGINT END))::BIGINT AS lo,
               list_sum(list_transform(range(0, 32), j ->
                   CASE WHEN 2 * len(list_filter(th_hi, h -> ((h >> j) & 1) = 1))
                          > len(th_hi)
                        THEN (1::BIGINT << j) ELSE 0::BIGINT END))::BIGINT AS hi
        FROM words
    ),
    bands AS (
        SELECT sid, lo, hi, b,
               CASE WHEN b < 4 THEN (lo >> (8 * b)) & 255
                    ELSE (hi >> (8 * (b - 4))) & 255 END AS h
        FROM sim, (SELECT unnest(range(0, 8)) AS b)
    ),
    pairs AS (
        SELECT DISTINCT a.sid AS id_a, b.sid AS id_b,
               CAST(bit_count(xor(a.lo, b.lo)) + bit_count(xor(a.hi, b.hi)) AS INT) AS hamming
        FROM bands a JOIN bands b ON a.b = b.b AND a.h = b.h AND a.sid < b.sid
    )
    SELECT hamming, count(*) AS n_pairs, min(id_a) AS sample_id_a, min(id_b) AS sample_id_b
    FROM pairs WHERE hamming <= 6
    GROUP BY hamming
    """,
)
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """64-bit SimHash near-dup detection: 8×8-bit band blocking (exact
    recall to Hamming 7 by pigeonhole) + Hamming verify
    (bit_count(xor) summed over the two 32-bit fingerprint words) on
    candidates. The synthetic word-bag corpus collides heavily at low
    Hamming distance, so the declared query reports the pair histogram
    (bounded at every SF); the operator itself
    (operators/dedup.simhash_pairs) emits the pairs."""
    pairs = simhash_pairs(_aug_corpus(spark, sf_dir), "doc_id", "text", max_hamming=6)
    return pairs.groupBy("hamming").agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.min("id_a").alias("sample_id_a"),
        F.min("id_b").alias("sample_id_b"),
    )


@query(
    "ngram_jaccard_pairs",
    oracle="""
    WITH sub AS (SELECT doc_id, lang, text FROM documents WHERE doc_id % 4 = 0),
    t AS (
        SELECT doc_id AS sid, lang AS blk,
               list_distinct(list_filter(
                   regexp_split_to_array(lower(text), '[^a-z0-9]+'),
                   x -> x <> '')) AS toks
        FROM sub
    )
    SELECT id_a, id_b, jaccard FROM (
        SELECT a.sid AS id_a, b.sid AS id_b,
               round(len(list_intersect(a.toks, b.toks))::DOUBLE
                     / (len(a.toks) + len(b.toks)
                        - len(list_intersect(a.toks, b.toks))) + 1e-7, 3) AS jaccard
        FROM t a JOIN t b ON a.blk = b.blk AND a.sid < b.sid
    ) WHERE jaccard >= 0.9
    """,
)
def ngram_jaccard_pairs_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact unigram-set Jaccard within language blocks (bounded
    quadratic — the LSH paths are the unbounded-scale route)."""
    sub = load(spark, sf_dir, "documents").filter(F.col("doc_id") % 4 == 0)
    return ngram_jaccard_pairs(sub, "doc_id", "text", block_col="lang", threshold=0.9)


# --------------------------------------------------------------------------
# Text analysis
# --------------------------------------------------------------------------

_SW_SQL = "[" + ", ".join(f"'{w}'" for w in EN_STOPWORDS) + "]"


@query(
    "text_quality_stats",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, text,
               list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
                           x -> x <> '') AS tk
        FROM documents WHERE doc_id % 5 = 0
    )
    SELECT doc_id,
           len(tk) AS n_tokens,
           len(list_distinct(tk)) AS n_distinct,
           round(CASE WHEN len(tk) > 0
                      THEN len(list_filter(tk, t -> list_contains({_SW_SQL}, t)))::DOUBLE
                           / len(tk)
                      ELSE 0 END + 1e-7, 4) AS sw_ratio,
           round(greatest(0.0, least(1.0,
                 0.5 * least(len(tk) / 100.0, 1.0)
               + 0.5 * (CASE WHEN len(tk) > 0
                             THEN len(list_filter(tk, t -> list_contains({_SW_SQL}, t)))::DOUBLE
                                  / len(tk)
                             ELSE 0 END) * 2
               - (length(text) - length(regexp_replace(text, '[^\\w\\s]', '', 'g')))::DOUBLE
                 / length(text)
           )) + 1e-7, 4) AS quality
    FROM toks
    """,
)
def text_quality_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pre-training quality gates: token counts, stopword ratio,
    composite quality score — pure columnar expressions over a
    token array materialized ONCE (inlining tokens() into each stat
    would re-run the regex split per reference)."""
    d = load(spark, sf_dir, "documents").filter(F.col("doc_id") % 5 == 0)
    staged = d.select("doc_id", "text", tokens(F.col("text")).alias("tk"))
    n = F.size("tk")
    sw = F.size(F.filter(F.col("tk"), lambda t: t.isin(*EN_STOPWORDS)))
    swr = F.when(n > 0, sw / n).otherwise(F.lit(0.0))
    punct = (
        F.length("text") - F.length(F.regexp_replace("text", r"[^\w\s]", ""))
    ) / F.length("text")
    quality = F.greatest(
        F.lit(0.0),
        F.least(F.lit(1.0), 0.5 * F.least(n / F.lit(100.0), F.lit(1.0)) + 0.5 * swr * 2 - punct),
    )
    return staged.select(
        "doc_id",
        n.alias("n_tokens"),
        F.size(F.array_distinct("tk")).alias("n_distinct"),
        stable_round(swr, 4).alias("sw_ratio"),
        stable_round(quality, 4).alias("quality"),
    )


@query(
    "lang_id_confusion",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, lang,
               list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
                           x -> x <> '') AS tk
        FROM documents
    )
    SELECT lang,
           CASE WHEN len(tk) > 0
                 AND len(list_filter(tk, t -> list_contains({_SW_SQL}, t)))::DOUBLE
                     / len(tk) >= 0.08
                THEN 'en' ELSE 'und' END AS guess,
           count(*) AS n
    FROM toks GROUP BY 1, 2
    """,
)
def lang_id_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword-heuristic language ID vs the labeled lang column —
    the n-gram-heuristic family from the LLM-pipeline extension set."""
    d = load(spark, sf_dir, "documents")
    staged = d.select("lang", tokens(F.col("text")).alias("tk"))
    n = F.size("tk")
    sw = F.size(F.filter(F.col("tk"), lambda t: t.isin(*EN_STOPWORDS)))
    swr = F.when(n > 0, sw / n).otherwise(F.lit(0.0))
    guess = F.when(swr >= 0.08, F.lit("en")).otherwise(F.lit("und"))
    return staged.groupBy("lang", guess.alias("guess")).agg(
        F.count(F.lit(1)).alias("n")
    )


@query(
    "doc_fingerprints",
    oracle="""
    WITH toks AS (
        SELECT doc_id,
               list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
                           x -> x <> '') AS tk
        FROM documents WHERE doc_id % 25 = 0
    )
    SELECT doc_id,
           CASE WHEN len(tk) >= 4
                THEN list_min(list_transform(range(1, len(tk) - 2),
                         i -> md5(tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2]
                                  || ' ' || tk[i+3])))
                ELSE md5(array_to_string(tk, ' ')) END AS fingerprint
    FROM toks
    """,
)
def doc_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing-style document fingerprint: min-sampled rolling hash
    over 4-token windows."""
    d = load(spark, sf_dir, "documents").filter(F.col("doc_id") % 25 == 0)
    return d.select("doc_id", tokens(F.col("text")).alias("tk")).select(
        "doc_id", rolling_fingerprint(F.col("tk"), 4).alias("fingerprint")
    )


# --------------------------------------------------------------------------
# Similarity search
# --------------------------------------------------------------------------

_COS_SQL = """
    round( list_sum(list_transform(range(1, 65), i -> qv[i]::DOUBLE * nv[i]::DOUBLE))
         / ( sqrt(list_sum(list_transform(range(1, 65), i -> qv[i]::DOUBLE * qv[i]::DOUBLE)))
           * sqrt(list_sum(list_transform(range(1, 65), i -> nv[i]::DOUBLE * nv[i]::DOUBLE))) )
         + 1e-7, 6)
"""


@query(
    "similarity_bruteforce_topk",
    oracle=f"""
    WITH q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < 8),
    c AS (SELECT vec_id AS neighbor_id, embedding AS nv FROM embeddings),
    scored AS (
        SELECT query_id, neighbor_id, {_COS_SQL} AS cos_sim
        FROM q, c WHERE neighbor_id <> query_id
    )
    SELECT query_id, neighbor_id, cos_sim FROM (
        SELECT *, row_number() OVER (PARTITION BY query_id
                                     ORDER BY cos_sim DESC, neighbor_id) AS rn
        FROM scored
    ) WHERE rn <= 3
    """,
)
def similarity_bruteforce_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine top-3 for 8 query vectors: broadcast queries ×
    corpus scan, fold-based dot products, per-query window top-k.

    spread_small (optimization round r14): the embeddings parquet is a
    single sub-128 MB file at every test SF, so the scan is ONE task —
    and the per-row work here (8 query × 64-dim interpreted HOF folds)
    ran serially on one core: measured 19 s of single-task CPU at the
    10× amplified SF, wall ≈ CPU. The round-robin spread costs one
    shuffle of the raw vectors and buys 32-way parallelism; at real
    scale the scan is already wide and spread_small no-ops."""
    emb = spread_small(load(spark, sf_dir, "embeddings"))
    return brute_force_topk(
        emb, emb.filter(F.col("vec_id") < 8), "vec_id", "embedding", k=3
    )


_BUCKET_SQL = """
    list_sum(list_transform(range(0, 8), h ->
        CASE WHEN list_sum(list_transform(range(1, 65), d ->
                 emb[d]::DOUBLE
                 * ((((('0x' || substr(md5(h::VARCHAR || ':' || d::VARCHAR), 1, 8))::BIGINT)
                      % 2001) - 1000) / 1000.0))) > 0
             THEN (1::BIGINT << h) ELSE 0::BIGINT END))::BIGINT
"""


@query(
    "similarity_lsh_ann_topk",
    oracle=f"""
    WITH coded AS (
        SELECT vec_id, embedding, {_BUCKET_SQL.replace("emb[", "embedding[")} AS bucket
        FROM embeddings
    ),
    q AS (SELECT vec_id AS query_id, embedding AS qv, bucket FROM coded WHERE vec_id < 8),
    c AS (SELECT vec_id AS neighbor_id, embedding AS nv, bucket FROM coded),
    scored AS (
        SELECT query_id, neighbor_id, {_COS_SQL} AS cos_sim
        FROM q JOIN c USING (bucket) WHERE neighbor_id <> query_id
    )
    SELECT query_id, neighbor_id, cos_sim FROM (
        SELECT *, row_number() OVER (PARTITION BY query_id
                                     ORDER BY cos_sim DESC, neighbor_id) AS rn
        FROM scored
    ) WHERE rn <= 3
    """,
)
def similarity_lsh_ann_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN scale path: sign-random-projection buckets (md5-derived
    hyperplanes, no stored state) — the bucket equi-join replaces the
    cross join; only same-bucket candidates are scored. Retrieval
    QUALITY is measured, not assumed: ann_recall_at_k grades this
    query against brute-force ground truth (single-table bucket LSH
    scores ~0 on exact top-3 of weakly similar vectors — intrinsic to
    sign-LSH, use IVF for that regime), and ann_neardup_recall_lsh
    grades the multi-table OR-construction in LSH's design regime
    (near-dup retrieval), where it hits recall 1.0 at ~3%
    candidate volume."""
    emb = spread_small(load(spark, sf_dir, "embeddings"))
    return lsh_ann_topk(
        emb, emb.filter(F.col("vec_id") < 8), "vec_id", "embedding",
        k=3, num_planes=8,
    )


# The augmented-corpus CTE and the 8-plane coding CTE are SEPARATE
# constants composed below: oracles that need only ``aug`` (embedding
# outliers, the multi-table recall gate) concatenate from
# ``_AUG_CTE_SQL`` directly — never by string-splitting the composed
# block, which silently broke if its whitespace changed (round-6
# review finding).
_AUG_CTE_SQL = """
    WITH aug AS (
        SELECT vec_id,
               list_transform(range(1, 65), d -> embedding[d]::DOUBLE) AS emb
        FROM embeddings
        UNION ALL
        SELECT vec_id + 1000000000000,
               list_transform(range(1, 65), d ->
                   embedding[d]::DOUBLE
                   + 0.1 * ((((('0x' || substr(md5('p:' || d::VARCHAR), 1, 8))::BIGINT)
                              % 2001) - 1000) / 1000.0))
        FROM embeddings WHERE vec_id % 5 = 0
    )"""

_AUG_EMB_SQL = _AUG_CTE_SQL + """,
    coded AS (
        SELECT vec_id, emb,
               list_sum(list_transform(range(0, 8), h ->
                   CASE WHEN list_sum(list_transform(range(1, 65), d ->
                            emb[d]
                            * ((((('0x' || substr(md5(h::VARCHAR || ':' || d::VARCHAR), 1, 8))::BIGINT)
                                 % 2001) - 1000) / 1000.0))) > 0
                        THEN (1::BIGINT << h) ELSE 0::BIGINT END))::BIGINT AS bucket
        FROM aug
    )
"""


def augmented_embeddings(emb: DataFrame) -> DataFrame:
    """Embeddings corpus augmented with deterministically perturbed
    copies (vec + 0.1·w, w md5-derived, ids offset by 1e12 — far past
    any realistic corpus id, so planted ids can never collide) so real
    near-dups exist at every SF. Mirrors ``_AUG_EMB_SQL``'s ``aug``
    CTE; shared by the LSH and the k-means (llm_pipeline3) dedup
    paths. Output: (vec_id, emb double[64])."""
    base = emb.select(
        "vec_id",
        F.transform(F.col("embedding"), lambda x: x.cast("double")).alias("emb"),
    )

    # Perturbation weights folded to a literal array at plan-build time
    # (bit-identical Python twin of the md5 expression — same rationale
    # as functions.vectors.hyperplane_weight_py): md5 inside a
    # transform lambda is evaluated per row x per dim, and Catalyst
    # cannot fold it.
    import hashlib

    def perturb_weight_py(d: int) -> float:
        v = int(hashlib.md5(f"p:{d}".encode()).hexdigest()[:8], 16)
        return ((v % 2001) - 1000) / 1000.0

    w = F.array(*[F.lit(perturb_weight_py(d)) for d in range(1, 65)])
    planted = emb.filter(F.col("vec_id") % 5 == 0).select(
        (F.col("vec_id") + 1_000_000_000_000).alias("vec_id"),
        F.zip_with(
            F.col("embedding"), w, lambda x, ww: x.cast("double") + 0.1 * ww
        ).alias("emb"),
    )
    return base.unionByName(planted)


@query(
    "dedup_embedding_cosine",
    oracle=_AUG_EMB_SQL
    + """
    SELECT id_a, id_b, cos_sim FROM (
        SELECT a.vec_id AS id_a, b.vec_id AS id_b,
               round( list_sum(list_transform(range(1, 65), i -> a.emb[i] * b.emb[i]))
                    / ( sqrt(list_sum(list_transform(range(1, 65), i -> a.emb[i] * a.emb[i])))
                      * sqrt(list_sum(list_transform(range(1, 65), i -> b.emb[i] * b.emb[i]))) )
                    + 1e-7, 6) AS cos_sim
        FROM coded a JOIN coded b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
    ) WHERE cos_sim >= 0.9
    """,
)
def dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup pairs: LSH-bucket blocking (8
    sign-projection planes) + exact cosine verify ≥ 0.9. The corpus is
    augmented with deterministically perturbed copies (vec + 0.1·w,
    w md5-derived) so real near-dups exist at every SF."""
    from ..functions.vectors import cosine, lsh_bucket

    emb = spread_small(load(spark, sf_dir, "embeddings"))
    aug = augmented_embeddings(emb)
    coded = aug.select(
        "vec_id", "emb", lsh_bucket("emb", 8).alias("bucket")
    )
    a = coded.alias("a")
    b = coded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .select(
            F.col("a.vec_id").alias("id_a"),
            F.col("b.vec_id").alias("id_b"),
            stable_round(cosine(F.col("a.emb"), F.col("b.emb")), 6).alias("cos_sim"),
        )
        .filter(F.col("cos_sim") >= 0.9)
    )


_COS_PAIR = """
    round( list_sum(list_transform(range(1, 65), i -> {a}[i] * {b}[i]))
         / ( sqrt(list_sum(list_transform(range(1, 65), i -> {a}[i] * {a}[i])))
           * sqrt(list_sum(list_transform(range(1, 65), i -> {b}[i] * {b}[i]))) )
         + 1e-7, 6)
"""


@query(
    "similarity_ivf_topk",
    oracle=f"""
    WITH v AS (
        SELECT vec_id, list_transform(range(1, 65), i -> embedding[i]::DOUBLE) AS emb
        FROM embeddings
    ),
    c AS (SELECT vec_id AS cid, emb AS cv FROM v WHERE vec_id < 16),
    assign_scored AS (
        SELECT v.vec_id, c.cid,
               {_COS_PAIR.format(a="v.emb", b="c.cv")} AS csim
        FROM v, c
    ),
    corpus_cells AS (
        SELECT vec_id AS neighbor_id, cid FROM (
            SELECT *, row_number() OVER (PARTITION BY vec_id
                                         ORDER BY csim DESC, cid) AS rn
            FROM assign_scored
        ) WHERE rn = 1
    ),
    query_cells AS (
        SELECT vec_id AS query_id, cid FROM (
            SELECT *, row_number() OVER (PARTITION BY vec_id
                                         ORDER BY csim DESC, cid) AS rn
            FROM assign_scored WHERE vec_id < 8
        ) WHERE rn <= 2
    ),
    cands AS (
        SELECT DISTINCT q.query_id, cc.neighbor_id
        FROM query_cells q JOIN corpus_cells cc USING (cid)
        WHERE cc.neighbor_id <> q.query_id
    ),
    scored AS (
        SELECT query_id, neighbor_id,
               {_COS_PAIR.format(a="qv.emb", b="nv.emb")} AS cos_sim
        FROM cands
        JOIN v qv ON qv.vec_id = cands.query_id
        JOIN v nv ON nv.vec_id = cands.neighbor_id
    )
    SELECT query_id, neighbor_id, cos_sim FROM (
        SELECT *, row_number() OVER (PARTITION BY query_id
                                     ORDER BY cos_sim DESC, neighbor_id) AS rn
        FROM scored
    ) WHERE rn <= 3
    """,
)
def similarity_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN scale path: corpus assigned to nearest-centroid cells
    (deterministic seed centroids vec_id<16), queries probe their 2
    nearest cells only."""
    from ..operators.similarity import ivf_ann_topk

    emb = spread_small(load(spark, sf_dir, "embeddings")).select(
        "vec_id",
        F.transform(F.col("embedding"), lambda x: x.cast("double")).alias("emb"),
    )
    return ivf_ann_topk(
        emb,
        emb.filter(F.col("vec_id") < 8),
        emb.filter(F.col("vec_id") < 16),
        "vec_id",
        "emb",
        k=3,
        nprobe=2,
    )


def _ann_recall_oracle() -> str:
    """Compose the recall oracle from the three similarity oracles
    ALREADY registered above (same strings, so the ground truth and the
    approximate sets are definitionally the ones the driver verifies)."""
    from .registry import ORACLES

    bf = ORACLES["similarity_bruteforce_topk"]
    lsh = ORACLES["similarity_lsh_ann_topk"]
    ivf = ORACLES["similarity_ivf_topk"]
    return f"""
    WITH bf AS (SELECT query_id, neighbor_id FROM ({bf})),
    lsh AS (SELECT query_id, neighbor_id FROM ({lsh})),
    ivf AS (SELECT query_id, neighbor_id FROM ({ivf})),
    tot AS (
        SELECT count(*) AS n_truth, count(DISTINCT query_id) AS n_queries
        FROM bf
    ),
    h AS (
        SELECT 'lsh' AS method, count(*) AS n_hits
        FROM bf JOIN lsh USING (query_id, neighbor_id)
        UNION ALL
        SELECT 'ivf' AS method, count(*) AS n_hits
        FROM bf JOIN ivf USING (query_id, neighbor_id)
    )
    SELECT method, CAST(n_queries AS BIGINT) AS n_queries,
           CAST(n_truth AS BIGINT) AS n_truth,
           CAST(n_hits AS BIGINT) AS n_hits,
           round(n_hits::DOUBLE / n_truth + 1e-7, 4) AS recall_at_k
    FROM h, tot
    """


@query("ann_recall_at_k", oracle=_ann_recall_oracle())
def ann_recall_at_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN retrieval QUALITY, not just determinism: recall@3 of the
    LSH and IVF approximate searches against brute-force ground truth
    on the same queries (the first number a user of an ANN operator
    asks for; the reference's relevance surface is
    elasticsearch_integration.py:277-296). Each side is the exact
    registered query's plan; the metric adds one id-pair equi-join and
    two 1-row aggregates. A recall floor is asserted in
    tests/test_llm_pipeline4.py and the value is reported by bench.py
    under `extra`."""
    from ..operators.similarity import recall_against

    # The exact ground truth feeds BOTH gates (and recall_against reads
    # its truth twice): checkpoint once or the O(corpus × queries)
    # brute-force scoring runs four times per invocation. Eager — a
    # lazy checkpoint's consumers race-compute the blocks inside one
    # action (see recall_against).
    bf = similarity_bruteforce_topk(spark, sf_dir).transform(ckpt_shared)
    lsh = recall_against(similarity_lsh_ann_topk(spark, sf_dir), bf, "lsh")
    ivf = recall_against(similarity_ivf_topk(spark, sf_dir), bf, "ivf")
    return lsh.unionByName(ivf)


def _multi_table_bucket_sql(emb: str, num_planes: int, num_tables: int) -> str:
    """DuckDB twin of ``lsh_bucket(..., table=t)`` for t in
    [0, num_tables): a UNION ALL of per-table codings (table t offsets
    the hyperplane keys by t*64, mirroring functions/vectors.py)."""

    def one(t: int) -> str:
        return f"""
        SELECT vec_id, emb, {t} AS t,
               list_sum(list_transform(range(0, {num_planes}), h ->
                   CASE WHEN list_sum(list_transform(range(1, 65), d ->
                            {emb}[d]::DOUBLE
                            * ((((('0x' || substr(md5((h + {t * 64})::VARCHAR || ':' || d::VARCHAR), 1, 8))::BIGINT)
                                 % 2001) - 1000) / 1000.0))) > 0
                        THEN (1::BIGINT << h) ELSE 0::BIGINT END))::BIGINT AS code
        FROM aug"""

    return " UNION ALL ".join(one(t) for t in range(num_tables))


def _neardup_ground_truth(
    spark: SparkSession, sf_dir: str
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """One (aug, queries, exact-top-1) triple PER INVOCATION. A
    session-keyed module-level cache used to share the triple across
    the two near-dup gates — removed in optimization round r15 (r14
    verdict #4): the memoized checkpoint blocks let bench's TIMED warm
    runs read ground truth computed in the UNTIMED cold run, the exact
    reuse class the r14 round ripped out of the dedup operators'
    cache(). Each gate now recomputes its own truth; the timed numbers
    are honest.

    ``aug`` is checkpointed EAGERLY: it feeds four consumers inside
    one gate (corpus + query side of both the ANN search and the
    ground truth), and lazy checkpoints race-compute under parallel
    consumers (the r14 measured failure mode). ``bf`` carries no
    checkpoint — its single consumer, recall_against, eagerly
    checkpoints its 2-column projection itself.
    The repartition matters as much as the checkpoint: the embeddings
    parquet is a couple of files, and a checkpoint inherits its
    partitioning — every downstream cosine/bucket stage would run
    2-wide on a 32-core box (measured: the LSH search was 9.3 s with
    2 partitions, 2.5x faster spread). Hash on vec_id keeps the
    planted twins colocation-free (they must shuffle to their bucket
    joins anyway)."""
    n_slices = spark.sparkContext.defaultParallelism
    aug = (
        augmented_embeddings(spread_small(load(spark, sf_dir, "embeddings")))
        .repartition(n_slices, "vec_id")
        .transform(ckpt_shared)
    )
    q = aug.filter(
        (F.col("vec_id") >= 1_000_000_000_000)
        & (F.col("vec_id") < 1_000_000_000_040)
    )
    bf = brute_force_topk(aug, q, "vec_id", "emb", k=1)
    return aug, q, bf


@query(
    "ann_neardup_recall_lsh",
    oracle=_AUG_CTE_SQL
    + f""",
    coded AS ({_multi_table_bucket_sql("emb", 8, 8)}),
    q AS (SELECT vec_id AS query_id, t, code FROM coded
          WHERE vec_id >= 1000000000000 AND vec_id < 1000000000040),
    c AS (SELECT vec_id AS neighbor_id, t, code FROM coded),
    cands AS (
        SELECT DISTINCT query_id, neighbor_id
        FROM q JOIN c USING (t, code) WHERE neighbor_id <> query_id
    ),
    scored AS (
        SELECT cands.query_id, cands.neighbor_id,
               {_COS_PAIR.format(a="qv.emb", b="nv.emb")} AS cos_sim
        FROM cands
        JOIN aug qv ON qv.vec_id = cands.query_id
        JOIN aug nv ON nv.vec_id = cands.neighbor_id
    ),
    ann1 AS (
        SELECT query_id, neighbor_id FROM (
            SELECT *, row_number() OVER (PARTITION BY query_id
                                         ORDER BY cos_sim DESC, neighbor_id) AS rn
            FROM scored
        ) WHERE rn = 1
    ),
    bscored AS (
        SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
               {_COS_PAIR.format(a="q.emb", b="c.emb")} AS cos_sim
        FROM aug q JOIN aug c ON c.vec_id <> q.vec_id
        WHERE q.vec_id >= 1000000000000 AND q.vec_id < 1000000000040
    ),
    bf1 AS (
        SELECT query_id, neighbor_id FROM (
            SELECT *, row_number() OVER (PARTITION BY query_id
                                         ORDER BY cos_sim DESC, neighbor_id) AS rn
            FROM bscored
        ) WHERE rn = 1
    ),
    tot AS (
        SELECT count(*) AS n_truth, count(DISTINCT query_id) AS n_queries
        FROM bf1
    ),
    h AS (
        SELECT count(*) AS n_hits FROM bf1 JOIN ann1 USING (query_id, neighbor_id)
    )
    SELECT 'lsh_neardup' AS method, CAST(n_queries AS BIGINT) AS n_queries,
           CAST(n_truth AS BIGINT) AS n_truth, CAST(n_hits AS BIGINT) AS n_hits,
           round(n_hits::DOUBLE / n_truth + 1e-7, 4) AS recall_at_k
    FROM h, tot
    """,
)
def ann_neardup_recall_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH recall in its DESIGN regime — near-duplicate retrieval.
    Sign-projection bucket LSH is a blocking scheme: it finds pairs
    above a high similarity threshold, not exact top-k among weakly
    similar vectors (on this corpus's ~random vectors, exact-top-3
    bucket recall is near zero at any selective setting — see
    ann_recall_at_k; that regime belongs to IVF). Here the corpus is
    augmented with planted perturbed twins (cos ≈ 0.9) and the metric
    is recall@1 of each planted query's true nearest neighbor under an
    8-plane × 8-table OR-construction — candidates ~ tables/2^planes ≈
    3% of the corpus, yet empirical recall is 1.0 at sf0.001 and
    sf0.01 (expected ≥ 1-(1-p_bit^8)^8 ≈ 0.94 for cos 0.9). The pytest
    floor asserts ≥ 0.8."""
    from ..operators.similarity import recall_against

    aug, q, bf = _neardup_ground_truth(spark, sf_dir)
    ann = lsh_ann_topk(aug, q, "vec_id", "emb", k=1, num_planes=8, num_tables=8)
    return recall_against(ann, bf, "lsh_neardup")


@query(
    "ann_neardup_recall_multiprobe",
    oracle=_AUG_CTE_SQL
    + f""",
    coded AS ({_multi_table_bucket_sql("emb", 10, 4)}),
    q AS (
        SELECT vec_id AS query_id, t,
               CASE WHEN p = 0 THEN code
                    ELSE xor(code, (1::BIGINT << (p - 1))) END AS code
        FROM coded, (SELECT unnest(range(0, 11)) AS p)
        WHERE vec_id >= 1000000000000 AND vec_id < 1000000000040
    ),
    c AS (SELECT vec_id AS neighbor_id, t, code FROM coded),
    cands AS (
        SELECT DISTINCT query_id, neighbor_id
        FROM q JOIN c USING (t, code) WHERE neighbor_id <> query_id
    ),
    scored AS (
        SELECT cands.query_id, cands.neighbor_id,
               {_COS_PAIR.format(a="qv.emb", b="nv.emb")} AS cos_sim
        FROM cands
        JOIN aug qv ON qv.vec_id = cands.query_id
        JOIN aug nv ON nv.vec_id = cands.neighbor_id
    ),
    ann1 AS (
        SELECT query_id, neighbor_id FROM (
            SELECT *, row_number() OVER (PARTITION BY query_id
                                         ORDER BY cos_sim DESC, neighbor_id) AS rn
            FROM scored
        ) WHERE rn = 1
    ),
    bscored AS (
        SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
               {_COS_PAIR.format(a="q.emb", b="c.emb")} AS cos_sim
        FROM aug q JOIN aug c ON c.vec_id <> q.vec_id
        WHERE q.vec_id >= 1000000000000 AND q.vec_id < 1000000000040
    ),
    bf1 AS (
        SELECT query_id, neighbor_id FROM (
            SELECT *, row_number() OVER (PARTITION BY query_id
                                         ORDER BY cos_sim DESC, neighbor_id) AS rn
            FROM bscored
        ) WHERE rn = 1
    ),
    tot AS (
        SELECT count(*) AS n_truth, count(DISTINCT query_id) AS n_queries
        FROM bf1
    ),
    h AS (
        SELECT count(*) AS n_hits FROM bf1 JOIN ann1 USING (query_id, neighbor_id)
    )
    SELECT 'lsh_multiprobe' AS method, CAST(n_queries AS BIGINT) AS n_queries,
           CAST(n_truth AS BIGINT) AS n_truth, CAST(n_hits AS BIGINT) AS n_hits,
           round(n_hits::DOUBLE / n_truth + 1e-7, 4) AS recall_at_k
    FROM h, tot
    """,
)
def ann_neardup_recall_multiprobe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-probe LSH recall in the near-dup regime — the SAME
    planted-twin ground truth as ann_neardup_recall_lsh, searched with
    HALF the index (4 tables x 10 planes + 1-bit query-side probes,
    Lv et al. VLDB'07) instead of the 8x8 exact OR-construction. Per
    table a cos-0.9 twin (bit agreement q ~ 0.94) is caught with
    probability q^10 + 10q^9(1-q) ~ 0.85, so 4 probed tables reach
    ~0.999 expected recall at ~4% random-pair candidate volume —
    index rows and signature compute drop 2x/1.6x vs the 8x8
    construction for equal recall. Probing expands only the broadcast
    query side; the corpus index stays one row per (vector, table)."""
    from ..operators.similarity import lsh_multiprobe_ann_topk, recall_against

    aug, q, bf = _neardup_ground_truth(spark, sf_dir)
    ann = lsh_multiprobe_ann_topk(
        aug, q, "vec_id", "emb", k=1, num_planes=10, num_tables=4
    )
    return recall_against(ann, bf, "lsh_multiprobe")


# --------------------------------------------------------------------------
# Multimodal binary plumbing
# --------------------------------------------------------------------------


@query(
    "binary_payload_meta",
    oracle="""
    SELECT doc_id,
           octet_length(encode(text)) AS n_bytes,
           substr(md5(text), 1, 8) AS sig
    FROM documents WHERE doc_id % 50 = 0
    """,
)
def binary_payload_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Opaque-binary column plumbing (multimodal pattern): payload
    byte length + content signature over a binary-typed column; the
    decode/feature UDFs live in operators/multimodal.py."""
    d = load(spark, sf_dir, "documents").filter(F.col("doc_id") % 50 == 0)
    payload = F.col("text").cast("binary")
    return d.select(
        "doc_id",
        F.length(payload).cast("int").alias("n_bytes"),
        F.substring(F.md5("text"), 1, 8).alias("sig"),
    )
