"""Corpus curation operators, part 5: repetition-based quality gates,
cross-document repeated-span coverage, quantized similarity search.

Three more stages of the pre-training data pipeline (no counterpart in
the reference engine — this extends the LLM-data hygiene layer of
llm_pipeline2/3/4):

- ``gopher_quality_flags``: the published Gopher/MassiveText repetition
  rules (word count band, mean word length band, top-bigram fraction,
  distinct-word ratio) evaluated per document and rolled up per source.
  The top-bigram fraction is computed the scale-correct way — explode
  bigrams → (doc, bigram) count → per-doc max — so the wide explode
  collapses in map-side partials instead of a per-row quadratic
  distinct×total array expression.
- ``crossdoc_shingle_boilerplate``: which documents are dominated by
  word-5-gram spans that repeat across ≥3 documents (the span-level
  view of boilerplate, the document-level proxy for exact substring
  dedup à la "Deduplicating Training Data Makes Language Models
  Better"). Candidate generation is a shingle-hash groupBy — linear,
  no pairwise comparison anywhere.
- ``quantized_ann_int8_topk``: brute-force cosine top-k in symmetric
  int8-quantized space (per-vector max-abs scaling). The compression
  story for 100 TB ANN: 4× smaller vectors, integer dot products, and
  the quantized cosine needs NO dequantization (the per-vector scales
  cancel in the cosine ratio). Retrieval quality is measured, not
  assumed: tests/test_llm_pipeline5.py gates recall@3 against
  ``similarity_bruteforce_topk`` float ground truth.
- ``substring_dup_spans`` / ``substring_dedup_clean``: exact substring
  dedup at sub-document granularity (Lee et al.) — maximal duplicated
  spans via stride-1 positional shingles + gaps-and-islands run
  merging, then the removal transform that drops covered positions
  and fingerprints the rebuilt text.
- ``quality_classifier_score``: model-based quality filtering (the
  fasttext/linear-classifier stage) — in-row hashed bag-of-words
  features, sigmoid score, threshold rollup per source; deterministic
  md5-derived weights stand in for a trained model so the operator
  sits under the oracle gate.

All are pure DataFrame plans (no UDFs, no collect); each has a
DuckDB oracle twin for the hash-compare gate.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from ..functions.text import (
    TOKS_SQL,
    positional_word_shingles,
    tokens,
    word_shingles,
)
from ..functions.vectors import hyperplane_weight
from ..tables import ckpt_shared, load, spread_small
from .llm_pipeline2 import _SPLIT_CASE_SQL
from .registry import query, stable_round

# Shared token SQL (mirrors functions.text.tokens).
_TOKS_SQL = TOKS_SQL  # canonical oracle twin of the engine tokenizer

# The hashed-linear quality score, shared by quality_classifier_score
# and the composed curation pipeline (plans/curation_pipeline.py) so
# the two can never drift. Per-row over a ``toks`` array column:
# w(tok) = ((md5("qw1:"+tok)[:8] as int) % 2001 − 1000)/1000,
# score = sigmoid(4 * mean(w)) rounded to 6 (stable_round twin).
QUALITY_SCORE_SQL = """round(
    1.0 / (1.0 + exp(-4.0 * (
        list_sum(list_transform(toks,
            t -> ((('0x' || substr(md5('qw1:' || t), 1, 8))::BIGINT
                   % 2001) - 1000) / 1000.0))
        / len(toks)))) + 1e-7, 6)"""


def quality_score_expr() -> F.Column:
    """Spark twin of :data:`QUALITY_SCORE_SQL` over a ``toks`` array
    column — one in-row transform/aggregate fold, no explode, no
    per-token shuffle (see quality_classifier_score's docstring)."""
    weights = F.transform(
        F.col("toks"), lambda t: hyperplane_weight(F.lit("qw1"), t)
    )
    logit = F.aggregate(weights, F.lit(0.0), lambda a, v: a + v) / F.size(
        "toks"
    )
    return stable_round(
        F.lit(1.0) / (F.lit(1.0) + F.exp(F.lit(-4.0) * logit)), 6
    )


@query(
    "gopher_quality_flags",
    oracle=f"""
    WITH d AS (
        SELECT doc_id, source, {_TOKS_SQL} AS toks FROM documents
    ),
    base AS (
        SELECT doc_id, source,
               len(toks) AS n_words,
               list_sum(list_transform(toks, t -> len(t)))::DOUBLE / len(toks)
                   AS mean_wlen,
               len(list_distinct(toks))::DOUBLE / len(toks) AS distinct_ratio
        FROM d WHERE len(toks) > 0
    ),
    bg AS (
        SELECT doc_id, unnest(list_transform(range(1, len(toks)),
                                             i -> toks[i] || ' ' || toks[i + 1])) AS bigram
        FROM d WHERE len(toks) >= 2
    ),
    bgc AS (
        SELECT doc_id, bigram, count(*) AS cnt FROM bg GROUP BY doc_id, bigram
    ),
    top AS (
        SELECT doc_id, max(cnt) AS top_cnt, sum(cnt) AS n_bigrams
        FROM bgc GROUP BY doc_id
    ),
    m AS (
        SELECT b.source,
               round(b.mean_wlen + 1e-7, 4) AS mean_wlen,
               round(b.distinct_ratio + 1e-7, 4) AS distinct_ratio,
               round(t.top_cnt::DOUBLE / t.n_bigrams + 1e-7, 4) AS top_bigram_frac,
               CASE WHEN b.n_words BETWEEN 10 AND 100000
                         AND b.mean_wlen BETWEEN 2 AND 10
                         AND round(t.top_cnt::DOUBLE / t.n_bigrams + 1e-7, 4) <= 0.20
                         AND b.distinct_ratio >= 0.30
                    THEN 1 ELSE 0 END AS pass_all
        FROM base b JOIN top t USING (doc_id)
    )
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(pass_all) AS BIGINT) AS n_pass,
           round(avg(top_bigram_frac) + 1e-7, 4) AS avg_top_bigram_frac,
           round(avg(distinct_ratio) + 1e-7, 4) AS avg_distinct_ratio,
           round(avg(mean_wlen) + 1e-7, 4) AS avg_mean_wlen
    FROM m GROUP BY source
    """,
)
def gopher_quality_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher/MassiveText-style repetition quality gate, per source.

    Per-document metrics: word count, mean word length, distinct-word
    ratio, and the fraction of all bigram occurrences taken by the
    single most frequent bigram (the "top 2-gram fraction" rule). A
    document passes when all four sit inside the published bands
    (word count 10..100k, mean word length 2..10, top-bigram ≤ 0.20,
    distinct ratio ≥ 0.30 — thresholds from the Gopher paper's
    repetition filters, adapted to this corpus's scale).

    Plan shape at 100 TB: ONE explode of bigrams that collapses in a
    map-side partial count keyed (doc_id, bigram) — never a per-row
    distinct×total quadratic scan — then doc-sized aggregates and a
    source-sized rollup. Both per-doc ratios are rounded before the
    flag comparison and before averaging so the two engines branch and
    sum over identical doubles.
    """
    d = load(spark, sf_dir, "documents").select(
        "doc_id", "source", tokens("text").alias("toks")
    )
    base = d.filter(F.size("toks") > 0).select(
        "doc_id",
        "source",
        F.size("toks").alias("n_words"),
        (
            F.aggregate(
                F.transform(F.col("toks"), lambda t: F.length(t).cast("double")),
                F.lit(0.0),
                lambda acc, v: acc + v,
            )
            / F.size("toks")
        ).alias("mean_wlen"),
        (F.size(F.array_distinct("toks")) / F.size("toks")).alias("distinct_ratio"),
    )
    bigrams = F.transform(
        F.sequence(F.lit(1), F.size("toks") - 1),
        lambda i: F.concat(
            F.element_at(F.col("toks"), i), F.lit(" "), F.element_at(F.col("toks"), i + 1)
        ),
    )
    bg = (
        d.filter(F.size("toks") >= 2)
        .select("doc_id", F.explode(bigrams).alias("bigram"))
        .groupBy("doc_id", "bigram")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .groupBy("doc_id")
        .agg(F.max("cnt").alias("top_cnt"), F.sum("cnt").alias("n_bigrams"))
    )
    top_frac = stable_round(F.col("top_cnt").cast("double") / F.col("n_bigrams"), 4)
    m = base.join(bg, "doc_id").select(
        "source",
        stable_round("mean_wlen", 4).alias("mean_wlen"),
        stable_round("distinct_ratio", 4).alias("distinct_ratio"),
        top_frac.alias("top_bigram_frac"),
        F.when(
            F.col("n_words").between(10, 100000)
            & F.col("mean_wlen").between(2, 10)
            & (top_frac <= 0.20)
            & (F.col("distinct_ratio") >= 0.30),
            1,
        )
        .otherwise(0)
        .alias("pass_all"),
    )
    return m.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("pass_all").cast("long").alias("n_pass"),
        stable_round(F.avg("top_bigram_frac"), 4).alias("avg_top_bigram_frac"),
        stable_round(F.avg("distinct_ratio"), 4).alias("avg_distinct_ratio"),
        stable_round(F.avg("mean_wlen"), 4).alias("avg_mean_wlen"),
    )


@query(
    "crossdoc_shingle_boilerplate",
    oracle=f"""
    WITH d AS (
        SELECT doc_id, source, {_TOKS_SQL} AS toks FROM documents
    ),
    sh AS (
        SELECT doc_id, source,
               unnest(CASE WHEN len(toks) >= 5
                           THEN list_distinct(list_transform(
                                    range(1, len(toks) - 3),
                                    i -> array_to_string(toks[i:i+4], ' ')))
                           ELSE [array_to_string(toks, ' ')] END) AS shingle
        FROM d WHERE len(toks) > 0
    ),
    hot AS (
        SELECT shingle, count(*) AS n_docs_sh FROM sh GROUP BY shingle
    ),
    cov AS (
        SELECT s.doc_id, s.source,
               count(*) AS n_sh,
               sum(CASE WHEN h.n_docs_sh >= 3 THEN 1 ELSE 0 END) AS n_hot
        FROM sh s JOIN hot h USING (shingle)
        GROUP BY s.doc_id, s.source
    ),
    per_doc AS (
        SELECT source, round(n_hot::DOUBLE / n_sh + 1e-7, 4) AS coverage
        FROM cov
    )
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           round(avg(coverage) + 1e-7, 4) AS avg_coverage,
           round(max(coverage) + 1e-7, 4) AS max_coverage,
           CAST(sum(CASE WHEN coverage >= 0.5 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_flagged
    FROM per_doc GROUP BY source
    """,
)
def crossdoc_shingle_boilerplate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-document repeated-span coverage: the fraction of each
    document's distinct word-5-gram spans that also occur in ≥3
    documents — the span-level boilerplate diagnostic, and the
    document-level proxy for exact substring dedup (Lee et al.,
    "Deduplicating Training Data"). Rolled up per source: average and
    max coverage plus how many documents are majority-boilerplate.

    Scale shape: shingle generation is in-row (array transform over
    the token array, distinct per doc), candidate counting is ONE
    groupBy on the shingle string — linear in corpus size, collapsing
    in map-side partials. The span occurrence count uses count(*),
    which equals count(distinct doc) here because each doc contributes
    its shingle set deduplicated in-row. Nothing pairwise anywhere —
    this is the same banded/bucketed discipline as the MinHash path
    (operators/dedup.py).
    """
    d = load(spark, sf_dir, "documents").select(
        "doc_id", "source", tokens("text").alias("toks")
    )
    # Lazy localCheckpoint, not cache(): sh feeds BOTH the hot-shingle
    # aggregate and the coverage probe join, and the two subplans
    # differ (one holds a partial aggregate) so exchange reuse can't
    # deduplicate them — without it the tokenize+shingle+explode (the
    # expensive stage) runs twice; checkpoint blocks release on GC
    # instead of lingering in the block manager across invocations.
    sh = (
        d.filter(F.size("toks") > 0)
        .select(
            "doc_id",
            "source",
            F.explode(word_shingles(F.col("toks"), 5)).alias("shingle"),
        )
        .transform(ckpt_shared)
    )
    hot = sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("n_docs_sh"))
    cov = (
        sh.join(hot, "shingle")
        .groupBy("doc_id", "source")
        .agg(
            F.count(F.lit(1)).alias("n_sh"),
            F.sum(F.when(F.col("n_docs_sh") >= 3, 1).otherwise(0)).alias("n_hot"),
        )
        .select(
            "source",
            stable_round(F.col("n_hot").cast("double") / F.col("n_sh"), 4).alias(
                "coverage"
            ),
        )
    )
    return cov.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        stable_round(F.avg("coverage"), 4).alias("avg_coverage"),
        stable_round(F.max("coverage"), 4).alias("max_coverage"),
        F.sum(F.when(F.col("coverage") >= 0.5, 1).otherwise(0))
        .cast("long")
        .alias("n_flagged"),
    )


# int8 symmetric quantization: q_i = round(x_i * 127 / max|x|). The
# quantized cosine dot(qa,qb)/(|qa||qb|) needs no dequantization — the
# per-vector scales cancel — so the whole score is exact integer
# arithmetic (≤ 64·127² per term, far inside double precision) plus
# one sqrt/divide, identical in both engines.
_QVEC_SQL = """
    list_transform(embedding, x ->
        round(x::DOUBLE * (127.0 / list_max(list_transform(embedding,
                                                           v -> abs(v::DOUBLE))))))
"""
_QCOS_SQL = """
    round( list_sum(list_transform(range(1, 65), i -> qv[i] * nv[i]))
         / ( sqrt(list_sum(list_transform(range(1, 65), i -> qv[i] * qv[i])))
           * sqrt(list_sum(list_transform(range(1, 65), i -> nv[i] * nv[i]))) )
         + 1e-7, 6)
"""


@query(
    "quantized_ann_int8_topk",
    oracle=f"""
    WITH coded AS (
        SELECT vec_id, {_QVEC_SQL} AS qvec FROM embeddings
        WHERE list_max(list_transform(embedding, v -> abs(v::DOUBLE))) > 0
    ),
    q AS (SELECT vec_id AS query_id, qvec AS qv FROM coded WHERE vec_id < 8),
    c AS (SELECT vec_id AS neighbor_id, qvec AS nv FROM coded),
    scored AS (
        SELECT query_id, neighbor_id, {_QCOS_SQL} AS q_cos_sim
        FROM q, c WHERE neighbor_id <> query_id
    )
    SELECT query_id, neighbor_id, q_cos_sim FROM (
        SELECT *, row_number() OVER (PARTITION BY query_id
                                     ORDER BY q_cos_sim DESC, neighbor_id) AS rn
        FROM scored
    ) WHERE rn <= 3
    """,
)
def quantized_ann_int8_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cosine top-3 in symmetric int8-quantized space: per-vector
    max-abs scaling to [-127, 127], integer dot products, and a
    quantized cosine in which the two scale factors cancel — no
    dequantization step at all. This is the storage/bandwidth scale
    path for 100 TB ANN (4× smaller vectors than float32, SIMD-friendly
    integer math); recall@3 against the float ground truth
    (similarity_bruteforce_topk) is gated in
    tests/test_llm_pipeline5.py rather than assumed.

    The quantized values stay integral-valued DOUBLEs in both engines
    (no int cast — cast rounding conventions differ across engines;
    round() half-away-from-zero matches) so every product and sum is
    exact and byte-identical.
    """
    # Zero vectors are excluded on BOTH sides before the 127/max|x|
    # scale: the division is undefined for them, and the engines'
    # permissive-mode answers differ (Spark non-ANSI NULL vs DuckDB
    # Inf) — a zero embedding carries no direction to search anyway.
    maxabs = F.array_max(
        F.transform(F.col("embedding"), lambda v: F.abs(v.cast("double")))
    )
    emb = spread_small(load(spark, sf_dir, "embeddings")).filter(maxabs > 0)
    scale = F.lit(127.0) / maxabs
    coded = emb.select(
        "vec_id",
        F.transform(
            F.col("embedding"), lambda x: F.round(x.cast("double") * scale)
        ).alias("qvec"),
    )
    q = coded.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("query_id"), F.col("qvec").alias("qv")
    )
    c = coded.select(F.col("vec_id").alias("neighbor_id"), F.col("qvec").alias("nv"))
    dot_qn = F.aggregate(
        F.zip_with(F.col("qv"), F.col("nv"), lambda a, b: a * b),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    norm = lambda col: F.sqrt(  # noqa: E731
        F.aggregate(
            F.transform(F.col(col), lambda a: a * a), F.lit(0.0), lambda acc, v: acc + v
        )
    )
    scored = (
        F.broadcast(q)
        .join(c, F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            stable_round(dot_qn / (norm("qv") * norm("nv")), 6).alias("q_cos_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("q_cos_sim").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .drop("rn")
    )


# ---------------------------------------------------------------------------
# Product quantization (PQ) ANN — the ADC serving path
# ---------------------------------------------------------------------------

# PQ geometry: 64-dim vectors split into m=16 subspaces of 4 dims;
# each subspace quantized against k=16 codewords -> 16 nibbles
# (8 bytes) per vector, a 32x compression over float32. Codebooks are
# DETERMINISTIC (the subvectors of the 16 lowest-vec_id corpus
# vectors — the "random sample" codebook baseline from the PQ
# literature) so the whole pipeline is reproducible in ANSI SQL and
# the driver gate hash-compares encode + shortlist + rerank end to
# end; a production deployment swaps in k-means-refined codewords
# without touching the serving algebra (kmeans_cluster_profile holds
# that machinery).
_PQ_M, _PQ_DSUB, _PQ_K = 16, 4, 16
_PQ_SHORTLIST = 50

# 4-dim squared L2 between a subvector and a codeword — sequential
# left-fold in BOTH engines (list_sum over a fixed-order list /
# F.aggregate), so the doubles are bit-identical and the argmin code
# assignment cannot diverge across engines.
_PQ_D2_SQL = """
    list_sum(list_transform(range(1, 5),
             i -> (d.sub[i] - c.cw[i]) * (d.sub[i] - c.cw[i])))
"""


@query(
    "quantized_ann_pq_topk",
    oracle=f"""
    WITH emb AS (
        SELECT vec_id, list_transform(embedding, v -> v::DOUBLE) AS e
        FROM embeddings
    ),
    sub AS (
        SELECT vec_id, s, list_slice(e, {_PQ_DSUB} * s + 1, {_PQ_DSUB} * s + {_PQ_DSUB}) AS sub
        FROM emb, (SELECT unnest(range(0, {_PQ_M})) AS s)
    ),
    cb AS (SELECT vec_id AS j, s, sub AS cw FROM sub WHERE vec_id < {_PQ_K}),
    asg AS (
        SELECT vec_id, s, j,
               row_number() OVER (PARTITION BY vec_id, s ORDER BY d2, j) AS rn
        FROM (SELECT d.vec_id, d.s, c.j, {_PQ_D2_SQL} AS d2
              FROM sub d JOIN cb c ON c.s = d.s)
    ),
    codes AS (SELECT vec_id, s, j AS code FROM asg WHERE rn = 1),
    lut AS (
        SELECT d.vec_id AS query_id, c.s, c.j, {_PQ_D2_SQL} AS d2
        FROM sub d JOIN cb c ON c.s = d.s WHERE d.vec_id < 8
    ),
    scored AS (
        SELECT l.query_id, x.vec_id AS neighbor_id,
               round(sum(l.d2) + 1e-7, 6) AS pq_d2
        FROM codes x JOIN lut l ON l.s = x.s AND l.j = x.code
        WHERE x.vec_id <> l.query_id
        GROUP BY 1, 2
    ),
    short AS (
        SELECT query_id, neighbor_id FROM (
            SELECT *, row_number() OVER (PARTITION BY query_id
                                         ORDER BY pq_d2, neighbor_id) AS rn
            FROM scored
        ) WHERE rn <= {_PQ_SHORTLIST}
    ),
    rerank AS (
        SELECT s.query_id, s.neighbor_id,
               round(list_sum(list_transform(range(1, 65),
                     i -> (q.e[i] - n.e[i]) * (q.e[i] - n.e[i]))) + 1e-7, 6) AS l2_d2
        FROM short s
        JOIN emb q ON q.vec_id = s.query_id
        JOIN emb n ON n.vec_id = s.neighbor_id
    )
    SELECT query_id, neighbor_id, l2_d2 FROM (
        SELECT *, row_number() OVER (PARTITION BY query_id
                                     ORDER BY l2_d2, neighbor_id) AS rn
        FROM rerank
    ) WHERE rn <= 3
    """,
)
def quantized_ann_pq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization ANN with asymmetric distance computation
    (ADC) and exact re-ranking — the Jégou et al. "Product Quantization
    for Nearest Neighbor Search" serving shape and the memory-bound
    scale path for 100 TB ANN: each 64-dim float vector compresses to
    16 codes of 4 bits (32× smaller than float32), a query scores every
    candidate by summing 16 PRECOMPUTED query-to-codeword distances
    (never touching the original vectors), keeps a 50-deep shortlist,
    and re-ranks ONLY the shortlist with exact float L2 — the standard
    coarse-then-exact cascade, so the big scan is over 8-byte codes and
    the float vectors are fetched for 50/N of the corpus.

    Distributed shape — every step is a keyed equi-join, nothing
    quadratic and no broadcast-NLJ: (1) encode = subvector frame
    (N·m rows) equi-joined on subspace id against the broadcast
    codebook (m·k = 256 rows), argmin per (vector, subspace);
    (2) query LUT = the same join restricted to the 8 query vectors;
    (3) ADC = codes equi-joined to the LUT on (subspace, code) + hash-
    aggregate sum per (query, candidate); (4) rerank = the shortlist
    equi-joined back to the vector table on the candidate id. Recall
    is measured, not assumed: tests/test_llm_pipeline5.py gates
    recall@3 against float brute-force ground truth (uniform-random
    synthetic embeddings are PQ's worst case — no manifold structure,
    concentrated distances — so the floor reflects that regime; real
    embedding corpora sit far above it).

    Engine stability: subspace distances are sequential left-folds in
    both engines (bit-identical doubles), so code assignments cannot
    diverge; the 16-term ADC sum is the only unordered float reduction
    and stable_round flattens its ulp-level association drift before
    the shortlist cut and the hash.
    """
    # spread_small (optimization round r14): the embeddings parquet is
    # one small file, so the encode chain's per-row fold work ran as a
    # single task; the spread buys scan-stage parallelism and no-ops on
    # real (wide) scans.
    emb = spread_small(load(spark, sf_dir, "embeddings")).select(
        "vec_id",
        F.transform("embedding", lambda v: v.cast("double")).alias("e"),
    )
    # NOT checkpointed (optimization round r14): the subvector frame
    # feeds three consumers, but it is a narrow explode+slice over one
    # scan — an interleaved A/B measured the materialization barrier
    # SLOWER at sf0.1 (1.6 vs 1.4 s) and a wash at 10× data, so the
    # recompute stays.
    sub = emb.select(
        "vec_id",
        F.explode(F.sequence(F.lit(0), F.lit(_PQ_M - 1))).alias("s"),
        F.col("e"),
    ).select(
        "vec_id",
        "s",
        F.slice("e", F.col("s") * _PQ_DSUB + 1, _PQ_DSUB).alias("sub"),
    )
    cb = sub.filter(F.col("vec_id") < _PQ_K).select(
        F.col("vec_id").alias("j"), "s", F.col("sub").alias("cw")
    )
    d2 = F.aggregate(
        F.zip_with(F.col("sub"), F.col("cw"), lambda a, b: (a - b) * (a - b)),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    # Encode: argmin codeword per (vector, subspace). min over
    # struct(d2, j) = smallest distance, ties to the smallest code id —
    # the same total order as the oracle's ORDER BY d2, j.
    codes = (
        sub.join(F.broadcast(cb), "s")
        .select("vec_id", "s", d2.alias("d2"), "j")
        .groupBy("vec_id", "s")
        .agg(F.min(F.struct("d2", "j")).alias("best"))
        .select("vec_id", "s", F.col("best.j").alias("code"))
    )
    lut = (
        sub.filter(F.col("vec_id") < 8)
        .join(F.broadcast(cb), "s")
        .select(F.col("vec_id").alias("query_id"), "s", "j", d2.alias("d2"))
    )
    x = codes.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("s").alias("xs"),
        F.col("code"),
    )
    scored = (
        x.join(
            F.broadcast(lut),
            (F.col("xs") == F.col("s")) & (F.col("code") == F.col("j")),
        )
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .groupBy("query_id", "neighbor_id")
        .agg(stable_round(F.sum("d2"), 6).alias("pq_d2"))
    )
    ws = Window.partitionBy("query_id").orderBy("pq_d2", "neighbor_id")
    short = (
        scored.withColumn("rn", F.row_number().over(ws))
        .filter(F.col("rn") <= _PQ_SHORTLIST)
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
                emb.filter(F.col("vec_id") < 8).select(
                    F.col("vec_id").alias("query_id"), F.col("e").alias("qe")
                )
            ),
            "query_id",
        )
        .join(emb.select(F.col("vec_id").alias("neighbor_id"),
                         F.col("e").alias("ne")),
              "neighbor_id")
        .select("query_id", "neighbor_id", stable_round(exact_d2, 6).alias("l2_d2"))
    )
    wr = Window.partitionBy("query_id").orderBy("l2_d2", "neighbor_id")
    return (
        rerank.withColumn("rn", F.row_number().over(wr))
        .filter(F.col("rn") <= 3)
        .select("query_id", "neighbor_id", "l2_d2")
    )


def _pq_recall_oracle() -> str:
    """Compose the recall oracle from the PQ oracle ALREADY registered
    (same string, so the approximate set is definitionally the one the
    driver verifies) plus an exact float-L2 ground-truth CTE — L2, not
    cosine, because that's the metric PQ approximates (a cosine truth
    would confound metric mismatch with quantization loss)."""
    from .registry import ORACLES

    pq = ORACLES["quantized_ann_pq_topk"]
    return f"""
    WITH pq AS (SELECT query_id, neighbor_id FROM ({pq})),
    emb2 AS (
        SELECT vec_id, list_transform(embedding, v -> v::DOUBLE) AS e
        FROM embeddings
    ),
    truth AS (
        SELECT query_id, neighbor_id FROM (
            SELECT q.vec_id AS query_id, n.vec_id AS neighbor_id,
                   list_sum(list_transform(range(1, 65),
                            i -> (q.e[i] - n.e[i]) * (q.e[i] - n.e[i]))) AS d2,
                   row_number() OVER (
                       PARTITION BY q.vec_id
                       ORDER BY list_sum(list_transform(range(1, 65),
                                i -> (q.e[i] - n.e[i]) * (q.e[i] - n.e[i]))),
                                n.vec_id) AS rn
            FROM emb2 q JOIN emb2 n ON n.vec_id <> q.vec_id
            WHERE q.vec_id < 8
        ) WHERE rn <= 3
    ),
    tot AS (
        SELECT count(*) AS n_truth, count(DISTINCT query_id) AS n_queries
        FROM truth
    ),
    h AS (
        SELECT count(*) AS n_hits FROM truth JOIN pq USING (query_id, neighbor_id)
    )
    SELECT 'pq' AS method, CAST(n_queries AS BIGINT) AS n_queries,
           CAST(n_truth AS BIGINT) AS n_truth,
           CAST(n_hits AS BIGINT) AS n_hits,
           round(n_hits::DOUBLE / n_truth + 1e-7, 4) AS recall_at_k
    FROM h, tot
    """


@query("ann_pq_recall", oracle=_pq_recall_oracle())
def ann_pq_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retrieval QUALITY of the PQ ADC + rerank cascade: recall@3
    against exact float-L2 ground truth on the same 8 queries — the
    ann_recall_at_k discipline applied to the quantized path, measured
    in-engine, oracle-gated, and reported by bench.py under
    `ann_recall`. Ground truth is L2 (the metric PQ approximates);
    measured ~0.79 on uniform-random vectors — PQ's worst-case regime
    (tests/test_llm_pipeline5.py gates the 0.6 floor)."""
    from ..operators.similarity import recall_against

    emb = load(spark, sf_dir, "embeddings").select(
        "vec_id", F.transform("embedding", lambda v: v.cast("double")).alias("e")
    )
    q = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("query_id"), F.col("e").alias("qe")
    )
    d2 = F.aggregate(
        F.zip_with(F.col("qe"), F.col("e"), lambda a, b: (a - b) * (a - b)),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    w = Window.partitionBy("query_id").orderBy("d2", "neighbor_id")
    truth = (
        F.broadcast(q)
        .join(emb, F.col("vec_id") != F.col("query_id"))
        .select("query_id", F.col("vec_id").alias("neighbor_id"), d2.alias("d2"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("query_id", "neighbor_id")
    )
    return recall_against(quantized_ann_pq_topk(spark, sf_dir), truth, "pq")


# ---------------------------------------------------------------------------
# IVF-PQ (IVFADC) — coarse inverted file + residual product quantization
# ---------------------------------------------------------------------------

# Same cosine text as llm_queries._COS_PAIR (kept in one place there —
# imported, not re-derived, so the coarse assignment here and the
# one in similarity_ivf_topk can never drift).
from .llm_queries import _COS_PAIR  # noqa: E402

_IVFPQ_COARSE, _IVFPQ_NPROBE, _IVFPQ_SHORT = 16, 2, 50
_IVFPQ_D2_SQL = """
    list_sum(list_transform(range(1, 5),
             i -> (d.sub[i] - c2.cw[i]) * (d.sub[i] - c2.cw[i])))
"""


@query(
    "ann_ivfpq_topk",
    oracle=f"""
    WITH v AS (
        SELECT vec_id, list_transform(range(1, 65), i -> embedding[i]::DOUBLE) AS emb
        FROM embeddings
    ),
    c AS (SELECT vec_id AS cid, emb AS cv FROM v WHERE vec_id < {_IVFPQ_COARSE}),
    assign_scored AS (
        SELECT v.vec_id, c.cid,
               {_COS_PAIR.format(a="v.emb", b="c.cv")} AS csim
        FROM v, c
    ),
    corpus_cells AS (
        SELECT vec_id AS nid, cid FROM (
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
        ) WHERE rn <= {_IVFPQ_NPROBE}
    ),
    res AS (
        SELECT cc.nid, cc.cid,
               list_transform(range(1, 65), i -> v.emb[i] - c.cv[i]) AS r
        FROM corpus_cells cc
        JOIN v ON v.vec_id = cc.nid
        JOIN c ON c.cid = cc.cid
    ),
    rsub AS (
        SELECT nid, cid, s, list_slice(r, 4 * s + 1, 4 * s + 4) AS sub
        FROM res, (SELECT unnest(range(0, 16)) AS s)
    ),
    cbsrc AS (
        SELECT nid AS sid, row_number() OVER (ORDER BY nid) - 1 AS j
        FROM (SELECT DISTINCT nid FROM res WHERE nid >= 16 AND nid < 32)
    ),
    cb AS (
        SELECT cbsrc.j, rsub.s, rsub.sub AS cw
        FROM rsub JOIN cbsrc ON rsub.nid = cbsrc.sid
    ),
    enc AS (
        SELECT d.nid, d.s, c2.j, {_IVFPQ_D2_SQL} AS d2
        FROM rsub d JOIN cb c2 ON c2.s = d.s
    ),
    codes AS (
        SELECT nid, s, j AS code FROM (
            SELECT *, row_number() OVER (PARTITION BY nid, s
                                         ORDER BY d2, j) AS rn
            FROM enc
        ) WHERE rn = 1
    ),
    qres AS (
        SELECT q.query_id, q.cid,
               list_transform(range(1, 65), i -> v.emb[i] - c.cv[i]) AS r
        FROM query_cells q
        JOIN v ON v.vec_id = q.query_id
        JOIN c ON c.cid = q.cid
    ),
    qsub AS (
        SELECT query_id, cid, s, list_slice(r, 4 * s + 1, 4 * s + 4) AS sub
        FROM qres, (SELECT unnest(range(0, 16)) AS s)
    ),
    lut AS (
        SELECT d.query_id, d.cid, d.s, c2.j, {_IVFPQ_D2_SQL} AS d2
        FROM qsub d JOIN cb c2 ON c2.s = d.s
    ),
    scored AS (
        SELECT l.query_id, x.nid AS neighbor_id,
               round(sum(l.d2) + 1e-7, 6) AS adc_d2
        FROM codes x
        JOIN corpus_cells cc ON cc.nid = x.nid
        JOIN lut l ON l.cid = cc.cid AND l.s = x.s AND l.j = x.code
        WHERE x.nid <> l.query_id
        GROUP BY 1, 2
    ),
    short AS (
        SELECT query_id, neighbor_id FROM (
            SELECT *, row_number() OVER (PARTITION BY query_id
                                         ORDER BY adc_d2, neighbor_id) AS rn
            FROM scored
        ) WHERE rn <= {_IVFPQ_SHORT}
    ),
    rerank AS (
        SELECT s.query_id, s.neighbor_id,
               round(list_sum(list_transform(range(1, 65),
                     i -> (q.emb[i] - n.emb[i]) * (q.emb[i] - n.emb[i])))
                     + 1e-7, 6) AS l2_d2
        FROM short s
        JOIN v q ON q.vec_id = s.query_id
        JOIN v n ON n.vec_id = s.neighbor_id
    )
    SELECT query_id, neighbor_id, l2_d2 FROM (
        SELECT *, row_number() OVER (PARTITION BY query_id
                                     ORDER BY l2_d2, neighbor_id) AS rn
        FROM rerank
    ) WHERE rn <= 3
    """,
)
def ann_ivfpq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ ANN (the IVFADC cascade): coarse IVF cells prune the scan
    to nprobe=2 of 16 cells, product quantization on RESIDUALS (vector
    − cell centroid) compresses candidates to 16 codes, ADC scores
    candidates against a per-(query, probed-cell) residual LUT, and a
    50-deep shortlist is re-ranked with exact float L2 — the composed
    scale path a 100 TB ANN deployment actually runs (flat PQ scans
    every code; IVF alone fetches floats for whole cells). All keyed
    equi-joins; see operators/similarity.ivfpq_ann_topk for the
    distributed shape and determinism argument."""
    from ..operators.similarity import ivfpq_ann_topk

    # spread_small: see quantized_ann_pq_topk — the cascade's heavy
    # assign/residual/encode chain otherwise runs on the 1-task scan.
    emb = spread_small(load(spark, sf_dir, "embeddings")).select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double")).alias("e"),
    )
    return ivfpq_ann_topk(
        emb,
        emb.filter(F.col("vec_id") < 8),
        emb.filter(F.col("vec_id") < _IVFPQ_COARSE),
        emb.filter(
            (F.col("vec_id") >= _IVFPQ_COARSE) & (F.col("vec_id") < 2 * _IVFPQ_COARSE)
        ),
        "vec_id",
        "e",
        k=3,
        nprobe=_IVFPQ_NPROBE,
        shortlist=_IVFPQ_SHORT,
    )


def _ivfpq_recall_oracle() -> str:
    """Same composition as _pq_recall_oracle: the registered IVF-PQ
    oracle as the approximate set, exact float-L2 top-3 as truth."""
    from .registry import ORACLES

    ivfpq = ORACLES["ann_ivfpq_topk"]
    return f"""
    WITH ap AS (SELECT query_id, neighbor_id FROM ({ivfpq})),
    emb2 AS (
        SELECT vec_id, list_transform(embedding, v -> v::DOUBLE) AS e
        FROM embeddings
    ),
    truth AS (
        SELECT query_id, neighbor_id FROM (
            SELECT q.vec_id AS query_id, n.vec_id AS neighbor_id,
                   row_number() OVER (
                       PARTITION BY q.vec_id
                       ORDER BY list_sum(list_transform(range(1, 65),
                                i -> (q.e[i] - n.e[i]) * (q.e[i] - n.e[i]))),
                                n.vec_id) AS rn
            FROM emb2 q JOIN emb2 n ON n.vec_id <> q.vec_id
            WHERE q.vec_id < 8
        ) WHERE rn <= 3
    ),
    tot AS (
        SELECT count(*) AS n_truth, count(DISTINCT query_id) AS n_queries
        FROM truth
    ),
    h AS (
        SELECT count(*) AS n_hits FROM truth JOIN ap USING (query_id, neighbor_id)
    )
    SELECT 'ivfpq' AS method, CAST(n_queries AS BIGINT) AS n_queries,
           CAST(n_truth AS BIGINT) AS n_truth,
           CAST(n_hits AS BIGINT) AS n_hits,
           round(n_hits::DOUBLE / n_truth + 1e-7, 4) AS recall_at_k
    FROM h, tot
    """


@query("ann_ivfpq_recall", oracle=_ivfpq_recall_oracle())
def ann_ivfpq_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retrieval QUALITY of the IVF-PQ cascade: recall@3 against exact
    float-L2 ground truth on the same 8 queries. Recall here is bounded
    above by the coarse quantizer (a true neighbor in an unprobed cell
    is unreachable no matter how good PQ is) — exactly the tradeoff
    IVFADC makes; the test floor reflects the uniform-random worst-case
    regime, and bench reports it under `ann_recall`."""
    from ..operators.similarity import recall_against

    emb = load(spark, sf_dir, "embeddings").select(
        "vec_id", F.transform("embedding", lambda v: v.cast("double")).alias("e")
    )
    q = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("query_id"), F.col("e").alias("qe")
    )
    d2 = F.aggregate(
        F.zip_with(F.col("qe"), F.col("e"), lambda a, b: (a - b) * (a - b)),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    w = Window.partitionBy("query_id").orderBy("d2", "neighbor_id")
    truth = (
        F.broadcast(q)
        .join(emb, F.col("vec_id") != F.col("query_id"))
        .select("query_id", F.col("vec_id").alias("neighbor_id"), d2.alias("d2"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("query_id", "neighbor_id")
    )
    return recall_against(ann_ivfpq_topk(spark, sf_dir), truth, "ivfpq")


# ---------------------------------------------------------------------------
# MinHash estimator quality, token histogram, dedup cascade
# ---------------------------------------------------------------------------

# Reuse the dedup layer's shared corpus/shingle/signature SQL fragments
# and the augmented corpus builder (planted exact + truncated near-dups)
# so the estimator is graded on the same pairs the dedup path emits.
from ..functions.text import (  # noqa: E402
    MINHASH_AB,
    MINHASH_P,
    band_hashes,
    minhash_base,
    minhash_signature,
)
from ..operators.dedup import shingle_sets  # noqa: E402
from .llm_queries import (  # noqa: E402
    _aug_corpus,
    _CORPUS_SQL,
    _MINHASH_SIG_ITEMS,
    _SHINGLES_SQL,
)
from .registry import ORACLES  # noqa: E402


@query(
    "minhash_estimate_quality",
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
    ),
    bands AS (
        SELECT sid, b, md5(array_to_string(sg[(4*b+1):(4*b+4)], '|')) AS h
        FROM sig, (SELECT unnest(range(0, 4)) AS b)
    ),
    cands AS (
        SELECT DISTINCT a.sid AS id_a, b.sid AS id_b
        FROM bands a JOIN bands b ON a.b = b.b AND a.h = b.h AND a.sid < b.sid
    ),
    graded AS (
        SELECT id_a, id_b,
               abs(list_sum(list_transform(range(1, 17),
                       i -> CASE WHEN x.sg[i] = y.sg[i] THEN 1 ELSE 0 END)) / 16.0
                   - len(list_intersect(x.shingles, y.shingles))::DOUBLE
                     / (len(x.shingles) + len(y.shingles)
                        - len(list_intersect(x.shingles, y.shingles)))) AS abs_err
        FROM cands JOIN sig x ON cands.id_a = x.sid JOIN sig y ON cands.id_b = y.sid
    )
    SELECT CAST(count(*) AS BIGINT) AS n_pairs,
           round(avg(abs_err) + 1e-7, 4) AS avg_abs_err,
           round(max(abs_err) + 1e-7, 4) AS max_abs_err,
           CAST(sum(CASE WHEN abs_err > 0.3 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_err_gt_03
    FROM graded
    """,
)
def minhash_estimate_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grade the MinHash ESTIMATOR itself (measure-don't-assume, the
    ann_recall_at_k discipline applied to the dedup path): for every
    LSH candidate pair, compare the signature-based Jaccard estimate
    (matching components / 16) against the exact shingle-set Jaccard,
    and summarize the absolute error. With 16 permutations the
    single-pair std at s≈0.5 is ~0.125, so avg error ~0.1 is the
    expected regime — the committed number documents what the 4×4
    banding's verify step is protecting against.

    Same plan shape as dedup_minhash_lsh (banded bucket self-join;
    candidates only, never all pairs) plus one error aggregate.
    """
    sh = shingle_sets(_aug_corpus(spark, sf_dir), "doc_id", "text", 3).localCheckpoint(
        eager=False
    )
    based = sh.select("sid", "shingles", minhash_base(F.col("shingles")).alias("mhb"))
    sig = based.select(
        "sid", "shingles", *minhash_signature(F.col("mhb"), 16)
    ).withColumn("sg", F.array(*[F.col(f"mh_{i}") for i in range(16)]))
    banded = sig.select("sid", *band_hashes([f"mh_{i}" for i in range(16)], 4))
    long = (
        banded.select(
            "sid",
            F.explode(
                F.array(
                    *[
                        F.struct(F.lit(b).alias("b"), F.col(f"band_{b}").alias("h"))
                        for b in range(4)
                    ]
                )
            ).alias("band"),
        )
        .select("sid", "band.b", "band.h")
        .transform(ckpt_shared)
    )
    a, b_ = long.alias("a"), long.alias("b")
    cands = (
        a.join(b_, (F.col("a.b") == F.col("b.b")) & (F.col("a.h") == F.col("b.h")))
        .filter(F.col("a.sid") < F.col("b.sid"))
        .select(F.col("a.sid").alias("id_a"), F.col("b.sid").alias("id_b"))
        .distinct()
    )
    xa = sig.select(
        F.col("sid").alias("id_a"), F.col("shingles").alias("sh_a"),
        F.col("sg").alias("sg_a"),
    )
    xb = sig.select(
        F.col("sid").alias("id_b"), F.col("shingles").alias("sh_b"),
        F.col("sg").alias("sg_b"),
    )
    est = (
        F.size(
            F.filter(
                F.zip_with(F.col("sg_a"), F.col("sg_b"), lambda x, y: x == y),
                lambda v: v,
            )
        )
        / F.lit(16.0)
    )
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    exact = inter / (F.size("sh_a") + F.size("sh_b") - inter)
    graded = (
        cands.join(xa, "id_a").join(xb, "id_b").select(F.abs(est - exact).alias("abs_err"))
    )
    return graded.agg(
        F.count(F.lit(1)).cast("long").alias("n_pairs"),
        stable_round(F.avg("abs_err"), 4).alias("avg_abs_err"),
        stable_round(F.max("abs_err"), 4).alias("max_abs_err"),
        F.sum(F.when(F.col("abs_err") > 0.3, 1).otherwise(0))
        .cast("long")
        .alias("n_err_gt_03"),
    )


@query(
    "token_count_histogram",
    oracle=f"""
    WITH d AS (
        SELECT len({_TOKS_SQL}) AS n_tokens FROM documents
    ),
    b AS (
        SELECT length(bin(n_tokens)) - 1 AS bucket, n_tokens
        FROM d WHERE n_tokens > 0
    ),
    g AS (
        SELECT bucket, CAST(count(*) AS BIGINT) AS n_docs,
               CAST(min(n_tokens) AS BIGINT) AS min_tokens,
               CAST(max(n_tokens) AS BIGINT) AS max_tokens
        FROM b GROUP BY bucket
    )
    SELECT bucket, n_docs, min_tokens, max_tokens,
           round(n_docs::DOUBLE / sum(n_docs) OVER () + 1e-7, 4) AS share
    FROM g
    """,
)
def token_count_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Power-of-two histogram of tokens-per-document — the sequence-
    length profile a tokenization/packing stage plans against (batch
    shapes, padding waste, chunking policy). The log2 bucket is
    INTEGER-exact in both engines — length(bin(n)) - 1, no floating
    log whose last-ulp could flip a boundary value's bucket.

    Scale shape: per-row token count (in-row, codegen), a bucket-keyed
    aggregate (≤64 buckets regardless of corpus size), and one
    window-total over the bucket-sized result for shares.
    """
    d = load(spark, sf_dir, "documents").select(
        F.size(tokens("text")).alias("n_tokens")
    )
    g = (
        d.filter(F.col("n_tokens") > 0)
        .select((F.length(F.bin("n_tokens")) - 1).alias("bucket"), "n_tokens")
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.min("n_tokens").cast("long").alias("min_tokens"),
            F.max("n_tokens").cast("long").alias("max_tokens"),
        )
    )
    total = Window.partitionBy()
    return g.select(
        F.col("bucket").cast("long").alias("bucket"),
        "n_docs",
        "min_tokens",
        "max_tokens",
        stable_round(
            F.col("n_docs").cast("double") / F.sum("n_docs").over(total), 4
        ).alias("share"),
    )


def _cascade_oracle() -> str:
    pairs = ORACLES["dedup_minhash_lsh"]
    return (
        _CORPUS_SQL
        + f"""
    , keep AS (
        SELECT min(doc_id) AS doc_id FROM corpus
        WHERE text IS NOT NULL GROUP BY md5(text)
    ),
    pairs AS (SELECT id_a, id_b FROM ({pairs})),
    drops AS (
        SELECT DISTINCT p.id_b AS doc_id
        FROM pairs p
        JOIN keep ka ON p.id_a = ka.doc_id
        JOIN keep kb ON p.id_b = kb.doc_id
    ),
    c AS (
        SELECT (SELECT count(*) FROM corpus) AS n_raw,
               (SELECT count(*) FROM keep) AS n_after_exact,
               (SELECT count(*) FROM keep) - (SELECT count(*) FROM drops)
                   AS n_after_neardup
    )
    SELECT CAST(n_raw AS BIGINT) AS n_raw,
           CAST(n_after_exact AS BIGINT) AS n_after_exact,
           CAST(n_after_neardup AS BIGINT) AS n_after_neardup,
           round(n_after_neardup::DOUBLE / n_raw + 1e-7, 4) AS pct_kept
    FROM c
    """
    )


@query("dedup_cascade_attrition", oracle=_cascade_oracle())
def dedup_cascade_attrition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The dedup pipeline END-TO-END: raw corpus → exact dedup (keep
    min doc_id per content hash) → near-dup removal (drop the greater
    id of every verified MinHash pair whose BOTH endpoints survived
    exact dedup), reported as stage attrition counts — the one-row
    summary a curation run logs per snapshot.

    Composition note: the greater-id drop rule is deliberately
    pairwise-greedy (deterministic, engine-portable); the transitively
    consistent variant is dedup_connected_components, which this
    cascade's pair set feeds unchanged. The three stage counts are
    1-row aggregates joined keylessly — O(1) broadcast joins, plan-
    audit whitelisted like every other scalar-aggregate join.
    """
    from ..operators.dedup import minhash_lsh_pairs

    corpus = _aug_corpus(spark, sf_dir).transform(ckpt_shared)
    n_raw = corpus.agg(F.count(F.lit(1)).alias("n_raw"))
    # NULL-text rows are excluded before hashing, like
    # operators/dedup.exact_duplicates: md5(NULL) groups every
    # NULL-content doc into one fake duplicate cluster and all but one
    # would be dropped without their content ever being compared.
    keep = (
        corpus.filter(F.col("text").isNotNull())
        .groupBy(F.md5("text").alias("h"))
        .agg(F.min("doc_id").alias("doc_id"))
        .select("doc_id")
        .transform(ckpt_shared)
    )
    pairs = minhash_lsh_pairs(
        corpus, "doc_id", "text", num_hashes=16, bands=4, shingle_n=3, threshold=0.5
    )
    drops = (
        pairs.join(keep.withColumnRenamed("doc_id", "id_a"), "id_a")
        .join(keep.withColumnRenamed("doc_id", "id_b"), "id_b")
        .select(F.col("id_b").alias("doc_id"))
        .distinct()
    )
    n_keep = keep.agg(F.count(F.lit(1)).alias("n_after_exact"))
    n_drop = drops.agg(F.count(F.lit(1)).alias("n_drops"))
    return (
        n_raw.join(n_keep)
        .join(n_drop)
        .select(
            F.col("n_raw").cast("long").alias("n_raw"),
            F.col("n_after_exact").cast("long").alias("n_after_exact"),
            (F.col("n_after_exact") - F.col("n_drops"))
            .cast("long")
            .alias("n_after_neardup"),
            stable_round(
                (F.col("n_after_exact") - F.col("n_drops")).cast("double")
                / F.col("n_raw"),
                4,
            ).alias("pct_kept"),
        )
    )


@query(
    "substring_dup_spans",
    oracle=f"""
    WITH d AS (
        SELECT doc_id, {_TOKS_SQL} AS toks FROM documents
    ),
    sh AS (
        SELECT doc_id, i AS pos,
               array_to_string(toks[i:i+4], ' ') AS shingle
        FROM d, unnest(range(1, len(toks) - 3)) AS t(i)
        WHERE len(toks) >= 5
    ),
    hot AS (
        SELECT shingle FROM sh GROUP BY shingle
        HAVING count(DISTINCT doc_id) >= 2
    ),
    dup AS (
        SELECT s.doc_id, s.pos,
               s.pos - row_number() OVER (
                   PARTITION BY s.doc_id ORDER BY s.pos) AS grp
        FROM sh s JOIN hot h USING (shingle)
    ),
    spans AS (
        SELECT doc_id, count(*) AS n_pos, min(pos) AS p0, max(pos) AS p1
        FROM dup GROUP BY doc_id, grp
    )
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_spans,
           CAST(max(p1 - p0 + 5) AS BIGINT) AS max_span_words,
           CAST(sum(n_pos) AS BIGINT) AS dup_shingles
    FROM spans GROUP BY doc_id
    """,
)
def substring_dup_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MAXIMAL duplicated-substring spans per document — the
    span-extraction step of exact substring dedup (Lee et al.,
    "Deduplicating Training Data Makes Language Models Better", which
    removes every ≥50-token substring occurring twice in the corpus).
    A suffix array is inherently sequential; the scale-out equivalent
    is stride-1 window hashing: a span of L ≥ K duplicated words is
    exactly a run of L−K+1 consecutive duplicated K-shingle start
    positions, so maximal spans fall out of a gaps-and-islands pass
    over the positions (pos − row_number is constant within a run).

    Pipeline: positional K=5 word shingles (in-row transform, stride
    1 — NOT deduplicated, unlike ``word_shingles``: positions matter
    here); one shingle groupBy keeps shingles seen in ≥2 DISTINCT
    docs (map-side combine, linear); the hot set joins back on the
    shingle key (equi-join, only duplicated positions survive); one
    window per doc partition merges runs. Output per affected doc:
    span count, longest span in words, duplicated-position count.
    Nothing pairwise, nothing quadratic — the same banded discipline
    as MinHash LSH, applied at sub-document granularity.

    At 100 TB: shingle strings would be xxhash64-ed to 8-byte keys
    before the groupBy/join to cut shuffle bytes (kept as raw strings
    here for DuckDB oracle parity — hashing changes no row counts);
    production K is ~50 tokens (K=5 matches this corpus's planted
    duplication scale). The within-doc window is bounded by document
    length, not corpus size."""
    K = 5
    d = (
        load(spark, sf_dir, "documents")
        .select("doc_id", tokens("text").alias("toks"))
        .filter(F.size("toks") >= K)
    )

    pos_sh = positional_word_shingles(F.col("toks"), K)
    # Lazy localCheckpoint, not cache(): sh feeds BOTH the hot-shingle
    # aggregate and the probe join, and a registered query owns no
    # unpersist hook — checkpoint blocks are released by the context
    # cleaner when the plan drops, where an unreleased cache() would
    # pin the block manager across bench/gate loops (r7 advice; same
    # pattern as the incremental stores).
    sh = (
        d.select("doc_id", F.explode(pos_sh).alias("s"))
        .select("doc_id", F.col("s.pos").alias("pos"), F.col("s.shingle").alias("shingle"))
        .transform(ckpt_shared)
    )
    hot = (
        sh.groupBy("shingle")
        .agg(F.count_distinct("doc_id").alias("nd"))
        .filter(F.col("nd") >= 2)
        .select("shingle")
    )
    w = Window.partitionBy("doc_id").orderBy("pos")
    dup = (
        sh.join(hot, "shingle")
        .select("doc_id", "pos")
        .withColumn("grp", F.col("pos") - F.row_number().over(w))
    )
    spans = dup.groupBy("doc_id", "grp").agg(
        F.count(F.lit(1)).alias("n_pos"),
        F.min("pos").alias("p0"),
        F.max("pos").alias("p1"),
    )
    return spans.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_spans"),
        F.max(F.col("p1") - F.col("p0") + K).cast("long").alias("max_span_words"),
        F.sum("n_pos").cast("long").alias("dup_shingles"),
    )


@query(
    "substring_dedup_clean",
    oracle=f"""
    WITH d AS (
        SELECT doc_id, {_TOKS_SQL} AS toks FROM documents
    ),
    dd AS (
        SELECT doc_id, toks FROM d WHERE len(toks) > 0
    ),
    sh AS (
        SELECT doc_id, i AS pos,
               array_to_string(toks[i:i+4], ' ') AS shingle
        FROM dd, unnest(range(1, len(toks) - 3)) AS t(i)
        WHERE len(toks) >= 5
    ),
    hot AS (
        SELECT shingle FROM sh GROUP BY shingle
        HAVING count(DISTINCT doc_id) >= 2
    ),
    covered AS (
        SELECT DISTINCT s.doc_id, s.pos + o AS cpos
        FROM sh s JOIN hot h USING (shingle),
             unnest(range(0, 5)) AS t(o)
    ),
    words AS (
        SELECT doc_id, i AS pos, toks[i] AS w
        FROM dd, unnest(range(1, len(toks) + 1)) AS t(i)
    ),
    kept AS (
        SELECT w.doc_id, w.pos, w.w
        FROM words w LEFT JOIN covered c
          ON w.doc_id = c.doc_id AND w.pos = c.cpos
        WHERE c.cpos IS NULL
    )
    SELECT dd.doc_id,
           CAST(len(dd.toks) AS BIGINT) AS n_words,
           CAST(len(dd.toks) - count(k.pos) AS BIGINT) AS n_removed,
           md5(coalesce(string_agg(k.w, ' ' ORDER BY k.pos), ''))
               AS clean_md5
    FROM dd LEFT JOIN kept k USING (doc_id)
    GROUP BY dd.doc_id, len(dd.toks)
    """,
)
def substring_dedup_clean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The REMOVAL step of exact substring dedup (Lee et al.): drop
    every word position covered by a cross-document duplicated
    K=5-shingle and emit, per document, the surviving word count and
    an md5 fingerprint of the cleaned text (the fingerprint keeps the
    gate row small while still pinning the exact byte sequence the
    transform would write).

    Same candidate machinery as ``substring_dup_spans`` (positional
    shingles → hot-shingle groupBy → equi-join back), then: covered
    positions are the K-width expansion of duplicated starts (in-row
    sequence explode, distinct), kept words are a broadcast-free
    anti-join on (doc, pos), and the cleaned text is rebuilt by one
    per-doc sort of the kept (pos, word) structs — bounded by document
    length, never corpus size. Everything is keyed by (doc_id, pos):
    the heavy joins shuffle on the doc axis, which is uniformly
    distributed, so no skew handling is needed."""
    K = 5
    # Lazy localCheckpoint: d feeds THREE consumers (the shingle
    # pipeline, the word positions, the per-doc word counts) and
    # tokenization is the expensive projection — without sharing it
    # runs 3x per execution (r7 review finding). Checkpoint, not
    # cache(): registered queries own no unpersist hook (r7 advice).
    d = (
        load(spark, sf_dir, "documents")
        .select("doc_id", tokens("text").alias("toks"))
        .filter(F.size("toks") > 0)
        .transform(ckpt_shared)
    )

    pos_sh = positional_word_shingles(F.col("toks"), K)
    sh = (
        d.filter(F.size("toks") >= K)
        .select("doc_id", F.explode(pos_sh).alias("s"))
        .select(
            "doc_id",
            F.col("s.pos").alias("pos"),
            F.col("s.shingle").alias("shingle"),
        )
        .transform(ckpt_shared)
    )
    hot = (
        sh.groupBy("shingle")
        .agg(F.count_distinct("doc_id").alias("nd"))
        .filter(F.col("nd") >= 2)
        .select("shingle")
    )
    # covered's columns are RENAMED: words and covered share lineage
    # through the cached d, so a same-name join condition degenerates
    # to a trivially-true self-comparison (Spark warns and may
    # mis-resolve); distinct names make the equi-join unambiguous.
    covered = (
        sh.join(hot, "shingle")
        .select(
            F.col("doc_id").alias("c_doc_id"),
            F.explode(
                F.sequence(F.col("pos"), F.col("pos") + (K - 1))
            ).alias("cpos"),
        )
        .distinct()
    )
    # n_words deliberately NOT carried through the word-level rows:
    # it would ride the heaviest shuffle (the per-word anti-join) as
    # dead weight; base recomputes it doc-sized below.
    words = d.select(
        "doc_id", F.posexplode("toks").alias("pos0", "w")
    ).select("doc_id", (F.col("pos0") + 1).cast("long").alias("pos"), "w")
    kept = words.join(
        covered,
        (words["doc_id"] == covered["c_doc_id"]) & (words["pos"] == covered["cpos"]),
        "left_anti",
    )
    rebuilt = kept.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.md5(
            F.concat_ws(
                " ",
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "w"))),
                    lambda s: s["w"],
                ),
            )
        ).alias("clean_md5"),
    )
    base = d.select("doc_id", F.size("toks").cast("long").alias("n_words"))
    return base.join(rebuilt, "doc_id", "left").select(
        "doc_id",
        "n_words",
        (F.col("n_words") - F.coalesce(F.col("n_kept"), F.lit(0)))
        .cast("long")
        .alias("n_removed"),
        F.coalesce(F.col("clean_md5"), F.md5(F.lit(""))).alias("clean_md5"),
    )


@query(
    "decontaminate_clean",
    oracle=f"""
    WITH d AS (
        SELECT doc_id, {_SPLIT_CASE_SQL} AS split, {_TOKS_SQL} AS toks
        FROM documents
    ),
    dd AS (SELECT doc_id, split, toks FROM d WHERE len(toks) > 0),
    train AS (SELECT doc_id, toks FROM dd WHERE split = 'train'),
    evsh AS (
        SELECT DISTINCT array_to_string(toks[i:i+4], ' ') AS shingle
        FROM dd, unnest(range(1, len(toks) - 3)) AS t(i)
        WHERE split <> 'train' AND len(toks) >= 5
    ),
    tsh AS (
        SELECT doc_id, i AS pos,
               array_to_string(toks[i:i+4], ' ') AS shingle
        FROM train, unnest(range(1, len(toks) - 3)) AS t(i)
        WHERE len(toks) >= 5
    ),
    covered AS (
        SELECT DISTINCT s.doc_id, s.pos + o AS cpos
        FROM tsh s JOIN evsh h USING (shingle),
             unnest(range(0, 5)) AS t(o)
    ),
    words AS (
        SELECT doc_id, i AS pos, toks[i] AS w
        FROM train, unnest(range(1, len(toks) + 1)) AS t(i)
    ),
    kept AS (
        SELECT w.doc_id, w.pos, w.w
        FROM words w LEFT JOIN covered c
          ON w.doc_id = c.doc_id AND w.pos = c.cpos
        WHERE c.cpos IS NULL
    )
    SELECT train.doc_id,
           CAST(len(train.toks) AS BIGINT) AS n_words,
           CAST(len(train.toks) - count(k.pos) AS BIGINT) AS n_removed,
           md5(coalesce(string_agg(k.w, ' ' ORDER BY k.pos), ''))
               AS clean_md5
    FROM train LEFT JOIN kept k USING (doc_id)
    GROUP BY train.doc_id, len(train.toks)
    """,
)
def decontaminate_clean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark DECONTAMINATION, removal form (the GPT-3/PaLM recipe):
    every train-split word position covered by a K=5-shingle that also
    occurs anywhere in the val/test splits is dropped, and each train
    doc emits its surviving word count plus an md5 fingerprint of the
    cleaned text. ``split_contamination_ngrams`` is the DETECTION half
    (overlap fractions); this is the half that actually edits the
    training set so eval can't be memorized.

    Same machinery as ``substring_dedup_clean`` with the hot-set
    replaced by the EVAL SHINGLE VOCABULARY: train positional shingles
    equi-join the distinct eval shingles (never doc x doc), covered
    positions are the K-width expansion, kept words are an anti-join
    on (doc, pos), and the cleaned text rebuild is one per-doc sort —
    bounded by document length. At 100 TB the eval vocabulary is tiny
    relative to train (benchmarks are megabytes), so the join's build
    side is the eval set — exactly the broadcast you want; production
    K is 8-13 tokens per the published recipes (K=5 matches this
    corpus's scale)."""
    from .llm_pipeline2 import _split_col

    K = 5
    d = (
        load(spark, sf_dir, "documents")
        .select(
            "doc_id", _split_col().alias("split"), tokens("text").alias("toks")
        )
        .filter(F.size("toks") > 0)
        .transform(ckpt_shared)
    )
    train = d.filter(F.col("split") == "train")
    pos_sh = positional_word_shingles(F.col("toks"), K)
    eval_sh = (
        d.filter(F.col("split") != "train")
        .filter(F.size("toks") >= K)
        .select(F.explode(word_shingles(F.col("toks"), K)).alias("shingle"))
        .distinct()
    )
    tsh = (
        train.filter(F.size("toks") >= K)
        .select("doc_id", F.explode(pos_sh).alias("s"))
        .select(
            "doc_id",
            F.col("s.pos").alias("pos"),
            F.col("s.shingle").alias("shingle"),
        )
    )
    covered = (
        tsh.join(eval_sh, "shingle")
        .select(
            F.col("doc_id").alias("c_doc_id"),
            F.explode(
                F.sequence(F.col("pos"), F.col("pos") + (K - 1))
            ).alias("cpos"),
        )
        .distinct()
    )
    words = train.select(
        "doc_id", F.posexplode("toks").alias("pos0", "w")
    ).select("doc_id", (F.col("pos0") + 1).cast("long").alias("pos"), "w")
    kept = words.join(
        covered,
        (words["doc_id"] == covered["c_doc_id"]) & (words["pos"] == covered["cpos"]),
        "left_anti",
    )
    rebuilt = kept.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.md5(
            F.concat_ws(
                " ",
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "w"))),
                    lambda s: s["w"],
                ),
            )
        ).alias("clean_md5"),
    )
    base = train.select("doc_id", F.size("toks").cast("long").alias("n_words"))
    return base.join(rebuilt, "doc_id", "left").select(
        "doc_id",
        "n_words",
        (F.col("n_words") - F.coalesce(F.col("n_kept"), F.lit(0)))
        .cast("long")
        .alias("n_removed"),
        F.coalesce(F.col("clean_md5"), F.md5(F.lit(""))).alias("clean_md5"),
    )


@query(
    "quality_classifier_score",
    oracle=f"""
    WITH d AS (
        SELECT doc_id, source, {_TOKS_SQL} AS toks FROM documents
    ),
    scored AS (
        SELECT doc_id, source, {QUALITY_SCORE_SQL} AS score
        FROM d WHERE len(toks) > 0
    )
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           round(avg(score) + 1e-7, 4) AS avg_score,
           CAST(sum(CASE WHEN score >= 0.5 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_keep,
           round(min(score) + 1e-7, 4) AS min_score,
           round(max(score) + 1e-7, 4) AS max_score
    FROM scored GROUP BY source
    """,
)
def quality_classifier_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Model-based quality filtering — the fasttext/linear-classifier
    stage of GPT-3/CCNet/DCLM-style pipelines: score each document with a
    bag-of-words linear model over hashed unigram features and keep
    docs above a probability threshold.

    The weight table is the DETERMINISTIC stand-in for a trained
    model: w(tok) = ((md5("qw1:"+tok)[:8] as int) % 2001 − 1000)/1000
    — the same store-nothing hashing trick as the LSH hyperplanes
    (functions/vectors.hyperplane_weight), which makes the operator
    oracle-checkable end-to-end. A production deployment swaps the
    md5 expression for a broadcast literal map of trained weights
    (or a Pandas-UDF model call); every other part of the plan — the
    in-row feature fold, the sigmoid, the threshold rollup — is
    unchanged.

    Scale shape: the entire per-document score is ONE in-row
    projection (transform → aggregate fold over the token array — no
    explode, no per-token shuffle); the only exchange is the final
    per-source rollup. Sub-linear in bytes shuffled, embarrassingly
    parallel in scoring — exactly how a 100 TB corpus wants its
    quality gate."""
    d = load(spark, sf_dir, "documents").select(
        "doc_id", "source", tokens("text").alias("toks")
    ).filter(F.size("toks") > 0)
    # quality_score_expr is the shared md5-weight derivation
    # (functions/vectors hyperplane_weight) — one definition for this
    # query and the composed curation pipeline (curation_pipeline.py).
    scored = d.select("source", quality_score_expr().alias("score"))
    return scored.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        stable_round(F.avg("score"), 4).alias("avg_score"),
        F.sum(F.when(F.col("score") >= 0.5, 1).otherwise(0))
        .cast("long")
        .alias("n_keep"),
        stable_round(F.min("score"), 4).alias("min_score"),
        stable_round(F.max("score"), 4).alias("max_score"),
    )


# --------------------------------------------------------------------------
# Broadcast-bloom decontamination pre-filter (the scale path the
# vocabulary join upgrades to when train is petabytes and eval is
# megabytes)
# --------------------------------------------------------------------------

_BLOOM_M = 1 << 22  # bits (512 KiB bitmap — broadcast-sized)
_BLOOM_K = 5  # hashes per key


def _bloom_positions(col) -> "F.Column":
    """The K bit positions a value sets/tests in the bloom bitmap:
    xxhash64(value, seed_i) mod M, seeds 0..K-1 — computed JVM-side
    (whole-stage codegen) on BOTH the build and probe sides, so the
    two can never hash differently."""
    return F.array(
        *[
            F.pmod(F.xxhash64(col, F.lit(i)), F.lit(_BLOOM_M))
            for i in range(_BLOOM_K)
        ]
    )


@query(
    "decontaminate_bloom",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, {_SPLIT_CASE_SQL} AS split, {_TOKS_SQL} AS tk
        FROM documents
    ),
    sh AS (
        SELECT doc_id, split,
               CASE WHEN len(tk) >= 3
                    THEN list_distinct(list_transform(
                             range(1, len(tk) - 1),
                             i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2]))
                    ELSE [array_to_string(tk, ' ')] END AS shingles
        FROM toks
    ),
    train_ex AS (
        SELECT doc_id, unnest(shingles) AS s FROM sh WHERE split = 'train'
    ),
    eval_vocab AS (
        SELECT DISTINCT unnest(shingles) AS s FROM sh WHERE split <> 'train'
    )
    SELECT t.doc_id,
           count(*) AS n_shingles,
           count(e.s) AS n_hits,
           round(count(e.s)::DOUBLE / count(*) + 1e-7, 4) AS contamination,
           CASE WHEN count(e.s) > 0 THEN 1 ELSE 0 END AS flagged
    FROM train_ex t LEFT JOIN eval_vocab e ON t.s = e.s
    GROUP BY t.doc_id
    """,
)
def decontaminate_bloom(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decontamination DETECTION with a BROADCAST-BLOOM pre-filter:
    per train document, how many of its distinct 3-gram shingles
    occur in the eval-split vocabulary — the same exact answer as a
    plain vocabulary join (the oracle IS that join), but the train
    side's shingles are first screened against a bloom bitmap of the
    eval vocabulary, so at scale the shuffle join only ever sees the
    candidates. Why this is THE shape at 100 TB: train is petabytes
    of shingles, eval benchmarks are megabytes — a 512 KiB bitmap
    (m=2^22 bits, k=5 — ~1e-4 false-positive rate at a million-entry
    vocabulary) broadcast to every executor kills ~all clean shingles
    map-side, before any exchange, turning a petabyte shuffle into a
    megabyte one. False positives cost nothing but a wasted probe:
    survivors still confirm against the exact vocabulary, so the
    result is EXACT — the hash gate proves it.

    Mechanics: bit positions are computed JVM-side (xxhash64 ×
    k seeds, codegen) on both sides; the build PACKS positions into
    64-bit words EXECUTOR-side (groupBy p>>6, bit_or of the set bits
    — r12 advice: collecting raw positions was a driver collect of up
    to m Row objects; packed, the collect is at most m/64 rows =
    65,536 at full width) before the driver assembles the bitmap and
    broadcasts it once; the probe tests positions in an Arrow-batched
    pandas UDF over the position array. Per-doc totals
    (`n_shingles`) aggregate BEFORE the filter, so the pre-filter is
    invisible in the output."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    from .llm_pipeline2 import _split_col

    d = spread_small(load(spark, sf_dir, "documents")).select(
        "doc_id", _split_col().alias("split"), tokens(F.col("text")).alias("tk")
    )
    sh = d.select(
        "doc_id", "split", word_shingles(F.col("tk"), 3).alias("shingles")
    ).localCheckpoint(eager=False)
    eval_vocab = (
        sh.filter(F.col("split") != "train")
        .select(F.explode("shingles").alias("s"))
        .distinct()
        .localCheckpoint(eager=False)  # two consumers: bitmap + confirm join
    )
    # Build: positions packed into 64-bit words executor-side — the
    # driver collect is bounded by m/64 WORD rows (65,536 at m=2^22),
    # never by corpus size and never by m raw positions. Word w holds
    # bits [64w, 64w+64); little-endian bytes keep the byte/bit
    # addressing identical to the probe's p>>3 / p&7 arithmetic.
    words = (
        eval_vocab.select(F.explode(_bloom_positions(F.col("s"))).alias("p"))
        .groupBy(F.shiftright("p", 6).alias("w"))
        .agg(F.bit_or(F.expr("shiftleft(1L, p & 63)")).alias("bits"))
        .collect()
    )
    bitmap = bytearray(_BLOOM_M // 8)
    for r in words:
        bitmap[r.w * 8 : r.w * 8 + 8] = (r.bits & 0xFFFFFFFFFFFFFFFF).to_bytes(
            8, "little"
        )
    bc = spark.sparkContext.broadcast(bytes(bitmap))

    # pandas imported function-locally (repo convention: pandas stays
    # out of plan-registry import time), so the Series type hints are
    # attached as CLASS OBJECTS — the decorator resolves annotations
    # against the function's globals, where `pd` does not exist under
    # `from __future__ import annotations`.
    def _might_contain(pos):
        b = bc.value
        return pos.map(
            lambda arr: all(b[p >> 3] & (1 << (p & 7)) for p in arr)
        )

    _might_contain.__annotations__ = {"pos": pd.Series, "return": pd.Series}
    might_contain = pandas_udf("boolean")(_might_contain)

    train = sh.filter(F.col("split") == "train").select(
        "doc_id", F.explode("shingles").alias("s")
    ).transform(ckpt_shared)  # two consumers: totals + probe
    totals = train.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_shingles"))
    survivors = train.filter(
        might_contain(_bloom_positions(F.col("s")))
    )
    hits = (
        survivors.join(eval_vocab, "s")  # exact confirm — kills bloom FPs
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_hits"))
    )
    return totals.join(hits, "doc_id", "left").select(
        "doc_id",
        "n_shingles",
        F.coalesce("n_hits", F.lit(0)).cast("long").alias("n_hits"),
        stable_round(
            F.coalesce("n_hits", F.lit(0)).cast("double")
            / F.col("n_shingles"),
            4,
        ).alias("contamination"),
        F.when(F.coalesce("n_hits", F.lit(0)) > 0, F.lit(1))
        .otherwise(F.lit(0))
        .alias("flagged"),
    )
