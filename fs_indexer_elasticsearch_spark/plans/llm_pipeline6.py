"""Corpus curation operators, part 6: training-export preparation.

The last mile of a pre-training data pipeline — after filtering and
dedup, the corpus must be packed into fixed-length sequences, split
into balanced shards, ordered for curriculum schedules, and sized
against the model's context window. No counterpart in the reference
engine (which stops at the index/search layer); these extend the
LLM-data layer of llm_pipeline2-5.

Scale design notes (the whole point of these shapes):

- **No global prefix sum.** Sequence packing naively needs a running
  token offset over the whole corpus — a single-partition window at
  100 TB. Real pipelines pack each output shard independently, so the
  plans here first assign a deterministic content hash shard
  (``md5(doc_id)`` — identical bytes in Spark and DuckDB, unlike the
  engines' native ``hash()``), then run the window per ``(lang,
  shard)``. Every window partition is ~corpus/shards and the job is
  embarrassingly parallel; the only cost is per-shard tail waste,
  which ``sequence_packing_stats`` measures rather than hides.
- **No global sort.** Shard assignment is hash-based, not
  ``ntile``-over-global-order; balance is *audited*
  (``shard_balance_audit``) instead of forced by a total order.
- **Bounded-domain bucketing.** Curriculum deciles bucket on a score
  already bounded in [0, 1] (``floor(score * 10)``) — no
  percentile/ntile pass, so the bucketing is a map-side expression.
- The tiny context-size axis of ``context_truncation_loss`` is a
  4-row exploded literal — broadcast by construction.

All six queries are pure DataFrame plans (no UDFs, no collect:
packing, shard audit, curriculum, context sizing, weighted sampling,
temperature mixture); each has a
DuckDB oracle twin for the hash-compare gate.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from ..functions.hashing import md5_shard, md5_shard_sql
from ..functions.text import distinct_tokens, token_count
from ..tables import load
from .registry import query, stable_round

#: Sequence/packing budget (tokens per packed training sequence).
PACK_BUDGET = 2048

#: Hash-shard counts. Packing uses few shards so sf0.01 still produces
#: multi-doc bins; the balance audit uses 16 to make skew visible.
PACK_SHARDS = 8
AUDIT_SHARDS = 16


_HEX = "0123456789abcdef"


def _shard_col(n: int) -> F.Column:
    """The canonical content-shard assignment (functions.hashing.
    md5_shard) applied to doc_id — the same function the export sink
    writes with, so this module's audits grade the real layout."""
    return md5_shard(F.col("doc_id"), n)


def _shard_sql(n: int) -> str:
    return md5_shard_sql("doc_id", n)


# ---------------------------------------------------------------------------
# sequence_packing_stats
# ---------------------------------------------------------------------------

_PACK_ORACLE = f"""
WITH d AS (
    SELECT doc_id, lang,
           len(list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
                           x -> x <> '')) AS tok,
           {_shard_sql(PACK_SHARDS)} AS shard
    FROM documents
),
t AS (
    SELECT lang, shard, tok,
           COALESCE(sum(tok) OVER (PARTITION BY lang, shard ORDER BY doc_id
                                   ROWS BETWEEN UNBOUNDED PRECEDING
                                            AND 1 PRECEDING), 0) AS start
    FROM d WHERE tok > 0
),
s AS (
    SELECT lang, shard,
           count(*) AS n_docs,
           CAST(sum(tok) AS BIGINT) AS shard_tokens,
           CAST(sum(CASE WHEN CAST(floor(start / {PACK_BUDGET}) AS BIGINT)
                          <> CAST(floor((start + tok - 1) / {PACK_BUDGET}) AS BIGINT)
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_straddlers
    FROM t GROUP BY lang, shard
)
SELECT lang,
       CAST(sum(n_docs) AS BIGINT) AS n_docs,
       CAST(sum(shard_tokens) AS BIGINT) AS total_tokens,
       CAST(sum(CAST(ceil(shard_tokens / {PACK_BUDGET}) AS BIGINT)) AS BIGINT)
           AS n_bins,
       CAST(sum(n_straddlers) AS BIGINT) AS n_straddlers,
       round(sum(shard_tokens)::DOUBLE
             / (sum(CAST(ceil(shard_tokens / {PACK_BUDGET}) AS BIGINT))
                * {PACK_BUDGET}) + 1e-7, 4) AS fill_rate
FROM s GROUP BY lang
"""


@query("sequence_packing_stats", oracle=_PACK_ORACLE)
def sequence_packing_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contiguous sequence packing, sharded: per language, how many
    PACK_BUDGET-token training bins the corpus packs into, the fill
    rate, and how many documents straddle a bin boundary (the docs a
    masking-aware loader must split or a strict loader must drop).

    Packing is *per (lang, content-shard)* — each shard packs its own
    contiguous stream (offset via a windowed running sum ordered by
    doc_id), so no partition ever sees more than ~1/PACK_SHARDS of a
    language and the global-prefix-sum bottleneck never exists. Tail
    waste from per-shard packing is exactly what fill_rate reports.
    """
    docs = load(spark, sf_dir, "documents")
    d = (
        docs.select(
            "doc_id",
            "lang",
            token_count("text").alias("tok"),
        )
        .where(F.col("tok") > 0)
        .withColumn("shard", _shard_col(PACK_SHARDS))
    )
    w = (
        Window.partitionBy("lang", "shard")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    t = d.withColumn("start", F.coalesce(F.sum("tok").over(w), F.lit(0)))
    straddle = (
        F.floor(F.col("start") / PACK_BUDGET)
        != F.floor((F.col("start") + F.col("tok") - 1) / PACK_BUDGET)
    ).cast("int")
    s = t.groupBy("lang", "shard").agg(
        F.count("*").alias("n_docs"),
        F.sum("tok").alias("shard_tokens"),
        F.sum(straddle).alias("n_straddlers"),
    )
    bins = F.ceil(F.col("shard_tokens") / PACK_BUDGET)
    return s.groupBy("lang").agg(
        F.sum("n_docs").alias("n_docs"),
        F.sum("shard_tokens").alias("total_tokens"),
        F.sum(bins).alias("n_bins"),
        F.sum("n_straddlers").alias("n_straddlers"),
        stable_round(
            F.sum("shard_tokens") / (F.sum(bins) * PACK_BUDGET), 4
        ).alias("fill_rate"),
    )


# ---------------------------------------------------------------------------
# shard_balance_audit
# ---------------------------------------------------------------------------

_BALANCE_ORACLE = f"""
WITH d AS (
    SELECT {_shard_sql(AUDIT_SHARDS)} AS shard,
           len(list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
                           x -> x <> '')) AS tok
    FROM documents
),
s AS (
    SELECT shard, count(*) AS n_docs, CAST(sum(tok) AS BIGINT) AS total_tokens
    FROM d GROUP BY shard
)
SELECT shard,
       CAST(n_docs AS BIGINT) AS n_docs,
       total_tokens,
       round(n_docs / avg(n_docs) OVER () - 1 + 1e-7, 4) AS doc_dev,
       round(total_tokens / avg(total_tokens) OVER () - 1 + 1e-7, 4) AS token_dev
FROM s
"""


@query("shard_balance_audit", oracle=_BALANCE_ORACLE)
def shard_balance_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audit of the deterministic hash-shard assignment used for
    training export: per-shard doc and token counts plus relative
    deviation from the uniform mean.

    Hash sharding needs no global sort (an ``ntile``-over-total-order
    shard assignment would be a single-partition window at 100 TB);
    instead balance is *measured*. The deviation window runs over the
    AUDIT_SHARDS-row aggregate, not the corpus, so the empty-partition
    window is a 16-row driver-sized step after the distributed agg.
    """
    docs = load(spark, sf_dir, "documents")
    s = (
        docs.select(
            _shard_col(AUDIT_SHARDS).alias("shard"),
            token_count("text").alias("tok"),
        )
        .groupBy("shard")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("tok").alias("total_tokens"),
        )
    )
    w = Window.partitionBy()
    return s.select(
        "shard",
        "n_docs",
        "total_tokens",
        stable_round(F.col("n_docs") / F.avg("n_docs").over(w) - 1, 4).alias(
            "doc_dev"
        ),
        stable_round(
            F.col("total_tokens") / F.avg("total_tokens").over(w) - 1, 4
        ).alias("token_dev"),
    )


# ---------------------------------------------------------------------------
# curriculum_quality_deciles
# ---------------------------------------------------------------------------

_CURRICULUM_ORACLE = """
WITH d AS (
    SELECT list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
                       x -> x <> '') AS toks,
           n_chars
    FROM documents
),
s AS (
    SELECT len(toks) AS tok, n_chars,
           len(list_distinct(toks))::DOUBLE / len(toks) AS score
    FROM d WHERE len(toks) > 0
)
SELECT least(CAST(floor(score * 10) AS BIGINT), 9) AS decile,
       count(*) AS n_docs,
       CAST(sum(tok) AS BIGINT) AS total_tokens,
       round(avg(n_chars) + 1e-7, 2) AS avg_chars
FROM s GROUP BY decile
"""


@query("curriculum_quality_deciles", oracle=_CURRICULUM_ORACLE)
def curriculum_quality_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token mass per quality band, for curriculum-ordered training
    (feed higher-quality bands later in training): documents bucketed
    by distinct-token ratio into fixed-width deciles.

    The score is already bounded in [0, 1], so the decile is a pure
    map-side expression (``floor(score*10)``) — no percentile or
    ``ntile`` pass, no extra shuffle beyond the final 10-group agg.
    """
    docs = load(spark, sf_dir, "documents")
    s = docs.select(
        token_count("text").alias("tok"),
        F.size(distinct_tokens("text")).alias("dtok"),
        "n_chars",
    ).where(F.col("tok") > 0)
    score = F.col("dtok") / F.col("tok")
    return (
        s.withColumn(
            "decile", F.least(F.floor(score * 10), F.lit(9).cast("bigint"))
        )
        .groupBy("decile")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("tok").alias("total_tokens"),
            stable_round(F.avg("n_chars"), 2).alias("avg_chars"),
        )
    )


# ---------------------------------------------------------------------------
# context_truncation_loss
# ---------------------------------------------------------------------------

_CTX_SIZES = (256, 512, 1024, 2048)

# ---------------------------------------------------------------------------
# weighted_sample_stats
# ---------------------------------------------------------------------------

#: Docs sampled per language.
SAMPLE_K = 200

# Exact uniform in (0, 1): first 6 md5 hex chars decoded to an integer
# in [0, 16^6) then shifted by +1 (never 0) over 16^6 — exactly
# representable in a double, so both engines compute the identical u.
_U_DENOM = 16**6


def _u_col() -> F.Column:
    h = F.md5(F.col("doc_id").cast("string"))
    v = F.lit(0)
    for i in range(6):
        v = v * 16 + (F.instr(F.lit(_HEX), F.substring(h, i + 1, 1)) - 1)
    return (v + 1) / F.lit(float(_U_DENOM))


def _u_sql() -> str:
    # Horner form mirroring _u_col's left fold.
    expr = f"(instr('{_HEX}', substr(h, 1, 1)) - 1)"
    for i in range(2, 7):
        expr = f"({expr}) * 16 + (instr('{_HEX}', substr(h, {i}, 1)) - 1)"
    return f"(({expr}) + 1) / {float(_U_DENOM)}"


_SAMPLE_ORACLE = f"""
WITH d AS (
    SELECT doc_id, lang, md5(doc_id::VARCHAR) AS h,
           len(list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
                           x -> x <> '')) AS tok,
           len(list_distinct(list_filter(
               regexp_split_to_array(lower(text), '[^a-z0-9]+'),
               x -> x <> '')))::DOUBLE
               / len(list_filter(regexp_split_to_array(lower(text),
                                                       '[^a-z0-9]+'),
                                 x -> x <> '')) AS score
    FROM documents
    WHERE len(list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
              x -> x <> '')) > 0
),
w AS (
    SELECT doc_id, lang, tok,
           CASE WHEN score >= 0.8 THEN 4
                WHEN score >= 0.5 THEN 2 ELSE 1 END AS weight,
           {_u_sql()} AS u
    FROM d
),
p AS (
    SELECT doc_id, lang, tok, weight,
           CASE weight WHEN 1 THEN u
                       WHEN 2 THEN sqrt(u)
                       ELSE sqrt(sqrt(u)) END AS priority
    FROM w
),
r AS (
    SELECT lang, tok, weight,
           row_number() OVER (PARTITION BY lang
                              ORDER BY priority DESC, doc_id) AS rn
    FROM p
)
SELECT lang, weight,
       count(*) AS n_sampled,
       CAST(sum(tok) AS BIGINT) AS sampled_tokens
FROM r WHERE rn <= {SAMPLE_K}
GROUP BY lang, weight
"""


@query("weighted_sample_stats", oracle=_SAMPLE_ORACLE)
def weighted_sample_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic weighted sampling without replacement
    (Efraimidis-Spirakis A-ES): each doc draws priority u^(1/w) from a
    content-derived uniform and the top SAMPLE_K per language are the
    sample; higher-quality weight classes (w = 1/2/4 by distinct-token
    ratio band) are overrepresented proportionally. Output: sample
    composition per (lang, weight).

    Cross-engine determinism is engineered, not assumed: u is an
    md5-derived dyadic rational (exact in a double) and the weights
    are powers of two, so u^(1/w) is an IEEE-exact sqrt chain — no
    transcendental whose last-ulp could differ between Spark and
    DuckDB and flip a rank at the selection boundary.

    Scale: the per-language top-K runs as a two-phase tournament —
    per (lang, content-shard) top-K first, then top-K of the
    SAMPLE_K x PACK_SHARDS survivors — so no window partition ever
    holds a whole language (same reason sequence_packing_stats
    shards). Phase 2 operates on K x shards rows per language.
    """
    docs = load(spark, sf_dir, "documents")
    d = docs.select(
        "doc_id",
        "lang",
        token_count("text").alias("tok"),
        F.size(distinct_tokens("text")).alias("dtok"),
    ).where(F.col("tok") > 0)
    score = F.col("dtok") / F.col("tok")
    weight = (
        F.when(score >= 0.8, 4).when(score >= 0.5, 2).otherwise(1)
    )
    u = _u_col()
    priority = (
        F.when(F.col("weight") == 1, F.col("u"))
        .when(F.col("weight") == 2, F.sqrt("u"))
        .otherwise(F.sqrt(F.sqrt("u")))
    )
    p = (
        d.withColumn("weight", weight)
        .withColumn("u", u)
        .withColumn("priority", priority)
        .withColumn("shard", _shard_col(PACK_SHARDS))
    )
    # Phase 1: per-(lang, shard) top-K — every global top-K member is
    # its shard's top-K, so no candidate is lost.
    w1 = Window.partitionBy("lang", "shard").orderBy(
        F.col("priority").desc(), "doc_id"
    )
    cand = p.withColumn("rn", F.row_number().over(w1)).where(
        F.col("rn") <= SAMPLE_K
    )
    # Phase 2: top-K of the K x shards survivors per language.
    w2 = Window.partitionBy("lang").orderBy(F.col("priority").desc(), "doc_id")
    sample = cand.withColumn("rn2", F.row_number().over(w2)).where(
        F.col("rn2") <= SAMPLE_K
    )
    return sample.groupBy("lang", "weight").agg(
        F.count("*").alias("n_sampled"),
        F.sum("tok").alias("sampled_tokens"),
    )


# ---------------------------------------------------------------------------
# mixture_temperature_weights
# ---------------------------------------------------------------------------

#: Token budget the epoch plan is computed against.
MIX_BUDGET = 2_000_000

_TEMP_ORACLE = f"""
WITH s AS (
    SELECT source,
           CAST(sum(len(list_filter(
               regexp_split_to_array(lower(text), '[^a-z0-9]+'),
               x -> x <> ''))) AS BIGINT) AS n_tokens
    FROM documents GROUP BY source
    HAVING n_tokens > 0
),
t AS (
    SELECT source, n_tokens,
           n_tokens::DOUBLE / sum(n_tokens) OVER () AS p_nat,
           sqrt(n_tokens::DOUBLE) / sum(sqrt(n_tokens::DOUBLE)) OVER ()
               AS p_alpha
    FROM s
)
SELECT source, n_tokens,
       round(p_nat + 1e-7, 6) AS p_natural,
       round(p_alpha + 1e-7, 6) AS p_temperature,
       round(p_alpha * {MIX_BUDGET} / n_tokens + 1e-7, 4) AS epochs_at_budget
FROM t
"""


@query("mixture_temperature_weights", oracle=_TEMP_ORACLE)
def mixture_temperature_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaled source mixture (p_i proportional to n_i^alpha,
    alpha = 0.5): the XLM-R-style reweighting that upsamples small
    sources; reports each source's natural share, temperature share,
    and the epochs over its data implied by a MIX_BUDGET-token
    sampling plan (epochs > 1 = the source repeats).

    alpha = 0.5 is computed as sqrt (IEEE-exact, cross-engine safe).
    The window runs over the per-source aggregate — a handful of rows
    — after the distributed token count, so the empty-partition
    window is a driver-sized final step.
    """
    docs = load(spark, sf_dir, "documents")
    # A source whose documents carry zero tokens has no defined epoch
    # count (x/0: Spark non-ANSI NULL vs DuckDB Inf) and no data to
    # mix — excluded identically on both sides.
    s = (
        docs.groupBy("source")
        .agg(F.sum(token_count("text")).alias("n_tokens"))
        .filter(F.col("n_tokens") > 0)
    )
    w = Window.partitionBy()
    p_nat = F.col("n_tokens") / F.sum("n_tokens").over(w)
    p_alpha = F.sqrt(F.col("n_tokens")) / F.sum(F.sqrt(F.col("n_tokens"))).over(w)
    return s.select(
        "source",
        "n_tokens",
        stable_round(p_nat, 6).alias("p_natural"),
        stable_round(p_alpha, 6).alias("p_temperature"),
        stable_round(p_alpha * MIX_BUDGET / F.col("n_tokens"), 4).alias(
            "epochs_at_budget"
        ),
    )

_CTX_ORACLE = f"""
WITH d AS (
    SELECT len(list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
                           x -> x <> '')) AS tok
    FROM documents
),
x AS (
    SELECT tok, ctx
    FROM d, (SELECT unnest([{", ".join(map(str, _CTX_SIZES))}]) AS ctx)
    WHERE tok > 0
)
SELECT ctx,
       CAST(sum(tok) AS BIGINT) AS total_tokens,
       CAST(sum(least(tok, ctx)) AS BIGINT) AS kept_tokens,
       CAST(sum(CASE WHEN tok > ctx THEN 1 ELSE 0 END) AS BIGINT)
           AS n_truncated,
       round(1 - sum(least(tok, ctx))::DOUBLE / sum(tok) + 1e-7, 4)
           AS lost_frac
FROM x GROUP BY ctx
"""


@query("context_truncation_loss", oracle=_CTX_ORACLE)
def context_truncation_loss(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token loss from truncating every document to a fixed context
    window, across candidate window sizes — the sizing study run
    before committing a context length for training.

    The size axis is a 4-row exploded literal crossed against the
    corpus — broadcast by construction (Catalyst plans the cross join
    against a local relation), so the plan is one scan + one 4-group
    agg regardless of corpus size.
    """
    docs = load(spark, sf_dir, "documents")
    d = docs.select(token_count("text").alias("tok")).where(F.col("tok") > 0)
    sizes = F.explode(
        F.array(*[F.lit(s) for s in _CTX_SIZES])
    ).alias("ctx")
    x = d.select("tok", sizes)
    kept = F.least(F.col("tok"), F.col("ctx"))
    return x.groupBy("ctx").agg(
        F.sum("tok").alias("total_tokens"),
        F.sum(kept).alias("kept_tokens"),
        F.sum((F.col("tok") > F.col("ctx")).cast("int")).alias("n_truncated"),
        stable_round(1 - F.sum(kept) / F.sum("tok"), 4).alias("lost_frac"),
    )


# --------------------------------------------------------------------------
# Exact tokenizer token counts (deterministic reference wordpiece)
# --------------------------------------------------------------------------

def _token_count_exact_oracle() -> str:
    """DuckDB twin of the greedy longest-match wordpiece: precompute
    each (word, position)'s greedy step length (LEFT JOIN vocab on
    prefix match, max piece length, fallback 1), then a recursive walk
    advances through every distinct word; per-word counts join back to
    per-(lang, word) frequencies. Vocab VALUES are generated from the
    same Python constant the engine tokenizes with
    (functions/tokenize.py TOKENIZER_VOCAB)."""
    from ..functions.tokenize import vocab_values_sql

    return f"""
    WITH RECURSIVE vocab(piece) AS (VALUES {vocab_values_sql()}),
    toks AS (
        SELECT doc_id, lang,
               list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
                           x -> x <> '') AS tk
        FROM documents
    ),
    words AS (SELECT lang, unnest(tk) AS w FROM toks),
    lw AS (SELECT lang, w, count(*) AS n FROM words GROUP BY lang, w),
    uw AS (SELECT DISTINCT w FROM lw),
    positions AS (SELECT w, unnest(range(1, len(w)+1)) AS pos FROM uw),
    steplen AS (
        SELECT p.w, p.pos, coalesce(max(len(v.piece)), 1) AS adv
        FROM positions p
        LEFT JOIN vocab v ON substr(p.w, p.pos, len(v.piece)) = v.piece
        GROUP BY p.w, p.pos
    ),
    walk(w, pos, ntok) AS (
        SELECT w, 1, 0 FROM uw
        UNION ALL
        SELECT s.w, s.pos + sl.adv, s.ntok + 1
        FROM walk s JOIN steplen sl ON sl.w = s.w AND sl.pos = s.pos
    ),
    wtok AS (SELECT w, max(ntok) AS ntok FROM walk GROUP BY w),
    tok AS (
        SELECT lang, sum(n * ntok) AS total FROM lw JOIN wtok USING (w)
        GROUP BY lang
    ),
    docs AS (SELECT lang, count(*) AS n_docs FROM documents GROUP BY lang)
    SELECT d.lang,
           CAST(d.n_docs AS BIGINT) AS n_docs,
           CAST(coalesce(t.total, 0) AS BIGINT) AS total_tokens,
           round(coalesce(t.total, 0)::DOUBLE / d.n_docs + 1e-7, 3)
               AS avg_tokens
    FROM docs d LEFT JOIN tok t USING (lang)
    """


@query("token_count_exact", oracle=_token_count_exact_oracle())
def token_count_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT tokenizer token counts per language (r6 verdict #3: the
    training-export layer budgeted in heuristic BPE estimates; budgets
    are denominated in real tokenizer tokens).

    The reference tokenizer is greedy longest-match wordpiece over the
    fixed TOKENIZER_VOCAB with char fallback — a real tokenizer
    inference algorithm with a small fixed vocab so DuckDB recomputes
    it exactly (recursive CTE). Spark never tokenizes row-at-a-time:
    counting runs Arrow-batched over DISTINCT words (Heaps-law
    sublinear) and joins counts back to (lang, word) frequencies. A
    real installed tokenizer (tiktoken / HF tokenizers) slots into the
    same plumbing via functions.tokenize.count_tokens_exact_docs'
    tokenizer_spec."""
    from ..functions.text import tokens
    from ..functions.tokenize import word_token_counts

    d = load(spark, sf_dir, "documents")
    words = d.select("lang", F.explode(tokens(F.col("text"))).alias("w"))
    lw = words.groupBy("lang", "w").agg(F.count(F.lit(1)).alias("n"))
    counts = word_token_counts(lw.select("w").distinct())
    tok = (
        lw.join(counts, "w")
        .groupBy("lang")
        .agg(F.sum(F.col("n") * F.col("ntok")).alias("total"))
    )
    docs = d.groupBy("lang").agg(F.count(F.lit(1)).alias("n_docs"))
    return docs.join(tok, "lang", "left").select(
        "lang",
        "n_docs",
        F.coalesce(F.col("total"), F.lit(0)).alias("total_tokens"),
        stable_round(
            F.coalesce(F.col("total"), F.lit(0)) / F.col("n_docs"), 3
        ).alias("avg_tokens"),
    )
