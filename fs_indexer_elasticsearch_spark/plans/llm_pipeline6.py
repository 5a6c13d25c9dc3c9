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

All four are pure DataFrame plans (no UDFs, no collect); each has a
DuckDB oracle twin for the hash-compare gate.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

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
    """Deterministic content shard in [0, n): first byte of
    md5(doc_id), decoded via an exact nibble lookup. md5 produces
    identical bytes in Spark and DuckDB, so the oracle can mirror the
    assignment exactly (the engines' native hash functions differ).
    The lookup must be exact — ``ascii(ch) % n`` folds '8'/'9' onto
    'a'..'f' residues and leaves slots empty, skewing shards 3x."""
    h = F.md5(F.col("doc_id").cast("string"))
    byte = (F.instr(F.lit(_HEX), F.substring(h, 1, 1)) - 1) * 16 + (
        F.instr(F.lit(_HEX), F.substring(h, 2, 1)) - 1
    )
    return byte % n


def _shard_sql(n: int) -> str:
    return (
        f"((instr('{_HEX}', substr(md5(doc_id::VARCHAR), 1, 1)) - 1) * 16"
        f" + instr('{_HEX}', substr(md5(doc_id::VARCHAR), 2, 1)) - 1) % {n}"
    )


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
