"""Corpus curation operators, part 4: canonical-document selection,
percentile length banding, vocabulary concentration.

Three stages every pre-training data pipeline runs between dedup and
tokenization (no counterpart in the reference engine — this extends
the LLM-data hygiene layer the way llm_pipeline2/3 do):

- ``dedup_keep_best``: exact dedup keys on raw text; REAL pipelines
  key on normalized text (case/whitespace-insensitive) and must then
  CHOOSE which variant survives. Keep-best = longest raw text, then
  lexicographic source, then lowest id — one window over the
  normalized-hash partition, one shuffle.
- ``length_percentile_band``: outlier trimming by per-language
  [p05, p95] character-length band. The bounds are a 2-row-per-lang
  aggregate (exact percentile — at 100 TB swap in percentile_approx
  and re-verify the oracle at the sketch's error bound); the filter
  join broadcasts them.
- ``vocab_concentration``: what fraction of all token occurrences the
  top-100 tokens per language cover — the Zipf-head diagnostic that
  flags boilerplate-flooded or template-generated corpora. Explode →
  (lang, token) count → per-lang rank window → per-lang roll-up; the
  wide explode collapses in the FIRST map-side partial aggregate.

All three are pure DataFrame plans (no UDFs, no collect); each has a
DuckDB oracle twin below for the hash-compare gate.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from ..functions.text import TOKS_SQL, tokens
from ..tables import load, spread_small
from .registry import query, stable_round


@query(
    "dedup_keep_best",
    oracle=r"""
    WITH corpus AS (
        SELECT doc_id, source, text FROM documents
        UNION ALL
        SELECT doc_id + 1000000000000, 'mirror', upper(text) || '  '
        FROM documents WHERE doc_id % 10 = 0
    ), d AS (
        SELECT doc_id, source, text,
               md5(trim(regexp_replace(lower(text), '[[:space:]]+', ' ', 'g'))) AS k
        FROM corpus
    ), r AS (
        SELECT *,
               row_number() OVER (
                   PARTITION BY k
                   ORDER BY length(text) DESC, source, doc_id) AS rn,
               count(*) OVER (PARTITION BY k) AS n
        FROM d
    )
    SELECT k AS cluster_key, doc_id AS keeper_id, source AS keeper_source,
           CAST(n AS BIGINT) AS n_members
    FROM r WHERE rn = 1 AND n > 1
    """,
)
def dedup_keep_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonical-document selection: cluster on NORMALIZED text
    (lower-cased, whitespace-collapsed — catches the trivial variants
    exact dedup misses), then keep the best member per cluster:
    longest raw text, then first source lexicographically, then lowest
    doc_id. One md5 projection, one window shuffle on the 16-byte key;
    nothing quadratic, survives 100 TB like exact dedup does.

    The raw table carries no duplicates, so (like dedup_exact's
    augmented corpus) every 10th doc gets a planted 'mirror' variant —
    upper-cased, whitespace-padded: normalized-equal but raw-different,
    so the query demonstrably CHOOSES a keeper rather than merely
    counting identical rows."""
    base = load(spark, sf_dir, "documents").select("doc_id", "source", "text")
    mirror = base.filter(F.col("doc_id") % 10 == 0).select(
        (F.col("doc_id") + 1_000_000_000_000).alias("doc_id"),
        F.lit("mirror").alias("source"),
        F.concat(F.upper(F.col("text")), F.lit("  ")).alias("text"),
    )
    d = base.union(mirror)
    # \p{Space} == POSIX [[:space:]] == [ \t\n\x0B\f\r] in BOTH
    # engines; a bare \s is Java-vs-RE2 divergent at \x0B (vertical
    # tab), which would split the normalized cluster key cross-engine.
    k = F.md5(
        F.trim(F.regexp_replace(F.lower(F.col("text")), r"\p{Space}+", " "))
    )
    w = Window.partitionBy("k").orderBy(
        F.length("text").desc(), F.col("source"), F.col("doc_id")
    )
    return (
        d.select("doc_id", "source", "text", k.alias("k"))
        .withColumn("rn", F.row_number().over(w))
        .withColumn("n", F.count(F.lit(1)).over(Window.partitionBy("k")))
        .filter((F.col("rn") == 1) & (F.col("n") > 1))
        .select(
            F.col("k").alias("cluster_key"),
            F.col("doc_id").alias("keeper_id"),
            F.col("source").alias("keeper_source"),
            F.col("n").cast("long").alias("n_members"),
        )
    )


@query(
    "length_percentile_band",
    oracle="""
    WITH b AS (
        SELECT lang,
               round(quantile_cont(n_chars, 0.05) + 1e-7, 4) AS lo,
               round(quantile_cont(n_chars, 0.95) + 1e-7, 4) AS hi,
               count(*) AS n_total
        FROM documents GROUP BY lang
    )
    SELECT d.lang, CAST(max(b.n_total) AS BIGINT) AS n_total,
           CAST(count(*) AS BIGINT) AS n_kept,
           round(count(*)::DOUBLE / max(b.n_total) + 1e-7, 4) AS pct_kept,
           max(b.lo) AS lo, max(b.hi) AS hi
    FROM documents d JOIN b USING (lang)
    WHERE d.n_chars >= b.lo AND d.n_chars <= b.hi
    GROUP BY d.lang
    """,
)
def length_percentile_band(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language [p05, p95] length-band trim summary: how many docs
    survive outlier removal and where the band sits. Bounds are an
    EXACT percentile aggregate (tiny result, broadcast back); rounded
    identically on both engines before the comparison so the band
    membership is bit-stable. At 100 TB, percentile_approx replaces
    percentile at a documented error bound — the plan shape (k-row
    aggregate + broadcast filter join) is unchanged."""
    d = load(spark, sf_dir, "documents")
    b = d.groupBy("lang").agg(
        stable_round(F.expr("percentile(n_chars, 0.05)"), 4).alias("lo"),
        stable_round(F.expr("percentile(n_chars, 0.95)"), 4).alias("hi"),
        F.count(F.lit(1)).alias("n_total"),
    )
    return (
        d.join(F.broadcast(b), "lang")
        .filter((F.col("n_chars") >= F.col("lo")) & (F.col("n_chars") <= F.col("hi")))
        .groupBy("lang", "lo", "hi", "n_total")
        .agg(F.count(F.lit(1)).cast("long").alias("n_kept"))
        .select(
            "lang",
            F.col("n_total").cast("long").alias("n_total"),
            "n_kept",
            stable_round(
                F.col("n_kept").cast("double") / F.col("n_total"), 4
            ).alias("pct_kept"),
            "lo",
            "hi",
        )
    )


@query(
    "length_percentile_band_approx",
    oracle="""
    WITH r AS (
        SELECT lang, n_chars,
               row_number() OVER (PARTITION BY lang ORDER BY n_chars) AS rn,
               count(*) OVER (PARTITION BY lang) AS n
        FROM documents
    ), b AS (
        SELECT lang,
               CAST(max(CASE WHEN rn = CAST(ceil(0.05 * n) AS BIGINT)
                             THEN n_chars END) AS BIGINT) AS lo,
               CAST(max(CASE WHEN rn = CAST(ceil(0.95 * n) AS BIGINT)
                             THEN n_chars END) AS BIGINT) AS hi,
               max(n) AS n_total
        FROM r GROUP BY lang
    )
    SELECT d.lang, CAST(max(b.n_total) AS BIGINT) AS n_total,
           CAST(count(*) AS BIGINT) AS n_kept,
           round(count(*)::DOUBLE / max(b.n_total) + 1e-7, 4) AS pct_kept,
           max(b.lo) AS lo, max(b.hi) AS hi
    FROM documents d JOIN b USING (lang)
    WHERE d.n_chars >= b.lo AND d.n_chars <= b.hi
    GROUP BY d.lang
    """,
)
def length_percentile_band_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 100 TB variant of ``length_percentile_band``: per-language
    [p05, p95] band from ``percentile_approx`` (GK sketch,
    accuracy=10000) instead of exact ``percentile``. Exact percentile
    holds every group value in memory during the aggregate; the sketch
    is O(accuracy) per group regardless of corpus size, with rank
    error ≤ n/accuracy. At gate scale (n per group ≤ accuracy) the
    sketch stores ALL samples and answers at the exact rank
    ceil(p·n) — the oracle mirrors that rank arithmetic directly
    (row_number + count per lang), so this row pins the documented
    exact↔approx substitution instead of leaving it a docstring claim.
    Plan shape is identical to the exact variant: k-row aggregate +
    broadcast filter join."""
    d = load(spark, sf_dir, "documents")
    b = d.groupBy("lang").agg(
        F.expr("percentile_approx(n_chars, 0.05, 10000)")
        .cast("long")
        .alias("lo"),
        F.expr("percentile_approx(n_chars, 0.95, 10000)")
        .cast("long")
        .alias("hi"),
        F.count(F.lit(1)).alias("n_total"),
    )
    return (
        d.join(F.broadcast(b), "lang")
        .filter((F.col("n_chars") >= F.col("lo")) & (F.col("n_chars") <= F.col("hi")))
        .groupBy("lang", "lo", "hi", "n_total")
        .agg(F.count(F.lit(1)).cast("long").alias("n_kept"))
        .select(
            "lang",
            F.col("n_total").cast("long").alias("n_total"),
            "n_kept",
            stable_round(
                F.col("n_kept").cast("double") / F.col("n_total"), 4
            ).alias("pct_kept"),
            "lo",
            "hi",
        )
    )


_TOKS = TOKS_SQL  # canonical oracle twin of the engine tokenizer


# Broadcast-model cap for char_bigram_nll: ASCII-ish corpora observe
# ~1-2k bigram types, but CJK-heavy text can reach 10^7-10^8 observed
# types — past any sane broadcast. The model keeps the top-N bigrams
# by count (deterministic tie-break on the bigram), computed as a
# distributed top-k (TakeOrderedAndProject), never a single-partition
# window. Rare bigrams outside the model are simply unscored (dropped
# from n_bigrams and the NLL mean) — identically in both engines.
_BIGRAM_MODEL_CAP = 65536


def bigram_model_capped(cc: DataFrame, cap: int = _BIGRAM_MODEL_CAP) -> DataFrame:
    """Top-``cap`` rows of a (b, c) bigram-count table by count desc,
    tie-break bigram asc. orderBy+limit compiles to
    TakeOrderedAndProject — each partition keeps its local top-cap, the
    driver merges heaps; no global sort, no single-partition window."""
    return cc.orderBy(F.col("c").desc(), "b").limit(cap)


@query(
    "char_bigram_nll",
    oracle=f"""
    WITH bg AS (
        SELECT doc_id,
               unnest(list_transform(range(1, length(lower(text))),
                                     i -> substr(lower(text), i, 2))) AS b
        FROM documents WHERE length(text) >= 2
    ), cc AS (
        SELECT b, count(*) AS c FROM bg GROUP BY b
    ), model AS (
        SELECT b, c FROM cc ORDER BY c DESC, b LIMIT {_BIGRAM_MODEL_CAP}
    ), tot AS (SELECT sum(c) AS t FROM cc),
    lp AS (
        SELECT b, round(ln(c::DOUBLE / t) + 1e-7, 6) AS lp FROM model, tot
    )
    SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
           round(-avg(lp.lp) + 1e-7, 4) AS nll
    FROM bg JOIN lp USING (b)
    GROUP BY doc_id
    """,
)
def char_bigram_nll(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-model quality proxy without a model: per-document mean
    negative log-likelihood of its character bigrams under the
    CORPUS-LEVEL bigram distribution — the cheap stand-in for the
    KenLM-perplexity filter (high NLL ⇒ off-distribution: garbled
    encodings, binary spill, wrong-language text). Two aggregations:
    the model is the bigram count table capped to the top
    ``_BIGRAM_MODEL_CAP`` types (so a CJK-heavy corpus's 10^7+
    observed types can't blow the broadcast; the cap is mirrored in
    the oracle), the per-doc roll-up is one shuffle on doc_id.
    Probabilities stay normalized by the FULL corpus bigram total, so
    the cap only drops rare types from scoring. At 100 TB the
    distribution can be fit on a sample without changing the plan
    shape."""
    d = spread_small(load(spark, sf_dir, "documents")).filter(
        F.length("text") >= 2
    )
    t = F.lower(F.col("text"))
    bigrams = F.transform(
        F.sequence(F.lit(1), F.length(t) - 1),
        lambda i: F.substring(t, i, F.lit(2)),
    )
    bg = d.select("doc_id", F.explode(bigrams).alias("b"))
    cc = bg.groupBy("b").agg(F.count(F.lit(1)).alias("c"))
    tot = cc.agg(F.sum("c").alias("t"))
    lp = bigram_model_capped(cc).join(F.broadcast(tot)).select(
        "b",
        stable_round(F.log(F.col("c").cast("double") / F.col("t")), 6).alias(
            "lp"
        ),
    )
    return (
        bg.join(F.broadcast(lp), "b")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_bigrams"),
            stable_round(-F.avg("lp"), 4).alias("nll"),
        )
    )


@query(
    "token_budget_mixture",
    oracle=f"""
    WITH scored AS (
        SELECT doc_id, lang,
               CAST(len({_TOKS}) AS BIGINT) AS n_tokens,
               round(len(list_distinct({_TOKS}))::DOUBLE
                     / len({_TOKS}) + 1e-7, 6) AS quality
        FROM documents WHERE len({_TOKS}) > 0
    ), ranked AS (
        SELECT *, sum(n_tokens) OVER (
                   PARTITION BY lang ORDER BY quality DESC, doc_id
                   ROWS UNBOUNDED PRECEDING) AS cum_tokens
        FROM scored
    )
    SELECT doc_id, lang, n_tokens, quality, CAST(cum_tokens AS BIGINT) AS cum_tokens
    FROM ranked WHERE cum_tokens <= 2000
    """,
)
def token_budget_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy data-mixing to a per-language token budget: rank each
    language's docs by quality (type-token ratio, tie-break doc_id)
    and keep docs while the running token total stays within budget —
    the selection pass that assembles a fixed-size training mix from
    an over-full corpus. One window shuffle on lang; the cumulative
    sum is a running frame, not a self-join — O(n log n) in the
    per-lang sort, nothing quadratic. At 100 TB the same plan holds
    with lang (or lang × source) as the mixing key."""
    budget = 2000
    d = load(spark, sf_dir, "documents")
    tk = tokens(F.col("text"))
    scored = d.select(
        "doc_id",
        "lang",
        F.size(tk).cast("long").alias("n_tokens"),
        stable_round(
            F.size(F.array_distinct(tk)).cast("double") / F.size(tk), 6
        ).alias("quality"),
    ).filter(F.col("n_tokens") > 0)
    w = (
        Window.partitionBy("lang")
        .orderBy(F.col("quality").desc(), F.col("doc_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        scored.withColumn("cum_tokens", F.sum("n_tokens").over(w).cast("long"))
        .filter(F.col("cum_tokens") <= budget)
        .select("doc_id", "lang", "n_tokens", "quality", "cum_tokens")
    )


@query(
    "template_prefix_by_source",
    oracle=f"""
    WITH p AS (
        SELECT source,
               array_to_string(list_slice({_TOKS}, 1, 3), ' ') AS prefix
        FROM documents WHERE len({_TOKS}) >= 3
    ), c AS (
        SELECT source, prefix, count(*) AS c FROM p GROUP BY 1, 2
    ), t AS (
        SELECT source, count(*) AS total FROM p GROUP BY 1
    ), r AS (
        SELECT source, prefix, c,
               row_number() OVER (
                   PARTITION BY source ORDER BY c DESC, prefix) AS rn
        FROM c
    )
    SELECT r.source, prefix AS top_prefix, CAST(c AS BIGINT) AS prefix_count,
           CAST(total AS BIGINT) AS n_docs,
           round(c::DOUBLE / total + 1e-7, 4) AS share
    FROM r JOIN t USING (source) WHERE rn = 1
    """,
)
def template_prefix_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-document template detection: per source, the most common
    leading 3-token prefix and the share of documents carrying it — a
    high share means the source stamps a boilerplate header on its
    docs (scraper banners, license preambles) that per-document
    repetition stats can't see. Two hash aggregations on (source,
    prefix) / (source) plus a source-partitioned rank window over the
    already-aggregated prefix table — vocabulary-sized, not
    corpus-sized."""
    d = load(spark, sf_dir, "documents")
    tk = tokens(F.col("text"))
    p = d.select(
        "source", F.array_join(F.slice(tk, 1, 3), " ").alias("prefix")
    ).filter(F.size(tk) >= 3)
    c = p.groupBy("source", "prefix").agg(F.count(F.lit(1)).alias("c"))
    t = p.groupBy("source").agg(F.count(F.lit(1)).alias("total"))
    w = Window.partitionBy("source").orderBy(F.col("c").desc(), F.col("prefix"))
    return (
        c.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .join(t, "source")
        .select(
            "source",
            F.col("prefix").alias("top_prefix"),
            F.col("c").cast("long").alias("prefix_count"),
            F.col("total").cast("long").alias("n_docs"),
            stable_round(
                F.col("c").cast("double") / F.col("total"), 4
            ).alias("share"),
        )
    )


_CHUNK, _STRIDE = 64, 48


@query(
    "chunk_documents",
    oracle=f"""
    WITH t AS (
        SELECT doc_id, {_TOKS} AS tk FROM documents
        WHERE len({_TOKS}) > 0 AND doc_id % 5 = 0
    ), c AS (
        SELECT doc_id, tk,
               unnest(range(0, 1 + (greatest(len(tk) - {_CHUNK}, 0)
                                    + {_STRIDE} - 1) // {_STRIDE})) AS i
        FROM t
    )
    SELECT doc_id, CAST(i AS INT) AS chunk_idx,
           CAST(len(list_slice(tk, i*{_STRIDE} + 1, i*{_STRIDE} + {_CHUNK}))
                AS INT) AS n_chunk_tokens,
           array_to_string(
               list_slice(tk, i*{_STRIDE} + 1, i*{_STRIDE} + {_CHUNK}), ' ')
               AS chunk_text
    FROM c
    """,
)
def chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-size overlapping token chunking (64-token chunks,
    48-token stride ⇒ 16-token overlap) — the pre-tokenization
    sharding pass that turns documents into training-sequence-sized
    pieces. Chunk count per doc is 1 + ceil(max(n−chunk,0)/stride):
    full coverage, a shorter final chunk, never a fully-redundant one.
    posexplode over an in-row index sequence — the fan-out happens
    inside the projection (no join, no shuffle until a downstream op
    needs one); at 100 TB chunking is scan-bound, exactly as it
    should be. Sampled to every 5th doc to keep the oracle comparison
    row count reasonable."""
    d = load(spark, sf_dir, "documents").filter(F.col("doc_id") % 5 == 0)
    tk = tokens(F.col("text"))
    t = d.select("doc_id", tk.alias("tk")).filter(F.size("tk") > 0)
    n_chunks = F.floor(
        1
        + (F.greatest(F.size("tk") - F.lit(_CHUNK), F.lit(0)) + (_STRIDE - 1))
        / F.lit(_STRIDE)
    ).cast("int")
    chunk = F.slice(F.col("tk"), F.col("i") * _STRIDE + 1, _CHUNK)
    return (
        t.select(
            "doc_id",
            "tk",
            F.explode(F.sequence(F.lit(0), n_chunks - 1)).alias("i"),
        )
        .select(
            "doc_id",
            F.col("i").cast("int").alias("chunk_idx"),
            F.size(chunk).cast("int").alias("n_chunk_tokens"),
            F.array_join(chunk, " ").alias("chunk_text"),
        )
    )


@query(
    "vocab_concentration",
    oracle="""
    WITH toks AS (
        SELECT lang,
               unnest(list_filter(
                   regexp_split_to_array(lower(text), '[^a-z0-9]+'),
                   x -> x <> '')) AS tok
        FROM documents
    ), counts AS (
        SELECT lang, tok, count(*) AS c FROM toks GROUP BY 1, 2
    ), ranked AS (
        SELECT lang, tok, c,
               row_number() OVER (
                   PARTITION BY lang ORDER BY c DESC, tok) AS rn
        FROM counts
    )
    SELECT lang,
           CAST(sum(c) AS BIGINT) AS total_tokens,
           CAST(count(*) AS BIGINT) AS distinct_tokens,
           CAST(sum(CASE WHEN rn <= 100 THEN c ELSE 0 END) AS BIGINT)
               AS top100_tokens,
           round(sum(CASE WHEN rn <= 100 THEN c ELSE 0 END)::DOUBLE
                 / sum(c) + 1e-7, 4) AS concentration
    FROM ranked GROUP BY lang
    """,
)
def vocab_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf-head diagnostic: per language, the share of ALL token
    occurrences covered by that language's 100 most frequent tokens
    (plus total/distinct token counts). High concentration flags
    boilerplate or template floods before tokenizer training. The
    explode's width collapses in the first (lang, token) partial
    aggregate; the rank window shuffles the already-aggregated count
    table on lang only."""
    d = spread_small(load(spark, sf_dir, "documents"))
    counts = (
        d.select("lang", F.explode(tokens(F.col("text"))).alias("tok"))
        .groupBy("lang", "tok")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    w = Window.partitionBy("lang").orderBy(F.col("c").desc(), F.col("tok"))
    top_c = F.sum(F.when(F.col("rn") <= 100, F.col("c")).otherwise(0))
    return (
        counts.withColumn("rn", F.row_number().over(w))
        .groupBy("lang")
        .agg(
            F.sum("c").cast("long").alias("total_tokens"),
            F.count(F.lit(1)).cast("long").alias("distinct_tokens"),
            top_c.cast("long").alias("top100_tokens"),
            stable_round(
                top_c.cast("double") / F.sum("c"), 4
            ).alias("concentration"),
        )
    )


@query(
    "collocations_pmi",
    oracle=f"""
    WITH tk AS (
        SELECT {_TOKS} AS t FROM documents WHERE len({_TOKS}) >= 2
    ), pairs AS (
        SELECT unnest(list_transform(range(1, len(t)),
                                     i -> t[i] || ' ' || t[i+1])) AS pair
        FROM tk
    ), uni AS (
        SELECT unnest(t) AS w FROM tk
    ), pc AS (
        SELECT pair, count(*) AS c_ab FROM pairs GROUP BY 1
    ), uc AS (
        SELECT w, count(*) AS c FROM uni GROUP BY 1
    ), tot AS (
        SELECT (SELECT sum(c_ab) FROM pc) AS n_pairs,
               (SELECT sum(c) FROM uc) AS n_uni
    )
    SELECT pair, CAST(c_ab AS BIGINT) AS n_pair,
           round(ln( (c_ab::DOUBLE / n_pairs)
                   / ( (a.c::DOUBLE / n_uni) * (b.c::DOUBLE / n_uni) ) )
                 + 1e-7, 6) AS pmi
    FROM pc, tot
    JOIN uc a ON a.w = split_part(pair, ' ', 1)
    JOIN uc b ON b.w = split_part(pair, ' ', 2)
    WHERE c_ab >= 5
    ORDER BY pmi DESC, pair LIMIT 50
    """,
)
def collocations_pmi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collocation mining: top-50 adjacent word pairs by pointwise
    mutual information (min pair count 5) — surfaces multi-word
    expressions and template fragments worth treating as single
    tokens. Adjacent-pair extraction is LINEAR in tokens (never the
    quadratic all-pairs co-occurrence); the unigram table joins in
    twice on the word key with NO broadcast hint — a web-scale
    corpus's unfiltered unigram vocabulary (URLs, hashes, typos) runs
    to 10^8+ distinct tokens, past any broadcast limit, so the join
    must be free to shuffle (AQE still broadcasts it when the stats
    say it fits); the corpus totals ride a broadcast 1-row
    aggregate. The pair table is pre-filtered to c_ab >= 5 BEFORE the
    joins, so the shuffled probe side is the surviving pairs only."""
    d = spread_small(load(spark, sf_dir, "documents"))
    tk = tokens(F.col("text"))
    t = d.select(tk.alias("t")).filter(F.size("t") >= 2)
    pair_expr = F.transform(
        F.sequence(F.lit(1), F.size("t") - 1),
        lambda i: F.concat(
            F.element_at("t", i), F.lit(" "), F.element_at("t", i + 1)
        ),
    )
    pc = (
        t.select(F.explode(pair_expr).alias("pair"))
        .groupBy("pair")
        .agg(F.count(F.lit(1)).alias("c_ab"))
    )
    uc = (
        t.select(F.explode("t").alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    tot = pc.agg(F.sum("c_ab").alias("n_pairs")).join(
        uc.agg(F.sum("c").alias("n_uni"))
    )
    a = uc.select(F.col("w").alias("w_a"), F.col("c").alias("c_a"))
    b = uc.select(F.col("w").alias("w_b"), F.col("c").alias("c_b"))
    pmi = stable_round(
        F.log(
            (F.col("c_ab").cast("double") / F.col("n_pairs"))
            / (
                (F.col("c_a").cast("double") / F.col("n_uni"))
                * (F.col("c_b").cast("double") / F.col("n_uni"))
            )
        ),
        6,
    )
    return (
        pc.filter(F.col("c_ab") >= 5)
        .join(F.broadcast(tot))
        .join(a, F.split("pair", " ").getItem(0) == F.col("w_a"))
        .join(b, F.split("pair", " ").getItem(1) == F.col("w_b"))
        .select(
            "pair",
            F.col("c_ab").cast("long").alias("n_pair"),
            pmi.alias("pmi"),
        )
        .orderBy(F.col("pmi").desc(), "pair")
        .limit(50)
    )
