"""End-to-end composed curation pipeline (r7 verdict #4).

Every stage here exists as its own oracle-gated query — URL
canonicalization (domain_queries), origin blocklist (domain_queries),
model-based quality gate (llm_pipeline5), content-hash dedup (llm_queries' dedup_exact shape),
token-budget selection (llm_pipeline6) — but a real C4/RefinedWeb-
style pipeline runs them COMPOSED, and composition is where
column-name drift and multiplicity bugs hide (the r7 review's
tokenizer multiplicity finding was exactly this class). This module
chains all five stages into ONE registered query whose oracle
recomputes the whole chain from scratch, so the gate verifies the
composition, not just the parts.

Stage order (the standard web-pipeline order — cheapest cuts first):

1. URL-canonical dedup: a deterministic noisy URL (scheme flip, www.,
   trailing slash, utm query, fragment — each keyed to a doc_id
   modulus; every 5th doc pair shares a path, so ~10% of the corpus
   arrives as re-crawls whose canonical URLs collide ONLY when
   canonicalization actually strips the noise — the two pair members
   always carry different noise) → keep the lowest doc_id per
   canonical URL. Free compared to content dedup.
2. Origin blocklist: drop the blocked sources (literal IN filter,
   pushed to the scan).
3. Quality gate: hashed-linear classifier score >= 0.5 (the SHARED
   expression quality_score_expr/QUALITY_SCORE_SQL — one definition,
   two queries, zero drift). Empty-token docs drop here (no score).
4. Normalized-content dedup: md5 over the first 8 normalized tokens
   (the paragraph/template-hash dedup of CCNet — raw-byte md5 would be
   a structural no-op on this corpus, where every text is byte-unique
   but boilerplate PREFIXES repeat), keep the lowest doc_id per hash.
5. Token-budget packing: per language, rank survivors by (score desc,
   doc_id) and keep the prefix whose cumulative token count fits the
   budget — the greedy mixture-building step of a training-data
   export.

Output: one row per language with the attrition count after EVERY
stage plus the selected set's token total and doc-id sum (the id sum
pins the selection's exact identity under the hash gate, not just its
size).

Scale shape: stages 1/4 are one window each over a hash partition
(canonical_url / prefix md5 — both near-unique, skew-free); stages 2/3
are pushed filters / in-row projections; stage 5 is one window per
lang partition (bounded by the language count); the final rollup is
six lang-keyed aggregates joined on a tiny key. No collect, no UDF,
nothing quadratic — at 100 TB each boundary is one shuffle of the
surviving rows, and every stage only SHRINKS the data.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from ..functions.text import TOKS_SQL, tokens
from ..tables import ckpt_shared, load
from .domain_queries import _BLOCKLIST, CANON_STEPS
from .llm_pipeline5 import QUALITY_SCORE_SQL, quality_score_expr
from .registry import query

_LANG_TOKEN_BUDGET = 800

_CANON_SQL_STEPS = (
    ("'#.*$', ''"),
    ("'\\?.*$', ''"),
    ("'^http://', 'https://'"),
    ("'^https://www\\.', 'https://'"),
    ("'/+$', ''"),
)


def _canon_sql(inner: str) -> str:
    """Nested regexp_replace chain textually mirroring CANON_STEPS."""
    out = f"lower({inner})"
    for args in _CANON_SQL_STEPS:
        out = f"regexp_replace({out}, {args})"
    return out


_CURATION_ORACLE = f"""
    WITH base AS (
        SELECT doc_id, lang, source, text, {TOKS_SQL} AS toks
        FROM documents
    ),
    noisy AS (
        SELECT *,
               (CASE WHEN doc_id % 5 = 0 THEN 'http://' ELSE 'https://' END)
               || (CASE WHEN doc_id % 2 = 0 THEN 'www.' ELSE '' END)
               || 'Example.com/story/'
               || (CASE WHEN doc_id % 10 < 2 THEN doc_id - doc_id % 2
                        ELSE doc_id END)
               || (CASE WHEN doc_id % 7 = 0 THEN '/' ELSE '' END)
               || (CASE WHEN doc_id % 3 = 0 THEN '?utm_source=feed' ELSE '' END)
               || (CASE WHEN doc_id % 4 = 0 THEN '#section-2' ELSE '' END)
               AS url
        FROM base
    ),
    canon AS (
        SELECT *, {_canon_sql('url')} AS canonical_url FROM noisy
    ),
    s1 AS (
        SELECT * FROM (
            SELECT *, row_number() OVER (
                PARTITION BY canonical_url ORDER BY doc_id) AS rk
            FROM canon
        ) WHERE rk = 1
    ),
    s2 AS (
        SELECT * FROM s1
        WHERE source NOT IN ('{_BLOCKLIST[0]}', '{_BLOCKLIST[1]}', '{_BLOCKLIST[2]}')
    ),
    s3 AS (
        SELECT * FROM (
            SELECT *, {QUALITY_SCORE_SQL} AS score
            FROM s2 WHERE len(toks) > 0
        ) WHERE score >= 0.5
    ),
    s4 AS (
        SELECT * FROM (
            SELECT *, row_number() OVER (
                PARTITION BY md5(array_to_string(toks[1:8], ' '))
                ORDER BY doc_id) AS rk2
            FROM s3
        ) WHERE rk2 = 1
    ),
    s5 AS (
        SELECT * FROM (
            SELECT *, sum(len(toks)) OVER (
                PARTITION BY lang ORDER BY score DESC, doc_id
                ROWS UNBOUNDED PRECEDING) AS cum_tokens
            FROM s4
        ) WHERE cum_tokens <= {_LANG_TOKEN_BUDGET}
    )
    SELECT r.lang,
           CAST(r.n_raw AS BIGINT) AS n_raw,
           CAST(coalesce(u.n, 0) AS BIGINT) AS n_url,
           CAST(coalesce(b.n, 0) AS BIGINT) AS n_block,
           CAST(coalesce(q.n, 0) AS BIGINT) AS n_quality,
           CAST(coalesce(e.n, 0) AS BIGINT) AS n_exact,
           CAST(coalesce(sel.n, 0) AS BIGINT) AS n_selected,
           CAST(coalesce(sel.tok, 0) AS BIGINT) AS selected_tokens,
           CAST(coalesce(sel.ids, 0) AS BIGINT) AS sum_selected_ids
    FROM (SELECT lang, count(*) AS n_raw FROM base GROUP BY lang) r
    LEFT JOIN (SELECT lang, count(*) AS n FROM s1 GROUP BY lang) u USING (lang)
    LEFT JOIN (SELECT lang, count(*) AS n FROM s2 GROUP BY lang) b USING (lang)
    LEFT JOIN (SELECT lang, count(*) AS n FROM s3 GROUP BY lang) q USING (lang)
    LEFT JOIN (SELECT lang, count(*) AS n FROM s4 GROUP BY lang) e USING (lang)
    LEFT JOIN (SELECT lang, count(*) AS n, sum(len(toks)) AS tok,
                      sum(doc_id) AS ids
               FROM s5 GROUP BY lang) sel USING (lang)
"""


def synthetic_url_expr() -> F.Column:
    """The demo corpus's deterministic noisy URL (keyed to doc_id —
    module docstring stage 1); a real crawl would carry its own url
    column instead."""
    return F.concat(
        F.when(F.col("doc_id") % 5 == 0, F.lit("http://")).otherwise(
            F.lit("https://")
        ),
        F.when(F.col("doc_id") % 2 == 0, F.lit("www.")).otherwise(F.lit("")),
        F.lit("Example.com/story/"),
        F.when(
            F.col("doc_id") % 10 < 2, F.col("doc_id") - F.col("doc_id") % 2
        )
        .otherwise(F.col("doc_id"))
        .cast("string"),
        F.when(F.col("doc_id") % 7 == 0, F.lit("/")).otherwise(F.lit("")),
        F.when(F.col("doc_id") % 3 == 0, F.lit("?utm_source=feed")).otherwise(
            F.lit("")
        ),
        F.when(F.col("doc_id") % 4 == 0, F.lit("#section-2")).otherwise(
            F.lit("")
        ),
    )


def curate_stages(
    docs: DataFrame, *, token_budget: int = _LANG_TOKEN_BUDGET
) -> dict[str, DataFrame]:
    """Run the five composed stages over a documents DataFrame
    (columns: doc_id, lang, source, text; url defaults to the demo's
    synthetic one when absent). Returns every stage boundary —
    base/s1..s5 — so callers can report attrition (the registered
    query) or ship the selected set (the corpus-build CLI). Shared by
    both so the CLI can never drift from the oracle-gated plan."""
    d = docs.select(
        "doc_id",
        "lang",
        "source",
        "text",
        tokens("text").alias("toks"),
        (
            F.col("url") if "url" in docs.columns else synthetic_url_expr()
        ).alias("url"),
    )
    canon = F.lower(F.col("url"))
    for pat, rep in CANON_STEPS:
        canon = F.regexp_replace(canon, pat, rep)
    base = d.withColumn("canonical_url", canon).transform(ckpt_shared)

    w_url = Window.partitionBy("canonical_url").orderBy("doc_id")
    s1 = (
        base.withColumn("rk", F.row_number().over(w_url))
        .filter(F.col("rk") == 1)
        .drop("rk")
    )
    s2 = s1.filter(~F.col("source").isin(*_BLOCKLIST))
    s3 = (
        s2.filter(F.size("toks") > 0)
        .withColumn("score", quality_score_expr())
        .filter(F.col("score") >= 0.5)
    )
    w_md5 = Window.partitionBy(
        F.md5(F.concat_ws(" ", F.slice("toks", 1, 8)))
    ).orderBy("doc_id")
    s4 = (
        s3.withColumn("rk2", F.row_number().over(w_md5))
        .filter(F.col("rk2") == 1)
        .drop("rk2")
        # s4 feeds the n_exact rollup AND the packing window AND the
        # selected rollup; share one computation of the whole chain.
        .transform(ckpt_shared)
    )
    w_pack = (
        Window.partitionBy("lang")
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    s5 = s4.withColumn("cum_tokens", F.sum(F.size("toks")).over(w_pack)).filter(
        F.col("cum_tokens") <= token_budget
    )
    return {"base": base, "s1": s1, "s2": s2, "s3": s3, "s4": s4, "s5": s5}


def curation_report(stages: dict[str, DataFrame]) -> DataFrame:
    """Per-language attrition rollup over the stage boundaries — the
    registered query's output shape."""
    def per_lang(df: DataFrame, name: str) -> DataFrame:
        return df.groupBy("lang").agg(F.count(F.lit(1)).alias(name))

    sel = stages["s5"].groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_selected"),
        F.sum(F.size("toks")).alias("selected_tokens"),
        F.sum("doc_id").alias("sum_selected_ids"),
    )
    out = (
        per_lang(stages["base"], "n_raw")
        .join(per_lang(stages["s1"], "n_url"), "lang", "left")
        .join(per_lang(stages["s2"], "n_block"), "lang", "left")
        .join(per_lang(stages["s3"], "n_quality"), "lang", "left")
        .join(per_lang(stages["s4"], "n_exact"), "lang", "left")
        .join(sel, "lang", "left")
    )
    zero = lambda c: F.coalesce(F.col(c), F.lit(0)).cast("long").alias(c)  # noqa: E731
    return out.select(
        "lang",
        F.col("n_raw").cast("long").alias("n_raw"),
        zero("n_url"),
        zero("n_block"),
        zero("n_quality"),
        zero("n_exact"),
        zero("n_selected"),
        zero("selected_tokens"),
        zero("sum_selected_ids"),
    )


@query("curation_pipeline_e2e", oracle=_CURATION_ORACLE)
def curation_pipeline_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The five curation stages COMPOSED (module docstring): URL-canon
    dedup → blocklist → quality >= 0.5 → prefix-hash dedup → per-lang
    token-budget packing, reported as per-language attrition plus the
    selected set's token total and doc-id sum. The oracle recomputes
    the entire chain from scratch, so a multiplicity or column-drift
    bug at ANY seam fails the hash gate. The stage chain itself is
    ``curate_stages`` — the same function the corpus-build CLI ships
    corpora with."""
    return curation_report(curate_stages(load(spark, sf_dir, "documents")))
