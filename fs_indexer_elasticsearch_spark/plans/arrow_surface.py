"""Arrow grouped-map surface under the oracle gate.

The engine keeps Python OUT of hot plans (every curation query is pure
Column expressions; plan_audit fails on row-at-a-time BatchEvalPython).
When per-group imperative logic is genuinely needed — the multimodal
decode kernels, custom per-group model fits — the sanctioned path is
Arrow-batched ``applyInPandas`` (SURVEY §2.11). Until now that path
was exercised only by pytest; this module registers a query that runs
REAL grouped-map Python under the DuckDB hash-compare, so the Arrow
plumbing (schema contract, group semantics, determinism) has a driver
row like every other operator family.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..tables import load
from .registry import query


@query(
    "robust_zscore_by_lang",
    oracle="""
    WITH med AS (
        SELECT lang, median(n_chars) AS med FROM documents GROUP BY lang
    ), mad AS (
        SELECT d.lang, median(abs(d.n_chars - med.med)) AS mad
        FROM documents d JOIN med USING (lang)
        GROUP BY d.lang
    )
    SELECT d.doc_id, d.lang, d.n_chars,
           round((d.n_chars - med.med)
                 / (CASE WHEN mad.mad > 0 THEN 1.4826 * mad.mad ELSE 1.0 END)
                 + 1e-7, 4) AS rz
    FROM documents d JOIN med USING (lang) JOIN mad USING (lang)
    """,
)
def robust_zscore_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language robust z-score of document length (median/MAD with
    the 1.4826 normal-consistency constant) computed in a pandas
    grouped-map — the outlier scoring a curation pipeline wants when
    means/stddevs are poisoned by the very outliers being hunted.

    The POINT of this query is the execution path: one Arrow-batched
    ``applyInPandas`` per language group (FlatMapGroupsInPandas in the
    plan — vectorized, never row-at-a-time), hash-matched against a
    pure-SQL median/MAD oracle. Determinism: pandas and DuckDB both
    interpolate even-n medians as (a+b)/2 over identical doubles, and
    the rounding nudge is applied identically on both sides. Scale
    note: a group here is one language (bounded thousands of rows per
    task at gate SFs); at 100 TB the grouping key extends to
    (lang, shard) with per-shard medians merged — or the pure-expr
    percentile path replaces this one; the query exists to pin the
    Arrow contract, not to claim per-group pandas scales unbounded."""
    import pandas as pd

    d = load(spark, sf_dir, "documents").select("doc_id", "lang", "n_chars")

    def score(pdf: "pd.DataFrame") -> "pd.DataFrame":
        med = pdf["n_chars"].median()
        mad = (pdf["n_chars"] - med).abs().median()
        denom = 1.4826 * mad if mad > 0 else 1.0
        pdf = pdf.copy()
        # Mirror stable_round / the oracle's round(x + 1e-7, 4).
        pdf["rz"] = ((pdf["n_chars"] - med) / denom + 1e-7).round(4)
        return pdf

    return d.groupBy("lang").applyInPandas(
        score, "doc_id long, lang string, n_chars long, rz double"
    )
