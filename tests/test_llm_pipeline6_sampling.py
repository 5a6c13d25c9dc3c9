"""Weighted sampling + mixture temperature (plans.llm_pipeline6).

The oracle gate proves cross-engine determinism; these tests check the
statistical semantics: exhaustive sampling below K, weight-class
overrepresentation above K, uniform-u exactness, and the temperature
identities (shares sum to 1, small sources upsampled).
"""

from __future__ import annotations

import pyspark.sql.functions as F

from tests.conftest import SF_DIR

from fs_indexer_elasticsearch_spark.functions.text import token_count
from fs_indexer_elasticsearch_spark.plans import ORACLES, QUERIES
from fs_indexer_elasticsearch_spark.plans.llm_pipeline6 import SAMPLE_K, _u_col
from fs_indexer_elasticsearch_spark.tables import load

SF_BIG = "/root/testdata/sf0.01"

NEW = ["weighted_sample_stats", "mixture_temperature_weights"]


def test_registered_with_oracles():
    for name in NEW:
        assert name in QUERIES and name in ORACLES


def test_u_is_exact_dyadic_uniform(spark):
    docs = load(spark, SF_DIR, "documents")
    us = docs.select(_u_col().alias("u"))
    mn, mx, avg = us.agg(F.min("u"), F.max("u"), F.avg("u")).first()
    assert 0.0 < mn and mx <= 1.0
    assert 0.4 < avg < 0.6
    # Dyadic rational: u * 16^6 must be an exact integer.
    frac = us.select((F.col("u") * (16**6) % 1).alias("f"))
    assert frac.where(F.col("f") != 0).count() == 0


def test_sample_exhaustive_below_k(spark):
    """A language with fewer than SAMPLE_K docs is sampled entirely —
    weighting must never drop data when there's room for all of it."""
    rows = QUERIES["weighted_sample_stats"](spark, SF_DIR).collect()
    sampled = {}
    for r in rows:
        sampled[r.lang] = sampled.get(r.lang, 0) + r.n_sampled
    docs = load(spark, SF_DIR, "documents")
    corpus = {
        r.lang: r.n
        for r in docs.where(token_count("text") > 0)
        .groupBy("lang")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    for lang, n in corpus.items():
        assert sampled[lang] == min(n, SAMPLE_K)


def test_high_weight_overrepresented_above_k(spark):
    """Where the corpus exceeds SAMPLE_K, weight-4 docs must occupy a
    larger share of the sample than of the corpus (the whole point of
    w = u^(1/weight) priorities)."""
    rows = QUERIES["weighted_sample_stats"](spark, SF_BIG).collect()
    by_lang: dict[str, dict[int, int]] = {}
    for r in rows:
        by_lang.setdefault(r.lang, {})[r.weight] = r.n_sampled
    docs = load(spark, SF_BIG, "documents")
    d = docs.select(
        "lang",
        token_count("text").alias("tok"),
        (
            F.size(F.array_distinct(F.filter(
                F.split(F.lower("text"), "[^a-z0-9]+"), lambda x: x != ""
            ))) / token_count("text")
        ).alias("score"),
    ).where(F.col("tok") > 0)
    w4 = (
        d.groupBy("lang")
        .agg(
            F.count("*").alias("n"),
            F.sum((F.col("score") >= 0.8).cast("int")).alias("n4"),
        )
        .collect()
    )
    checked = 0
    for r in w4:
        n_sampled = sum(by_lang[r.lang].values())
        if r.n <= SAMPLE_K or r.n4 == 0:
            continue
        corpus_share = r.n4 / r.n
        sample_share = by_lang[r.lang].get(4, 0) / n_sampled
        assert sample_share > corpus_share
        checked += 1
    assert checked > 0  # the property was actually exercised


def test_temperature_shares_and_upsampling(spark):
    rows = QUERIES["mixture_temperature_weights"](spark, SF_DIR).collect()
    assert abs(sum(r.p_natural for r in rows) - 1.0) < 1e-3
    assert abs(sum(r.p_temperature for r in rows) - 1.0) < 1e-3
    smallest = min(rows, key=lambda r: r.n_tokens)
    largest = max(rows, key=lambda r: r.n_tokens)
    # Temperature flattens: small sources gain share, large ones lose.
    assert smallest.p_temperature > smallest.p_natural
    assert largest.p_temperature < largest.p_natural
    for r in rows:
        assert r.epochs_at_budget > 0
