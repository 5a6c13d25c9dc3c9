"""Corpus-curation layer part 4 (plans.llm_pipeline4).

The DuckDB oracle gate is the primary correctness check; this file
covers the properties the hash-compare can't see: keeper-selection
preference order, band-bound sanity, and concentration-ratio bounds.
"""

from __future__ import annotations

from tests.conftest import SF_DIR

from fs_indexer_elasticsearch_spark.plans import ORACLES, QUERIES

NEW = ["dedup_keep_best", "length_percentile_band", "vocab_concentration"]


def test_registered_with_oracles():
    for name in NEW:
        assert name in QUERIES and name in ORACLES


def test_dedup_keep_best_prefers_longest_variant(spark):
    """Every planted cluster pairs an original with its upper-cased,
    whitespace-padded mirror; the mirror is strictly longer, so
    keep-best must pick it — proving the window ORDER does the
    choosing, not just dup counting."""
    rows = QUERIES["dedup_keep_best"](spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert r.n_members == 2
        assert r.keeper_source == "mirror"
        assert r.keeper_id >= 1_000_000_000_000


def test_length_percentile_band_bounds(spark):
    rows = QUERIES["length_percentile_band"](spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert r.lo <= r.hi
        assert 0 < r.n_kept <= r.n_total
        # p05..p95 band keeps ~90%; generous sanity margins
        assert 0.5 <= r.pct_kept <= 1.0 + 1e-9


def test_template_prefix_one_row_per_source(spark):
    rows = QUERIES["template_prefix_by_source"](spark, SF_DIR).collect()
    assert rows
    assert len({r.source for r in rows}) == len(rows)  # one winner each
    for r in rows:
        assert 1 <= r.prefix_count <= r.n_docs
        assert 0 < r.share <= 1.0 + 1e-9
        assert len(r.top_prefix.split(" ")) == 3


def test_chunk_documents_full_coverage_no_redundant_tail(spark):
    """Chunks reconstruct the doc: strides cover every token exactly
    (chunk i starts at i*48), only the LAST chunk may be short, and no
    chunk is fully contained in the previous one."""
    rows = QUERIES["chunk_documents"](spark, SF_DIR).collect()
    assert rows
    by_doc: dict[int, list] = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    for doc_id, chunks in by_doc.items():
        chunks.sort(key=lambda r: r.chunk_idx)
        assert [c.chunk_idx for c in chunks] == list(range(len(chunks)))
        for c in chunks[:-1]:
            assert c.n_chunk_tokens == 64  # only the tail may be short
        # stitched tokens = stride-prefix of each chunk + full tail
        stitched: list[str] = []
        for c in chunks[:-1]:
            stitched += c.chunk_text.split(" ")[:48]
        stitched += chunks[-1].chunk_text.split(" ")
        n = 48 * (len(chunks) - 1) + chunks[-1].n_chunk_tokens
        assert len(stitched) == n
        # overlap consistency: chunk i's tokens 48..63 == chunk i+1's 0..15
        for a, b in zip(chunks, chunks[1:]):
            assert a.chunk_text.split(" ")[48:] == b.chunk_text.split(" ")[
                : a.n_chunk_tokens - 48
            ]


def test_char_bigram_nll_positive_and_total(spark):
    """NLL is strictly positive (every bigram probability < 1 in a
    nontrivial corpus), finite, and every length>=2 doc is scored."""
    import math

    import pyspark.sql.functions as F

    from fs_indexer_elasticsearch_spark.tables import load

    rows = QUERIES["char_bigram_nll"](spark, SF_DIR).collect()
    n_docs = (
        load(spark, SF_DIR, "documents").filter(F.length("text") >= 2).count()
    )
    assert len(rows) == n_docs
    for r in rows:
        assert r.nll > 0 and math.isfinite(r.nll)
        assert r.n_bigrams >= 1


def test_bigram_model_cap_wide_charset(spark):
    """A corpus whose observed bigram types exceed the cap (the
    CJK-heavy scenario) must yield a model of exactly `cap` rows,
    keeping the highest-count bigrams with a deterministic tie-break —
    the guard that keeps the scoring broadcast bounded."""
    import pyspark.sql.functions as F

    from fs_indexer_elasticsearch_spark.plans.llm_pipeline4 import (
        bigram_model_capped,
    )

    # 200 distinct "bigrams": b000..b199, bigram b_i appearing i+1 times.
    cc = (
        spark.range(200)
        .select(
            F.format_string("b%03d", F.col("id")).alias("b"),
            (F.col("id") + 1).alias("c"),
        )
    )
    capped = bigram_model_capped(cc, cap=50).collect()
    assert len(capped) == 50
    kept = {r.b for r in capped}
    # Top-50 by count = the 50 largest ids.
    assert kept == {f"b{i:03d}" for i in range(150, 200)}
    # Tie-break determinism: equal counts resolve by bigram ascending.
    ties = spark.createDataFrame(
        [("zz", 5), ("aa", 5), ("mm", 5)], "b string, c long"
    )
    assert [r.b for r in bigram_model_capped(ties, cap=2).collect()] == [
        "aa",
        "mm",
    ]


def test_token_budget_mixture_respects_budget(spark):
    """Per-language running totals never exceed the budget, and the
    kept set is a quality-ranked PREFIX (every kept doc's quality ≥
    any dropped doc of the same language, modulo the doc_id
    tie-break)."""
    rows = QUERIES["token_budget_mixture"](spark, SF_DIR).collect()
    assert rows
    by_lang: dict[str, list] = {}
    for r in rows:
        assert r.cum_tokens <= 2000
        by_lang.setdefault(r.lang, []).append(r)
    for lang, kept in by_lang.items():
        # cum_tokens is consistent with the per-doc n_tokens sum
        total = sum(r.n_tokens for r in kept)
        assert max(r.cum_tokens for r in kept) == total


def test_embedding_outliers_are_extreme_minority(spark):
    """Every flagged vector is ≥1.5 cluster-stddevs out; by Chebyshev
    no more than 1/1.5² ≈ 44% of any population can be — sanity-check
    the flag rate is a strict minority of the corpus."""
    import pyspark.sql.functions as F

    from fs_indexer_elasticsearch_spark.tables import load

    rows = QUERIES["embedding_outliers"](spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert r.z >= 1.5
        assert r.sq_dist > 0
    n_corpus = load(spark, SF_DIR, "embeddings").count()
    assert len(rows) < 0.44 * n_corpus


def test_vocab_concentration_bounds(spark):
    rows = QUERIES["vocab_concentration"](spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert 0 < r.top100_tokens <= r.total_tokens
        assert 0 < r.concentration <= 1.0 + 1e-9
        assert r.distinct_tokens > 0


def test_collocations_pmi_ranked_and_bounded(spark):
    """Top-50 list is PMI-descending, every pair meets the min count,
    and each pair string is exactly two tokens."""
    rows = QUERIES["collocations_pmi"](spark, SF_DIR).collect()
    assert 0 < len(rows) <= 50
    pmis = [r.pmi for r in rows]
    assert pmis == sorted(pmis, reverse=True)
    for r in rows:
        assert r.n_pair >= 5
        assert len(r.pair.split(" ")) == 2


def test_ann_recall_floors(spark):
    """The ANN quality gate: IVF must recover >= 0.8 of brute-force
    exact top-3 ground truth, and multi-table LSH must recover >= 0.8
    of planted near-duplicate nearest neighbors (its design regime).
    Single-table LSH's exact-top-3 recall is reported but not floored:
    near-zero is the known sign-LSH behavior on weakly similar
    vectors, which is exactly why the metric exists."""
    by_method = {
        r.method: r for r in QUERIES["ann_recall_at_k"](spark, SF_DIR).collect()
    }
    assert set(by_method) == {"lsh", "ivf"}
    assert by_method["ivf"].recall_at_k >= 0.8, by_method["ivf"]
    assert by_method["ivf"].n_truth == by_method["ivf"].n_queries * 3

    (nd,) = QUERIES["ann_neardup_recall_lsh"](spark, SF_DIR).collect()
    assert nd.method == "lsh_neardup"
    assert nd.n_queries == 8
    assert nd.recall_at_k >= 0.8, nd

    # Multi-probe (4x10 + 1-bit probes) must hold the same floor with
    # HALF the index rows of the 8x8 construction (measured: 1.0 at
    # sf0.001/0.01/0.1).
    (mp,) = QUERIES["ann_neardup_recall_multiprobe"](spark, SF_DIR).collect()
    assert mp.method == "lsh_multiprobe"
    assert mp.recall_at_k >= 0.8, mp
