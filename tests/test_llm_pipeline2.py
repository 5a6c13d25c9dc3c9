"""Dataset-hygiene / relevance layer (plans.llm_pipeline2).

The DuckDB oracle gate is the primary correctness check for these
queries; this file covers the properties the hash-compare can't see:
split determinism under repartitioning, detector hit guarantees on the
planted PII, score-sign invariants, and ratio bounds.
"""

from __future__ import annotations

import pyspark.sql.functions as F

from tests.conftest import SF_DIR

from fs_indexer_elasticsearch_spark.plans import ORACLES, QUERIES

NEW_QUERIES = [
    "bm25_search_topk",
    "tfidf_top_terms",
    "dataset_split_summary",
    "stratified_sample_per_lang",
    "split_contamination_ngrams",
    "pii_detection",
    "boilerplate_repetition",
]


def test_registered_with_oracles():
    for name in NEW_QUERIES:
        assert name in QUERIES
        assert name in ORACLES


def test_split_deterministic_under_repartition(spark):
    from fs_indexer_elasticsearch_spark.plans.llm_pipeline2 import _split_col
    from fs_indexer_elasticsearch_spark.tables import load

    d = load(spark, SF_DIR, "documents")
    a = {r.doc_id: r.split for r in d.select("doc_id", _split_col().alias("split")).collect()}
    b = {
        r.doc_id: r.split
        for r in d.repartition(7).select("doc_id", _split_col().alias("split")).collect()
    }
    assert a == b
    n = len(a)
    train = sum(1 for s in a.values() if s == "train")
    # md5 buckets: 80% expected, generous tolerance at 500 docs.
    assert 0.7 * n < train < 0.9 * n
    assert {"train", "val", "test"} == set(a.values())


def test_stratified_sample_sizes(spark):
    rows = QUERIES["stratified_sample_per_lang"](spark, SF_DIR).collect()
    per_lang: dict[str, int] = {}
    for r in rows:
        per_lang[r.lang] = per_lang.get(r.lang, 0) + 1
        assert 1 <= r.rk <= 20
    assert all(v == 20 for v in per_lang.values())


def test_pii_detection_hits_planted(spark):
    rows = {r.doc_id: r for r in QUERIES["pii_detection"](spark, SF_DIR).collect()}
    docs = [r.doc_id for r in rows.values()]
    assert docs, "planted PII must be detected"
    for doc_id, r in rows.items():
        if doc_id % 13 == 0:
            assert r.n_emails >= 1
        if doc_id % 17 == 0:
            assert r.n_phones >= 1
        if doc_id % 19 == 0:
            assert r.n_ips >= 1
    # Every planted doc must be flagged (13, 17, 19 divisors).
    from fs_indexer_elasticsearch_spark.tables import load

    all_ids = [
        r.doc_id
        for r in load(spark, SF_DIR, "documents").select("doc_id").collect()
    ]
    planted = {i for i in all_ids if i % 13 == 0 or i % 17 == 0 or i % 19 == 0}
    assert planted == set(rows)


def test_bm25_scores_positive_and_sorted(spark):
    rows = QUERIES["bm25_search_topk"](spark, SF_DIR).collect()
    assert 0 < len(rows) <= 20
    scores = [r.bm25 for r in rows]
    assert all(s > 0 for s in scores)
    assert scores == sorted(scores, reverse=True)


def test_contamination_bounds(spark):
    rows = QUERIES["split_contamination_ngrams"](spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert r.split in ("val", "test")
        assert 0 <= r.n_overlap <= r.n_shingles
        assert 0.0 <= r.contamination <= 1.0 + 1e-6
        assert r.flagged in (0, 1)


def test_boilerplate_ratios_bounded(spark):
    rows = QUERIES["boilerplate_repetition"](spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert 0 < r.top_token_ratio <= 1.0 + 1e-6
        assert -1e-6 <= r.dup_trigram_ratio < 1.0


def test_spread_small_noop_on_wide_input(spark):
    from fs_indexer_elasticsearch_spark.tables import spread_small

    wide = spark.range(0, 1000, 1, 64)
    assert spread_small(wide.toDF("id")).rdd.getNumPartitions() == 64
    narrow = spark.range(0, 1000, 1, 1).toDF("id")
    spread = spread_small(narrow)
    assert spread.rdd.getNumPartitions() == spark.sparkContext.defaultParallelism
    assert spread.count() == 1000

    # File-backed path (the cheap bytes-based estimate, no RDD probe):
    # a single small parquet file must spread to full parallelism and
    # lose no rows.
    small = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    n = small.count()
    spread_f = spread_small(small)
    assert spread_f.rdd.getNumPartitions() == spark.sparkContext.defaultParallelism
    assert spread_f.count() == n


def test_spread_small_noop_on_large_splittable_file(spark):
    """One LARGE parquet file scans as many splits (parquet is
    splittable) — the estimate must count splits per file, not files,
    or spread_small would round-robin shuffle a big table. Simulated
    by shrinking maxPartitionBytes so the test file counts as >64
    splits."""
    from fs_indexer_elasticsearch_spark.tables import spread_small

    key = "spark.sql.files.maxPartitionBytes"
    old = spark.conf.get(key)
    try:
        spark.conf.set(key, "1k")
        df = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        assert spread_small(df) is df  # no-op: no repartition inserted
    finally:
        spark.conf.set(key, old)
