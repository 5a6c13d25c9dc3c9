"""Training-export layer (plans.llm_pipeline6).

The DuckDB oracle gate is the primary correctness check; this file
covers the invariants the hash-compare can't see: packing accounting
identities (bins × budget ≥ tokens, straddlers bounded by bins),
shard-assignment determinism and completeness, decile bounds, and the
monotonicity of truncation loss in the context size.
"""

from __future__ import annotations

import pyspark.sql.functions as F

from tests.conftest import SF_DIR

from fs_indexer_elasticsearch_spark.plans import ORACLES, QUERIES
from fs_indexer_elasticsearch_spark.plans.llm_pipeline6 import (
    AUDIT_SHARDS,
    PACK_BUDGET,
    _shard_col,
)
from fs_indexer_elasticsearch_spark.tables import load

NEW = [
    "sequence_packing_stats",
    "shard_balance_audit",
    "curriculum_quality_deciles",
    "context_truncation_loss",
]


def test_registered_with_oracles():
    for name in NEW:
        assert name in QUERIES and name in ORACLES


def test_packing_accounting(spark):
    rows = QUERIES["sequence_packing_stats"](spark, SF_DIR).collect()
    assert rows
    for r in rows:
        # Bins must hold all tokens; fill can't exceed 1.
        assert r.n_bins * PACK_BUDGET >= r.total_tokens
        assert 0.0 < r.fill_rate <= 1.0 + 1e-9
        # A doc straddles at most once per bin boundary it crosses;
        # there are n_bins - shards boundaries at most per shard, so
        # straddlers are strictly fewer than bins.
        assert 0 <= r.n_straddlers < r.n_bins
        assert r.n_docs > 0


def test_shard_assignment_total_and_deterministic(spark):
    docs = load(spark, SF_DIR, "documents")
    shards = docs.select(_shard_col(AUDIT_SHARDS).alias("s"))
    mn, mx = shards.agg(F.min("s"), F.max("s")).first()
    assert 0 <= mn and mx < AUDIT_SHARDS
    # Same expression twice -> identical assignment (determinism).
    again = docs.select(
        _shard_col(AUDIT_SHARDS).alias("a"), _shard_col(AUDIT_SHARDS).alias("b")
    )
    assert again.where(F.col("a") != F.col("b")).count() == 0


def test_shard_balance_covers_all_docs(spark):
    rows = QUERIES["shard_balance_audit"](spark, SF_DIR).collect()
    n_total = load(spark, SF_DIR, "documents").count()
    assert sum(r.n_docs for r in rows) == n_total
    # Deviations average ~0 by construction.
    mean_dev = sum(r.doc_dev for r in rows) / len(rows)
    assert abs(mean_dev) < 0.01


def test_curriculum_deciles_bounded(spark):
    rows = QUERIES["curriculum_quality_deciles"](spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert 0 <= r.decile <= 9
        assert r.n_docs > 0 and r.total_tokens > 0


def test_truncation_loss_monotone(spark):
    rows = sorted(
        QUERIES["context_truncation_loss"](spark, SF_DIR).collect(),
        key=lambda r: r.ctx,
    )
    assert [r.ctx for r in rows] == [256, 512, 1024, 2048]
    # Larger windows keep more and lose less, monotonically.
    for a, b in zip(rows, rows[1:]):
        assert a.kept_tokens <= b.kept_tokens
        assert a.lost_frac >= b.lost_frac - 1e-9
        assert a.n_truncated >= b.n_truncated
    for r in rows:
        assert 0.0 <= r.lost_frac < 1.0
        assert r.kept_tokens <= r.total_tokens


def test_wordpiece_greedy_longest_match():
    from fs_indexer_elasticsearch_spark.functions.tokenize import (
        TOKENIZER_VOCAB,
        wordpiece_count,
    )

    assert "table" in TOKENIZER_VOCAB and "ta" in TOKENIZER_VOCAB
    # greedy takes the 5-char piece, not ta|ble
    assert wordpiece_count("table") == 1
    assert wordpiece_count("tablescan") == 2  # table|scan
    assert wordpiece_count("xyzq") == 4  # all char fallback ('qu' needs the u)
    assert wordpiece_count("") == 0


def test_count_tokens_exact_docs_matches_python(spark):
    from fs_indexer_elasticsearch_spark.functions.tokenize import (
        count_tokens_exact_docs,
        wordpiece_count,
    )

    df = spark.createDataFrame(
        [(1, "Table-Scan, the query!"), (2, ""), (3, "big big big")],
        "doc_id long, text string",
    )
    got = {r.doc_id: r.n_tokens for r in count_tokens_exact_docs(
        df, "doc_id", "text").collect()}
    # tokens(): lower + [^a-z0-9]+ split → per-word wordpiece sums
    assert got[1] == sum(wordpiece_count(w) for w in ["table", "scan", "the", "query"])
    assert got[3] == 3 * wordpiece_count("big")
    # Zero-token docs keep their row at 0 — SAME multiplicity as the
    # real-tokenizer path, so swapping tokenizers is behavior-preserving.
    assert got[2] == 0


def test_real_tokenizer_gate_absent():
    from fs_indexer_elasticsearch_spark.functions.tokenize import (
        load_real_tokenizer,
    )

    # Neither lib ships in this image: the gate must return None (not
    # raise), so callers fall back to the reference wordpiece.
    assert load_real_tokenizer("tiktoken:cl100k_base") is None
    assert load_real_tokenizer("hf:gpt2") is None
    import pytest

    with pytest.raises(ValueError, match="unknown tokenizer"):
        load_real_tokenizer("sentencepiece:x")
