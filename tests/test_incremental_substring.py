"""Incremental shingle store: O(delta) growth, idempotent re-merge,
replay purity, span semantics against the one-shot query, mutation via
remove_docs."""

from __future__ import annotations

import pyspark.sql.functions as F

from fs_indexer_elasticsearch_spark.operators.incremental_substring import (
    ShingleSpanStore,
)

SHARED = "alpha beta gamma delta epsilon zeta eta"  # 7 words


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_match_finds_planted_span_and_merges_o_delta(spark, tmp_path):
    corpus = _docs(
        spark,
        [
            (1, f"c1a c1b {SHARED} c1c c1d c1e"),  # 12 words -> 8 shingles
            (2, "c2a c2b c2c c2d c2e c2f c2g"),  # 7 words -> 3 shingles
        ],
    )
    store = ShingleSpanStore(spark, str(tmp_path / "ss"), k=5, num_buckets=16)
    store.seed(corpus, "doc_id", "text")
    n0 = store.store.read().count()
    assert n0 == 8 + 3

    batch = _docs(
        spark,
        [
            (100, f"b1a b1b {SHARED} b1c"),  # shares the 7-word run
            (101, "b2a b2b b2c b2d b2e b2f"),  # shares nothing
        ],
    )
    got = {
        r.batch_id: r
        for r in store.match_and_merge(
            batch, "doc_id", "text", batch_seq=1
        ).collect()
    }
    assert set(got) == {100}
    assert got[100].n_spans == 1
    assert got[100].max_span_words == 7
    assert got[100].dup_shingles == 3  # 7-word run -> 3 stride-1 5-shingles
    # store grew by exactly the batch's shingle rows: doc 100 has 10
    # words -> 6 shingles, doc 101 has 6 words -> 2 shingles
    assert store.store.read().count() == n0 + 6 + 2


def test_remerge_same_seq_is_idempotent_and_replay_pure(spark, tmp_path):
    corpus = _docs(spark, [(1, f"c1a c1b {SHARED} c1c")])
    store = ShingleSpanStore(spark, str(tmp_path / "ss"), k=5, num_buckets=16)
    store.seed(corpus, "doc_id", "text")

    batch = _docs(spark, [(100, f"x1 x2 {SHARED} x3")])
    first = sorted(
        map(
            tuple,
            store.match_and_merge(batch, "doc_id", "text", batch_seq=1).collect(),
        )
    )
    n1 = store.store.read().count()
    # replay the SAME seq: result identical (merged seq-1 rows are
    # invisible to a seq-1 match), store does not grow (LWW upsert)
    replay = sorted(
        map(
            tuple,
            store.match_and_merge(batch, "doc_id", "text", batch_seq=1).collect(),
        )
    )
    assert replay == first
    assert store.store.read().count() == n1


def test_later_batch_matches_earlier_batch(spark, tmp_path):
    """A seq-2 batch must match spans planted by the seq-1 batch — the
    corpus is everything strictly earlier, not just the seed."""
    store = ShingleSpanStore(spark, str(tmp_path / "ss"), k=5, num_buckets=16)
    store.seed(_docs(spark, [(1, "s1 s2 s3 s4 s5 s6")]), "doc_id", "text")
    store.match_and_merge(
        _docs(spark, [(100, f"y1 {SHARED} y2")]), "doc_id", "text", batch_seq=1
    ).collect()
    got = store.match_and_merge(
        _docs(spark, [(200, f"z1 z2 {SHARED}")]), "doc_id", "text", batch_seq=2
    ).collect()
    assert len(got) == 1 and got[0].batch_id == 200
    assert got[0].max_span_words == 7


def test_remove_docs_then_reingest(spark, tmp_path):
    store = ShingleSpanStore(spark, str(tmp_path / "ss"), k=5, num_buckets=16)
    store.seed(
        _docs(spark, [(1, f"a1 a2 {SHARED}"), (2, "b1 b2 b3 b4 b5 b6")]),
        "doc_id",
        "text",
    )
    store.remove_docs(spark.createDataFrame([(1,)], "doc_id long"))
    assert store.store.read().filter(F.col("sid") == 1).count() == 0
    # the shared run is gone from the index: a new batch no longer matches
    got = store.match_and_merge(
        _docs(spark, [(100, f"q1 {SHARED} q2")]), "doc_id", "text", batch_seq=1
    ).collect()
    assert got == []


def test_empty_store_refuses_match(spark, tmp_path):
    import pytest

    store = ShingleSpanStore(spark, str(tmp_path / "ss2"), k=5)
    with pytest.raises(ValueError, match="seed"):
        store.match_and_merge(
            _docs(spark, [(1, "a b c d e f")]), "doc_id", "text", batch_seq=1
        )


def test_tombstone_removal_is_o_removal_then_compacts(spark, tmp_path):
    """mode='tombstone': the index version does not move, the match
    filters the doc immediately, and compact_tombstones folds the log
    in physically with identical results (r7 verdict #2)."""
    store = ShingleSpanStore(spark, str(tmp_path / "ss"), k=5, num_buckets=16)
    store.seed(
        _docs(spark, [(1, f"a1 a2 {SHARED}"), (2, "b1 b2 b3 b4 b5 b6")]),
        "doc_id",
        "text",
    )
    v_before = store.store.current_version()
    store.remove_docs(
        spark.createDataFrame([(1,)], "doc_id long"), mode="tombstone"
    )
    assert store.store.current_version() == v_before  # index untouched
    got = store.match_and_merge(
        _docs(spark, [(100, f"q1 {SHARED} q2")]),
        "doc_id",
        "text",
        batch_seq=1,
        merge=False,  # keep the index = seed-only for the second probe
    ).collect()
    assert got == []  # logically removed before any compaction

    store.compact_tombstones()
    assert store.store.read().filter(F.col("sid") == 1).count() == 0
    t = store.tombstones.ids()
    assert t is None or t.isEmpty()
    got2 = store.match_and_merge(
        _docs(spark, [(200, f"r1 {SHARED} r2")]),
        "doc_id",
        "text",
        batch_seq=2,
        merge=False,
    ).collect()
    assert got2 == []


def test_row_schema_is_compact(spark, tmp_path):
    """r8 row shrink: no concatenated string key, int64 shingle hash —
    the per-token constants are the storage bill at O(corpus tokens)
    rows (r7 verdict #3)."""
    store = ShingleSpanStore(spark, str(tmp_path / "ss"), k=5, num_buckets=16)
    store.seed(_docs(spark, [(1, f"a1 a2 {SHARED}")]), "doc_id", "text")
    schema = {f.name: f.dataType.simpleString() for f in store.store.read().schema.fields}
    schema.pop("_bucket", None)
    assert schema == {
        "sid": "bigint",
        "pos": "bigint",
        "h": "bigint",
        "batch_seq": "bigint",
    }
