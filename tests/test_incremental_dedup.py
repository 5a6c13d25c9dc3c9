"""Incremental batch-vs-corpus dedup: band-store growth is O(delta),
matches equal the from-scratch recompute, merges are idempotent, and
the lookup prunes to the batch's buckets."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from fs_indexer_elasticsearch_spark.operators.dedup import minhash_band_rows
from fs_indexer_elasticsearch_spark.operators.incremental_dedup import (
    MinHashBandStore,
)

BANDS = 4


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _corpus(spark, n=24):
    words = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta", "theta"]
    rows = [
        (i, " ".join(words[(i + j) % len(words)] for j in range(12)))
        for i in range(n)
    ]
    return _docs(spark, rows)


def test_store_grows_by_o_delta_and_merge_is_idempotent(spark, tmp_path):
    store = MinHashBandStore(spark, str(tmp_path / "bands"), num_buckets=16)
    corpus = _corpus(spark)
    store.seed(corpus, "doc_id", "text")
    n0 = store.store.read().count()
    assert n0 == 24 * BANDS  # one row per doc x band

    batch1 = _docs(spark, [(100, "alpha beta gamma delta epsilon zeta eta theta "
                                 "alpha beta gamma delta")])
    store.match_and_merge(batch1, "doc_id", "text", batch_seq=1).collect()
    n1 = store.store.read().count()
    assert n1 == n0 + 1 * BANDS  # grew by exactly the batch's bands

    batch2 = _docs(spark, [(200, "one two three four five six seven eight nine"),
                           (201, "ten eleven twelve thirteen fourteen fifteen "
                                 "sixteen seventeen")])
    store.match_and_merge(batch2, "doc_id", "text", batch_seq=2).collect()
    n2 = store.store.read().count()
    assert n2 == n1 + 2 * BANDS

    # Re-merging the same batch (retry semantics) upserts by the unique
    # doc:band row key — LWW replacement, zero growth.
    store.match_and_merge(batch2, "doc_id", "text", batch_seq=3).collect()
    assert store.store.read().count() == n2


def test_matches_equal_full_recompute(spark, tmp_path):
    """The incremental answer must be indistinguishable from banding
    corpus+batch together from scratch (restricted to batch-vs-corpus
    pairs) — the engine-level twin of the registered query's oracle."""
    corpus = _corpus(spark)
    # 100: exact copy of doc 0 (est 1.0); 101: unrelated.
    c0 = corpus.filter(F.col("doc_id") == 0).first().text
    batch = _docs(spark, [(100, c0), (101, "unrelated words only here now")])

    store = MinHashBandStore(spark, str(tmp_path / "bands"), num_buckets=16)
    store.seed(corpus, "doc_id", "text")
    got = {
        (r.batch_id, r.corpus_id): r.est_jaccard
        for r in store.match_and_merge(
            batch, "doc_id", "text", batch_seq=1
        ).collect()
    }

    both = corpus.unionByName(batch)
    rows = minhash_band_rows(both, "doc_id", "text")
    sig = {r.sid: r.sig for r in rows.select("sid", "sig").distinct().collect()}
    bands = [(r.sid, r.b, r.h) for r in rows.collect()]
    cands = {
        (qs, cs)
        for (qs, qb, qh) in bands
        for (cs, cb, ch) in bands
        if qs >= 100 and cs < 100 and qb == cb and qh == ch
    }
    want = {}
    for qs, cs in cands:
        est = round(
            sum(1 for a, b in zip(sig[qs], sig[cs]) if a == b) / 16 + 1e-7, 3
        )
        if est >= 0.5:
            want[(qs, cs)] = est
    assert got == want
    assert got[(100, 0)] == 1.0  # the planted exact copy is found


def test_lookup_touches_only_batch_buckets(spark, tmp_path):
    """A 1-doc batch emits BANDS band rows, so the pruned lookup reads
    at most BANDS of the store's buckets — the property that makes the
    cycle O(delta) instead of O(corpus)."""
    num_buckets = 64
    store = MinHashBandStore(
        spark, str(tmp_path / "bands"), num_buckets=num_buckets
    )
    store.seed(_corpus(spark), "doc_id", "text")
    batch = _docs(spark, [(100, "alpha beta gamma delta epsilon zeta")])
    bands = store.delta_bands(batch, "doc_id", "text", 1)
    touched = (
        bands.withColumn("_bucket", store.store._bucket_col())
        .select("_bucket")
        .distinct()
        .count()
    )
    assert touched <= BANDS < num_buckets
    pruned = store.store.read_buckets(list(range(BANDS)))
    # read_buckets really filters: it returns a strict subset of rows.
    assert pruned.count() < store.store.read().count()


def test_match_before_seed_raises(spark, tmp_path):
    store = MinHashBandStore(spark, str(tmp_path / "bands"))
    import pytest

    with pytest.raises(ValueError, match="seed"):
        store.match_and_merge(
            _docs(spark, [(1, "a b c")]), "doc_id", "text", batch_seq=1
        )


def test_remove_docs_then_reingest_changed_text(spark, tmp_path):
    """Mutation path: remove a doc's band rows (full-pass overwrite —
    the documented slow path), merge its changed text as a normal
    batch, and the index answers with the NEW content only."""
    store = MinHashBandStore(spark, str(tmp_path / "bands"), num_buckets=16)
    corpus = _corpus(spark)
    store.seed(corpus, "doc_id", "text")
    n0 = store.store.read().count()

    store.remove_docs(spark.createDataFrame([(3,)], "doc_id long"))
    assert store.store.read().count() == n0 - BANDS
    assert store.store.read().filter(F.col("sid") == 3).count() == 0

    new_text = "completely different replacement words here now ok yes"
    store.match_and_merge(
        _docs(spark, [(3, new_text)]), "doc_id", "text", batch_seq=1
    ).collect()
    assert store.store.read().count() == n0
    # A probe identical to the NEW text matches doc 3 at 1.0; a probe
    # of the OLD text no longer matches doc 3 at all.
    old_text = corpus.filter(F.col("doc_id") == 3).first().text
    m_new = store.match_and_merge(
        _docs(spark, [(900, new_text)]), "doc_id", "text",
        batch_seq=2, merge=False,
    ).collect()
    assert any(r.corpus_id == 3 and r.est_jaccard == 1.0 for r in m_new)
    m_old = store.match_and_merge(
        _docs(spark, [(901, old_text)]), "doc_id", "text",
        batch_seq=3, merge=False,
    ).collect()
    assert not any(r.corpus_id == 3 for r in m_old)


def test_replay_after_partial_failure_emits_original_answer(spark, tmp_path):
    """Crash-replay semantics: if an epoch's index merge committed but
    its matches sink didn't, re-running the SAME batch_seq must emit
    exactly the first attempt's pairs — matching is restricted to
    strictly earlier batches, so the failed attempt's own rows (two
    intra-batch dups of the same corpus doc) are invisible to the
    replay (r7 review finding)."""
    corpus = _corpus(spark)
    c3 = corpus.filter(F.col("doc_id") == 3).first().text
    batch = _docs(spark, [(100, c3), (101, c3)])  # intra-batch dup pair

    store = MinHashBandStore(spark, str(tmp_path / "bands"), num_buckets=16)
    store.seed(corpus, "doc_id", "text")
    first = {
        (r.batch_id, r.corpus_id)
        for r in store.match_and_merge(
            batch, "doc_id", "text", batch_seq=1
        ).collect()
    }
    # merge committed; simulate the sink crash by replaying seq 1
    replay = {
        (r.batch_id, r.corpus_id)
        for r in store.match_and_merge(
            batch, "doc_id", "text", batch_seq=1
        ).collect()
    }
    assert replay == first
    assert (100, 101) not in replay and (101, 100) not in replay
    assert (100, 3) in replay and (101, 3) in replay
    # A LATER batch does see epoch 1's documents.
    later = {
        (r.batch_id, r.corpus_id)
        for r in store.match_and_merge(
            _docs(spark, [(200, c3)]), "doc_id", "text", batch_seq=2
        ).collect()
    }
    assert {(200, 3), (200, 100), (200, 101)} <= later


def test_tombstone_removal_filters_then_compacts(spark, tmp_path):
    """Band-store tombstone path: index version unmoved by the
    removal, matches exclude the doc immediately, compaction folds the
    log in with identical results (r7 verdict #2)."""
    from fs_indexer_elasticsearch_spark.operators.incremental_dedup import (
        MinHashBandStore,
    )

    text = "the quick brown fox jumps over the lazy dog again and again"
    corpus = spark.createDataFrame(
        [(1, text), (2, text), (3, "something else entirely unrelated words")],
        "doc_id long, text string",
    )
    store = MinHashBandStore(spark, str(tmp_path / "bs"), num_buckets=16)
    store.seed(corpus, "doc_id", "text")
    v_before = store.store.current_version()

    store.remove_docs(
        spark.createDataFrame([(1,)], "doc_id long"), mode="tombstone"
    )
    assert store.store.current_version() == v_before  # O(removal) only

    batch = spark.createDataFrame([(100, text)], "doc_id long, text string")
    got = store.match_and_merge(
        batch, "doc_id", "text", batch_seq=1, merge=False
    ).collect()
    assert {r.corpus_id for r in got} == {2}  # 1 tombstoned, 3 dissimilar

    store.compact_tombstones()
    assert store.store.read().filter("sid = 1").count() == 0
    got2 = store.match_and_merge(
        batch, "doc_id", "text", batch_seq=1, merge=False
    ).collect()
    assert sorted(map(tuple, got2)) == sorted(map(tuple, got))


def test_tombstone_readd_stays_hidden_until_unmark(spark, tmp_path):
    """The tombstone log is a pure-deletion path: a doc RE-MERGED
    after a tombstone removal stays hidden (the filter is by id — the
    log's and the index's seq domains are unrelated), until the caller
    explicitly unmarks or compacts. unmark() is bucket-pruned and
    restores visibility."""
    from fs_indexer_elasticsearch_spark.operators.incremental_dedup import (
        MinHashBandStore,
    )

    text = "the quick brown fox jumps over the lazy dog again and again"
    corpus = spark.createDataFrame(
        [(1, text), (2, "different words entirely here now")],
        "doc_id long, text string",
    )
    store = MinHashBandStore(spark, str(tmp_path / "bs"), num_buckets=16)
    store.seed(corpus, "doc_id", "text")
    rm = spark.createDataFrame([(1,)], "doc_id long")
    store.remove_docs(rm, mode="tombstone")

    # re-merge doc 1's text under its own id at a later seq: still hidden
    store.match_and_merge(
        spark.createDataFrame([(1, text)], "doc_id long, text string"),
        "doc_id",
        "text",
        batch_seq=1,
    ).collect()
    probe = spark.createDataFrame([(100, text)], "doc_id long, text string")
    got = store.match_and_merge(
        probe, "doc_id", "text", batch_seq=2, merge=False
    ).collect()
    assert all(r.corpus_id != 1 for r in got)

    store.tombstones.unmark(rm)
    t = store.tombstones.ids()
    assert t is None or t.isEmpty()
    got2 = store.match_and_merge(
        probe, "doc_id", "text", batch_seq=2, merge=False
    ).collect()
    assert {r.corpus_id for r in got2} == {1}


def test_stale_tombstones_cannot_filter_a_fresh_corpus(spark, tmp_path, monkeypatch):
    """Crash window between re-seed and tombstone GC: the seed commit
    bumps the tombstone GENERATION atomically with the data, so a log
    the crash left behind is stale by generation and can never filter
    the fresh corpus — the old clear-after-seed ordering silently hid
    re-seeded docs forever."""
    store = MinHashBandStore(spark, str(tmp_path / "bands"), num_buckets=16)
    corpus = _corpus(spark)
    store.seed(corpus, "doc_id", "text")
    store.remove_docs(
        spark.createDataFrame([(3,)], "doc_id long"), mode="tombstone"
    )
    probe = corpus.filter(F.col("doc_id") == 3).select(
        F.col("doc_id") + 900, "text"
    ).toDF("doc_id", "text")
    m = store.match_and_merge(probe, "doc_id", "text", batch_seq=1, merge=False)
    assert not any(r.corpus_id == 3 for r in m.collect())  # tombstoned

    # Re-seed a fresh corpus CONTAINING doc 3, with the GC step dead
    # (the simulated crash): the stale tombstone must not apply.
    monkeypatch.setattr(store.tombstones, "clear", lambda: None)
    store.seed(corpus, "doc_id", "text")
    assert store.tombstones.store.read().count() > 0  # stale rows linger...
    assert store.tombstones.ids().isEmpty()  # ...but serve nothing
    m2 = store.match_and_merge(probe, "doc_id", "text", batch_seq=1, merge=False)
    assert any(r.corpus_id == 3 and r.est_jaccard == 1.0 for r in m2.collect())

    # New-generation tombstones still work after the re-seed.
    store.remove_docs(
        spark.createDataFrame([(3,)], "doc_id long"), mode="tombstone"
    )
    m3 = store.match_and_merge(probe, "doc_id", "text", batch_seq=2, merge=False)
    assert not any(r.corpus_id == 3 for r in m3.collect())


@pytest.mark.race
def test_tombstone_first_add_race_falls_back_to_rebased_merge(spark, tmp_path):
    """Two racing FIRST adders on a fresh tombstone log: the loser's
    seed overwrite raises ConcurrentWriteError, and with max_retries
    opted in it must rebase onto the winner's seed via merge — both
    id sets end up in the log, nothing crashes, nothing is lost."""
    from fs_indexer_elasticsearch_spark.operators.store_common import (
        TombstoneStore,
    )
    from fs_indexer_elasticsearch_spark.sinks.snapshot import (
        ConcurrentWriteError,
    )

    ts = TombstoneStore(spark, str(tmp_path / "idx"), "doc_id", num_buckets=4)

    # Simulate losing the seed race deterministically: the loser's
    # overwrite first lets "the other writer" commit its seed through
    # a separate handle, then raises — exactly the state a real loser
    # observes (pointer moved underneath it).
    winner = TombstoneStore(spark, str(tmp_path / "idx"), "doc_id", num_buckets=4)
    real_overwrite = ts.store.overwrite
    calls = {"n": 0}

    def racing_overwrite(df, **kw):
        calls["n"] += 1
        if calls["n"] == 1:
            winner.add(spark.createDataFrame([("w1",), ("w2",)], "doc_id string"))
            raise ConcurrentWriteError("simulated lost seed race")
        return real_overwrite(df, **kw)

    ts.store.overwrite = racing_overwrite
    try:
        ts.add(
            spark.createDataFrame([("l1",), ("l2",)], "doc_id string"),
            max_retries=5,
        )
    finally:
        ts.store.overwrite = real_overwrite

    ids = {r.doc_id for r in ts.ids().collect()}
    assert ids == {"w1", "w2", "l1", "l2"}

    # Without opting in, the same race stays fail-fast.
    ts2 = TombstoneStore(spark, str(tmp_path / "idx2"), "doc_id", num_buckets=4)
    def failing_overwrite(df, **kw):
        raise ConcurrentWriteError("simulated")
    ts2.store.overwrite = failing_overwrite
    import pytest as _pytest

    with _pytest.raises(ConcurrentWriteError):
        ts2.add(spark.createDataFrame([("x",)], "doc_id string"))


@pytest.mark.race
def test_two_writer_band_store_cycle_lands_both_batches_exactly_once(
    spark, tmp_path
):
    """The steady-state index cycle under TWO writers: each thread has
    its own MinHashBandStore handle (as two jobs would) and races
    match_and_merge(max_retries=...) for several rounds. Every batch
    must land exactly once — the claim-race loser rebases, never
    double-applies, never drops — and the final index equals the
    single-writer fold: seed + one version per merge, one row per
    doc x band, correct LWW batch_seq per row."""
    import threading

    path = str(tmp_path / "bands")
    MinHashBandStore(spark, path, num_buckets=8).seed(
        _corpus(spark), "doc_id", "text"
    )
    N_ROUNDS = 4
    programs = {
        "A": [
            (2 * j + 1, [(1000 + 10 * j, f"writer a round {j} " * 5)])
            for j in range(N_ROUNDS)
        ],
        "B": [
            (2 * j + 2, [(2000 + 10 * j, f"writer b round {j} " * 5)])
            for j in range(N_ROUNDS)
        ],
    }
    errors: list[Exception] = []

    def run(writer: str) -> None:
        try:
            store = MinHashBandStore(spark, path, num_buckets=8)
            for seq, rows in programs[writer]:
                store.match_and_merge(
                    _docs(spark, rows),
                    "doc_id",
                    "text",
                    batch_seq=seq,
                    max_retries=20,
                ).collect()
        except Exception as exc:  # noqa: BLE001 — surfaced below
            errors.append(exc)

    threads = [threading.Thread(target=run, args=(w,)) for w in ("A", "B")]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert errors == []

    store = MinHashBandStore(spark, path, num_buckets=8)
    # Exactly once: seed + one committed version per merge.
    assert store.store.current_version() == 1 + 2 * N_ROUNDS
    rows = store.store.read().select("sid", "b", "batch_seq").collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.sid, []).append((r.b, r.batch_seq))
    expected_seq = {doc: seq
                    for prog in programs.values()
                    for seq, batch in prog
                    for doc, _ in batch}
    for doc, seq in expected_seq.items():
        got = sorted(by_doc[doc])
        assert got == [(b, seq) for b in range(BANDS)]
    # Corpus rows untouched.
    assert all(
        all(s == 0 for _, s in v)
        for d, v in by_doc.items()
        if d not in expected_seq
    )


def test_bm25_index_store_lifecycle(spark, tmp_path):
    """Open-vocabulary BM25 index store (r14): seed / pruned add /
    replayed add (rows idempotent, turnstile stats untouched) / eager
    removal (mutation path) / tombstone removal (O(removal) with the
    doc-length sidecar adjusting the normalizer) / compaction — every
    step's search equals a from-scratch score over the surviving
    corpus, including a second, different query over the same index
    (the open-vocabulary point)."""
    import pyspark.sql.functions as F

    from fs_indexer_elasticsearch_spark.functions.text import tokens
    from fs_indexer_elasticsearch_spark.operators.incremental_bm25 import (
        Bm25IndexStore,
    )
    from fs_indexer_elasticsearch_spark.operators.ivm import (
        bm25_postings_of,
        bm25_topk,
    )

    docs = [
        (1, "spark join spark window fast"),
        (2, "window shuffle"),
        (3, "no relevant terms here"),
        (4, "join join join spark"),
        (5, "spark window join window"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    st = Bm25IndexStore(spark, str(tmp_path / "bm25"), num_buckets=8)

    def scratch(cur, terms):
        postings = bm25_postings_of(cur, "doc_id", "text", terms)
        stats = cur.select(tokens(F.col("text")).alias("tk")).agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.coalesce(F.sum(F.size("tk")), F.lit(0))
            .cast("long")
            .alias("sum_dl"),
        )
        return [
            (r.doc_id, r.bm25)
            for r in bm25_topk(postings, stats, k=5).collect()
        ]

    def served(terms):
        return [(r.doc_id, r.bm25) for r in st.search(terms, k=5).collect()]

    Q = ["spark", "join", "window"]
    st.seed(df.filter(F.col("doc_id") <= 3), "doc_id", "text")
    st.add(df.filter(F.col("doc_id") == 4), "doc_id", "text", seq=1)
    st.add(df.filter(F.col("doc_id") == 5), "doc_id", "text", seq=2)
    assert served(Q) == scratch(df, Q)

    # replayed add: rows LWW-idempotent, stats watermark holds
    st.add(df.filter(F.col("doc_id") == 5), "doc_id", "text", seq=2)
    assert served(Q) == scratch(df, Q)

    st.remove_docs(spark.createDataFrame([(4,)], "doc_id long"), mode="eager")
    cur = df.filter(F.col("doc_id") != 4)
    assert served(Q) == scratch(cur, Q)

    st.remove_docs(
        spark.createDataFrame([(1,)], "doc_id long"), mode="tombstone"
    )
    cur = df.filter(~F.col("doc_id").isin(1, 4))
    assert served(Q) == scratch(cur, Q)
    # double-remove of a tombstoned id must not double-subtract stats
    st.remove_docs(
        spark.createDataFrame([(1,)], "doc_id long"), mode="tombstone"
    )
    assert served(Q) == scratch(cur, Q)

    assert st.compact_tombstones() is not None
    assert served(Q) == scratch(cur, Q)

    # open vocabulary: a different query over the same persisted index
    assert served(["shuffle", "fast"]) == scratch(cur, ["shuffle", "fast"])
