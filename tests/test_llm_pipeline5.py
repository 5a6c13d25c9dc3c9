"""Corpus-curation layer part 5 (plans.llm_pipeline5).

The DuckDB oracle gate is the primary correctness check; this file
covers what the hash-compare can't see: flag-band sanity, coverage
bounds, and — the one number an ANN user asks first — recall of the
int8-quantized search against float ground truth.
"""

from __future__ import annotations

from tests.conftest import SF_DIR

from fs_indexer_elasticsearch_spark.plans import ORACLES, QUERIES

NEW = [
    "gopher_quality_flags",
    "crossdoc_shingle_boilerplate",
    "quantized_ann_int8_topk",
    "quantized_ann_pq_topk",
]


def test_registered_with_oracles():
    for name in NEW:
        assert name in QUERIES and name in ORACLES


def test_gopher_flags_bounds(spark):
    rows = QUERIES["gopher_quality_flags"](spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert 0 <= r.n_pass <= r.n_docs
        assert 0.0 < r.avg_top_bigram_frac <= 1.0 + 1e-9
        assert 0.0 < r.avg_distinct_ratio <= 1.0 + 1e-9
        assert 0.0 < r.avg_mean_wlen < 20.0


def test_crossdoc_boilerplate_bounds(spark):
    rows = QUERIES["crossdoc_shingle_boilerplate"](spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert r.n_docs > 0
        assert 0.0 <= r.avg_coverage <= r.max_coverage + 1e-9
        assert r.max_coverage <= 1.0 + 1e-9
        assert 0 <= r.n_flagged <= r.n_docs


def test_quantized_ann_recall_floor(spark):
    """int8 max-abs quantization on 64-dim vectors loses almost no
    ranking information: recall@3 vs the float brute-force ground
    truth must clear a 0.8 floor (measured ~1.0)."""
    truth = {
        (r.query_id, r.neighbor_id)
        for r in QUERIES["similarity_bruteforce_topk"](spark, SF_DIR).collect()
    }
    got = {
        (r.query_id, r.neighbor_id)
        for r in QUERIES["quantized_ann_int8_topk"](spark, SF_DIR).collect()
    }
    assert truth
    recall = len(truth & got) / len(truth)
    assert recall >= 0.8, f"quantized recall@3 {recall:.3f} below floor"


def test_quantized_ann_shape(spark):
    rows = QUERIES["quantized_ann_int8_topk"](spark, SF_DIR).collect()
    by_q: dict[int, list] = {}
    for r in rows:
        by_q.setdefault(r.query_id, []).append(r)
        assert r.neighbor_id != r.query_id
        assert -1.0 - 1e-6 <= r.q_cos_sim <= 1.0 + 1e-6
    assert len(by_q) == 8
    for q, members in by_q.items():
        assert len(members) == 3
        sims = [m.q_cos_sim for m in members]
        assert sims == sorted(sims, reverse=True)


def _exact_l2_top3(spark):
    """Float L2 ground truth for the 8 PQ query vectors — the metric
    PQ approximates (cosine truth would confound metric mismatch with
    quantization loss)."""
    import pyspark.sql.functions as F
    from pyspark.sql import Window

    from fs_indexer_elasticsearch_spark.tables import load

    emb = load(spark, SF_DIR, "embeddings").select(
        "vec_id", F.transform("embedding", lambda v: v.cast("double")).alias("e")
    )
    q = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("query_id"), F.col("e").alias("qe")
    )
    d2 = F.aggregate(
        F.zip_with(F.col("qe"), F.col("e"), lambda a, b: (a - b) * (a - b)),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    w = Window.partitionBy("query_id").orderBy("d2", "neighbor_id")
    top = (
        q.join(emb, F.col("vec_id") != F.col("query_id"))
        .select("query_id", F.col("vec_id").alias("neighbor_id"), d2.alias("d2"))
        .withColumn("rn", F.row_number().over(w))
        .filter("rn <= 3")
    )
    return {(r.query_id, r.neighbor_id) for r in top.collect()}


def test_pq_ann_recall_floor(spark):
    """PQ ADC shortlist + exact rerank: recall@3 vs float L2 ground
    truth must clear 0.6. Uniform-random 64-dim embeddings are PQ's
    WORST case (no manifold structure, concentrated distances) —
    measured ~0.79 at m=16/k=16/shortlist 50; real embedding corpora
    sit far above the floor."""
    truth = _exact_l2_top3(spark)
    got = {
        (r.query_id, r.neighbor_id)
        for r in QUERIES["quantized_ann_pq_topk"](spark, SF_DIR).collect()
    }
    assert truth
    recall = len(truth & got) / len(truth)
    assert recall >= 0.6, f"PQ recall@3 {recall:.3f} below floor"


def test_pq_ann_shape(spark):
    rows = QUERIES["quantized_ann_pq_topk"](spark, SF_DIR).collect()
    by_q: dict[int, list] = {}
    for r in rows:
        by_q.setdefault(r.query_id, []).append(r)
        assert r.neighbor_id != r.query_id
        assert r.l2_d2 >= 0.0
    assert len(by_q) == 8
    for _q, members in by_q.items():
        assert len(members) == 3
        d2s = [m.l2_d2 for m in members]
        assert d2s == sorted(d2s)


def test_ivfpq_ann_recall_floor(spark):
    """IVF-PQ (IVFADC): recall@3 vs float L2 ground truth must clear
    0.6. Recall is bounded above by the coarse quantizer (a true
    neighbor in an unprobed cell is unreachable) AND degraded by the
    residual PQ — measured 0.958 at 16 cells / nprobe 2 / m=16 / k=16
    / shortlist 50 on the uniform-random worst-case corpus."""
    truth = _exact_l2_top3(spark)
    got = {
        (r.query_id, r.neighbor_id)
        for r in QUERIES["ann_ivfpq_topk"](spark, SF_DIR).collect()
    }
    assert truth
    recall = len(truth & got) / len(truth)
    assert recall >= 0.6, f"IVF-PQ recall@3 {recall:.3f} below floor"


def test_ivfpq_ann_shape(spark):
    rows = QUERIES["ann_ivfpq_topk"](spark, SF_DIR).collect()
    by_q: dict[int, list] = {}
    for r in rows:
        by_q.setdefault(r.query_id, []).append(r)
        assert r.neighbor_id != r.query_id
        assert r.l2_d2 >= 0.0
    assert len(by_q) == 8
    for _q, members in by_q.items():
        assert len(members) == 3
        d2s = [m.l2_d2 for m in members]
        assert d2s == sorted(d2s)


def test_ivfpq_recall_metric_consistent(spark):
    """The registered recall query must report exactly the set overlap
    the floor test computes (same truth, same approximate set)."""
    row = QUERIES["ann_ivfpq_recall"](spark, SF_DIR).collect()[0]
    truth = _exact_l2_top3(spark)
    got = {
        (r.query_id, r.neighbor_id)
        for r in QUERIES["ann_ivfpq_topk"](spark, SF_DIR).collect()
    }
    assert row.method == "ivfpq"
    assert row.n_truth == len(truth)
    assert row.n_hits == len(truth & got)


def test_minhash_estimate_quality_regime(spark):
    """16-permutation estimator: average |est - exact| on candidate
    pairs sits in the expected ~0.1 regime, never past 0.6."""
    row = QUERIES["minhash_estimate_quality"](spark, SF_DIR).collect()[0]
    assert row.n_pairs > 0
    assert 0.0 <= row.avg_abs_err <= 0.2
    assert row.max_abs_err <= 0.6
    assert 0 <= row.n_err_gt_03 <= row.n_pairs


def test_token_count_histogram_partitions_corpus(spark):
    rows = QUERIES["token_count_histogram"](spark, SF_DIR).collect()
    assert rows
    share_total = sum(r.share for r in rows)
    assert abs(share_total - 1.0) < 0.01
    for r in rows:
        # every member of bucket b has floor(log2(n_tokens)) == b
        assert 2**r.bucket <= r.min_tokens <= r.max_tokens < 2 ** (r.bucket + 1)


def test_dedup_cascade_monotone(spark):
    row = QUERIES["dedup_cascade_attrition"](spark, SF_DIR).collect()[0]
    assert row.n_raw >= row.n_after_exact >= row.n_after_neardup > 0
    # planted dups guarantee both stages remove something
    assert row.n_after_exact < row.n_raw
    assert row.n_after_neardup < row.n_after_exact
    assert abs(row.pct_kept - row.n_after_neardup / row.n_raw) < 1e-3


def test_substring_dup_spans_planted(spark, tmp_path):
    """Plant a known shared 7-word run inside otherwise-unique docs:
    the gaps-and-islands merge must report ONE maximal span of exactly
    7 words (3 consecutive duplicated 5-shingle starts), not three
    separate 5-word hits."""
    shared = "alpha beta gamma delta epsilon zeta eta"  # 7 words
    rows = [
        (1, f"u1a u1b u1c {shared} u1d u1e u1f u1g", "s1"),
        (2, f"v1a v1b {shared} v1c v1d v1e v1f v1g v1h", "s1"),
        (3, "w1a w1b w1c w1d w1e w1f w1g w1h w1i w1j", "s1"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    df.write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))

    got = {
        r.doc_id: r
        for r in QUERIES["substring_dup_spans"](spark, str(tmp_path)).collect()
    }
    assert set(got) == {1, 2}  # doc 3 shares nothing
    for doc_id in (1, 2):
        r = got[doc_id]
        assert r.n_spans == 1
        assert r.max_span_words == 7
        assert r.dup_shingles == 3  # 7-word run -> 3 stride-1 5-shingles


def test_substring_dedup_clean_planted(spark, tmp_path):
    """The removal step must drop exactly the words covered by the
    shared run and rebuild the remaining text in original order."""
    import hashlib

    shared = "alpha beta gamma delta epsilon zeta eta"  # 7 words
    rows = [
        (1, f"u1a u1b u1c {shared} u1d u1e", "s1"),
        (2, f"v1a v1b {shared} v1c", "s1"),
        (3, "w1a w1b w1c w1d w1e w1f", "s1"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    df.write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))

    got = {
        r.doc_id: r
        for r in QUERIES["substring_dedup_clean"](spark, str(tmp_path)).collect()
    }
    assert got[1].n_words == 12 and got[1].n_removed == 7
    assert got[1].clean_md5 == hashlib.md5(b"u1a u1b u1c u1d u1e").hexdigest()
    assert got[2].n_words == 10 and got[2].n_removed == 7
    assert got[2].clean_md5 == hashlib.md5(b"v1a v1b v1c").hexdigest()
    # untouched doc keeps its full text
    assert got[3].n_removed == 0
    assert got[3].clean_md5 == hashlib.md5(b"w1a w1b w1c w1d w1e w1f").hexdigest()


def test_quality_classifier_score_bounds_and_determinism(spark):
    from tests.conftest import SF_DIR

    rows = QUERIES["quality_classifier_score"](spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert 0.0 <= r.min_score <= r.avg_score <= r.max_score <= 1.0
        assert 0 <= r.n_keep <= r.n_docs
    # deterministic weights: a second run is bit-identical
    again = QUERIES["quality_classifier_score"](spark, SF_DIR).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again))


def test_bloom_prefilter_prunes_and_never_lies(spark):
    """The broadcast-bloom pre-filter must (a) keep EVERY shingle the
    exact vocabulary contains — a false negative would silently
    un-count real contamination, the one bloom property correctness
    rests on — and (b) actually prune: clean shingles surviving at
    ~the configured false-positive rate, not passing wholesale. The
    oracle gate already proves end-to-end equality; this pins the
    filter's two sides directly."""
    import pyspark.sql.functions as F

    from fs_indexer_elasticsearch_spark.plans.llm_pipeline2 import _split_col
    from fs_indexer_elasticsearch_spark.plans.llm_pipeline5 import (
        _BLOOM_M,
        _bloom_positions,
    )
    from fs_indexer_elasticsearch_spark.functions.text import (
        tokens,
        word_shingles,
    )
    from fs_indexer_elasticsearch_spark.tables import load

    docs = load(spark, SF_DIR, "documents").select(
        "doc_id", _split_col().alias("split"),
        word_shingles(tokens(F.col("text")), 3).alias("shingles"),
    ).localCheckpoint()
    eval_vocab = (
        docs.filter(F.col("split") != "train")
        .select(F.explode("shingles").alias("s"))
        .distinct()
        .localCheckpoint()
    )
    bitmap = bytearray(_BLOOM_M // 8)
    for r in eval_vocab.select(
        F.explode(_bloom_positions(F.col("s"))).alias("p")
    ).distinct().collect():
        bitmap[r.p >> 3] |= 1 << (r.p & 7)

    def might(arr):
        return all(bitmap[p >> 3] & (1 << (p & 7)) for p in arr)

    train_sh = (
        docs.filter(F.col("split") == "train")
        .select(F.explode("shingles").alias("s"))
        .distinct()
        .withColumn("pos", _bloom_positions(F.col("s")))
        .join(eval_vocab.withColumn("hit", F.lit(1)), "s", "left")
        .collect()
    )
    n_total = len(train_sh)
    n_real = sum(1 for r in train_sh if r.hit)
    n_pass = sum(1 for r in train_sh if might(r.pos))
    # (a) no false negatives: every real hit passes the filter
    assert all(might(r.pos) for r in train_sh if r.hit)
    # (b) real pruning: clean shingles mostly die at the bitmap
    n_clean = n_total - n_real
    n_fp = n_pass - n_real
    assert n_clean > 0 and n_fp < max(10, n_clean * 0.01)


def test_ivfpq_design_regime_clustered_corpus(spark):
    """IVF-PQ in its DESIGN regime: a corpus with real cluster
    structure (4 well-separated centers + small jitter — the manifold
    shape actual embedding corpora have, unlike the uniform-random
    worst case the registered gate measures). With one coarse centroid
    per true cluster and nprobe=2, every true neighbor lives in the
    probed cell and residuals are small, so recall@3 must be ~perfect
    (>= 0.9 asserted)."""
    import numpy as np
    import pyspark.sql.functions as F

    from fs_indexer_elasticsearch_spark.operators.similarity import (
        ivfpq_ann_topk,
    )

    rng = np.random.default_rng(11)
    centers = rng.normal(0, 1, (4, 64)) * 10.0
    corpus_rows = []
    for c in range(4):
        for i in range(30):
            v = centers[c] + rng.normal(0, 0.5, 64)
            corpus_rows.append((c * 100 + i, [float(x) for x in v]))
    query_rows = []
    for c in range(4):
        for i in range(2):
            v = centers[c] + rng.normal(0, 0.5, 64)
            query_rows.append((9000 + c * 10 + i, [float(x) for x in v]))

    def frame(rows):
        return spark.createDataFrame(rows, "vec_id long, e array<double>")

    corpus = frame(corpus_rows)
    queries = frame(query_rows)
    cents = frame(
        [(8000 + c, [float(x) for x in centers[c]]) for c in range(4)]
    )
    cb_src = corpus.filter(F.col("vec_id") % 100 < 4)  # 16 ids, 4/cluster
    got = {
        (r.query_id, r.neighbor_id)
        for r in ivfpq_ann_topk(
            corpus, queries, cents, cb_src, "vec_id", "e", k=3, nprobe=2
        ).collect()
    }

    cvec = {i: np.array(v) for i, v in corpus_rows}
    truth = set()
    for qid, qv in query_rows:
        q = np.array(qv)
        best = sorted(
            cvec, key=lambda i: (float(np.sum((cvec[i] - q) ** 2)), i)
        )[:3]
        truth.update((qid, b) for b in best)
    recall = len(truth & got) / len(truth)
    assert recall >= 0.9, f"design-regime recall {recall:.3f}"
