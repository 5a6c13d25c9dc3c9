"""Incremental IVF index: seed+add equals single-pass build, adds are
O(delta) and idempotent, search prunes to the probed cells' buckets."""

from __future__ import annotations

import pyspark.sql.functions as F

from fs_indexer_elasticsearch_spark.operators.incremental_ann import IvfIndexStore
from fs_indexer_elasticsearch_spark.operators.similarity import ivf_ann_topk


def _vecs(spark, ids):
    """Deterministic 64-dim vectors: v[i][d] = ((i*31 + d*7) % 13) - 6."""
    rows = [
        (i, [float(((i * 31 + d * 7) % 13) - 6) for d in range(64)])
        for i in ids
    ]
    return spark.createDataFrame(rows, "vec_id long, emb array<double>")


def test_seed_plus_add_equals_single_pass_search(spark, tmp_path):
    full = _vecs(spark, range(60))
    centroids = full.filter(F.col("vec_id") < 6)
    queries = full.filter(F.col("vec_id") % 17 == 1)

    store = IvfIndexStore(spark, str(tmp_path / "ivf"), num_buckets=16)
    store.seed(full.filter(F.col("vec_id") % 4 != 0), centroids, "vec_id", "emb")
    store.add(full.filter(F.col("vec_id") % 4 == 0), "vec_id", "emb", seq=1)

    got = sorted(
        map(tuple, store.search(queries, "vec_id", "emb", k=3, nprobe=2).collect())
    )
    want = sorted(
        map(
            tuple,
            ivf_ann_topk(
                full, queries, centroids, "vec_id", "emb", k=3, nprobe=2
            ).collect(),
        )
    )
    assert got == want and len(got) > 0


def test_add_is_o_delta_and_idempotent(spark, tmp_path):
    full = _vecs(spark, range(40))
    centroids = full.filter(F.col("vec_id") < 4)
    store = IvfIndexStore(spark, str(tmp_path / "ivf"), num_buckets=16)
    store.seed(full.filter(F.col("vec_id") < 30), centroids, "vec_id", "emb")
    assert store.store.read().count() == 30

    batch = _vecs(spark, range(30, 40))
    store.add(batch, "vec_id", "emb", seq=1)
    assert store.store.read().count() == 40  # grew by exactly |batch|
    store.add(batch, "vec_id", "emb", seq=2)  # retry: LWW on vec_id
    assert store.store.read().count() == 40


def test_search_reads_only_probed_buckets(spark, tmp_path):
    """nprobe cells per query bound the touched buckets; the pruned
    slice is a strict subset of the index for a single query."""
    full = _vecs(spark, range(80))
    centroids = full.filter(F.col("vec_id") < 8)
    store = IvfIndexStore(spark, str(tmp_path / "ivf"), num_buckets=64)
    store.seed(full, centroids, "vec_id", "emb")

    from fs_indexer_elasticsearch_spark.operators.similarity import assign_cells

    qc = assign_cells(
        full.filter(F.col("vec_id") == 1), store.centroids(),
        "vec_id", "emb", "query_id", "qvec", 2,
    )
    touched = (
        qc.select("cid")
        .distinct()
        .withColumn("_bucket", store.store._bucket_col())
        .select("_bucket")
        .distinct()
        .count()
    )
    assert touched <= 2 < 64
    # And an empty index refuses search with a clear error.
    import pytest

    empty = IvfIndexStore(spark, str(tmp_path / "ivf2"))
    with pytest.raises(ValueError, match="seed"):
        empty.search(full.limit(1), "vec_id", "emb")
