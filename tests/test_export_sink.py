"""Training-shard export sink (sinks.export).

Checks the loader-facing contract: deterministic shard membership,
lossless round trip, file-size bounding, hive partition layout, and
shard-subset reads.
"""

from __future__ import annotations

import glob
import os

import pyspark.sql.functions as F

from tests.conftest import SF_DIR

from fs_indexer_elasticsearch_spark.sinks.export import (
    read_training_shards,
    with_shard,
    write_training_shards,
)
from fs_indexer_elasticsearch_spark.tables import load

N_SHARDS = 4


def test_shard_assignment_deterministic_and_total(spark):
    docs = load(spark, SF_DIR, "documents")
    a = with_shard(docs, "doc_id", N_SHARDS).select("doc_id", "shard")
    b = with_shard(docs, "doc_id", N_SHARDS).select(
        "doc_id", F.col("shard").alias("shard2")
    )
    joined = a.join(b, "doc_id")
    assert joined.where(F.col("shard") != F.col("shard2")).count() == 0
    mn, mx = a.agg(F.min("shard"), F.max("shard")).first()
    assert 0 <= mn and mx < N_SHARDS


def test_round_trip_lossless(spark, tmp_path):
    docs = load(spark, SF_DIR, "documents")
    out = str(tmp_path / "export")
    write_training_shards(docs, out, key="doc_id", n_shards=N_SHARDS)
    back = read_training_shards(spark, out)
    assert back.count() == docs.count()
    assert set(back.columns) == set(docs.columns) | {"shard"}
    # Content equality, not just counts.
    assert (
        back.select("doc_id", "n_chars")
        .exceptAll(docs.select("doc_id", "n_chars"))
        .count()
        == 0
    )


def test_max_records_per_file_bounds_files(spark, tmp_path):
    docs = load(spark, SF_DIR, "documents")
    n = docs.count()
    cap = max(1, n // (N_SHARDS * 3))
    out = str(tmp_path / "bounded")
    write_training_shards(
        docs, out, key="doc_id", n_shards=N_SHARDS, max_records_per_file=cap
    )
    files = glob.glob(os.path.join(out, "shard=*", "part-*.parquet"))
    # At least one shard split into multiple files, and no file exceeds
    # the cap.
    assert len(files) > N_SHARDS
    import pyarrow.parquet as pq

    for f in files:
        assert pq.ParquetFile(f).metadata.num_rows <= cap


def test_every_file_belongs_to_exactly_one_shard(spark, tmp_path):
    """The loader contract: a part file never mixes shard values.
    Guaranteed by the shard=<i> hive layout (dynamic partitioning) —
    NOT by repartition(n, 'shard'), whose murmur3 value-hashing
    collides shard ids into shared tasks (round-6 review finding)."""
    docs = load(spark, SF_DIR, "documents")
    out = str(tmp_path / "onefileoneshard")
    write_training_shards(docs, out, key="doc_id", n_shards=N_SHARDS)
    shard_dirs = glob.glob(os.path.join(out, "shard=*"))
    assert len(shard_dirs) == N_SHARDS
    # Cross-check the written assignment against the audited one: the
    # shard_balance_audit query and the sink share md5_shard, so the
    # per-shard row counts must agree with a direct recompute.
    from fs_indexer_elasticsearch_spark.functions.hashing import md5_shard

    expect = {
        r.shard: r.n
        for r in docs.groupBy(
            md5_shard(F.col("doc_id"), N_SHARDS).alias("shard")
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    got = {
        r.shard: r.n
        for r in read_training_shards(spark, out)
        .groupBy("shard")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert got == expect


def test_partitioned_layout_and_subset_read(spark, tmp_path):
    docs = load(spark, SF_DIR, "documents")
    out = str(tmp_path / "bylang")
    write_training_shards(
        docs, out, key="doc_id", n_shards=N_SHARDS, partition_by="lang"
    )
    langs = [r.lang for r in docs.select("lang").distinct().collect()]
    for lang in langs:
        assert os.path.isdir(os.path.join(out, f"lang={lang}"))
    # Shard-subset read returns exactly those shards' rows.
    sub = read_training_shards(spark, out, shards=[0, 1])
    full = read_training_shards(spark, out)
    expect = full.where(F.col("shard").isin(0, 1)).count()
    assert sub.count() == expect > 0
    assert sub.where(~F.col("shard").isin(0, 1)).count() == 0
