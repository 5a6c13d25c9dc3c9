"""Contract tests for tools/scale_stress.py's amplification: the
stress harness only measures the operator if the generator preserves
workload structure — k replicas must multiply the dup/near-dup/session
structure exactly k times, never create cross-replica structure."""

from __future__ import annotations

import importlib.util

import pyspark.sql.functions as F


def _load_tool():
    spec = importlib.util.spec_from_file_location(
        "scale_stress", "/root/repo/tools/scale_stress.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_amplify_documents_replicas_are_token_disjoint(spark, tmp_path):
    ss = _load_tool()
    out = ss.amplify(spark, "/root/testdata/sf0.001", str(tmp_path), 2)
    src = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    amp = spark.read.parquet(f"{out}/documents.parquet")
    n = src.count()
    assert amp.count() == 2 * n
    # Replica 1 ids live in a disjoint range; original rows unchanged.
    r0 = amp.filter(F.col("doc_id") < ss.REPLICA_OFFSET)
    r1 = amp.filter(F.col("doc_id") >= ss.REPLICA_OFFSET)
    assert r0.count() == n and r1.count() == n
    assert r0.exceptAll(src).count() == 0
    # Token vocabularies of the two replicas are pairwise disjoint AS
    # SEEN BY THE ENGINE'S TOKENIZER (not a naive whitespace split —
    # the round-6 review caught an '_<r>' joint that whitespace-split
    # called disjoint while TOKEN_PATTERN split it back into the
    # shared base vocabulary), so no cross-replica near-dup can exist
    # by construction.
    from fs_indexer_elasticsearch_spark.functions.text import tokens

    tok = lambda df: df.select(  # noqa: E731
        F.explode(tokens(F.col("text"))).alias("t")
    ).distinct()
    assert tok(r0).join(tok(r1), "t", "left_semi").count() == 0


def test_amplify_events_preserves_per_user_structure(spark, tmp_path):
    ss = _load_tool()
    out = ss.amplify(spark, "/root/testdata/sf0.001", str(tmp_path), 2)
    src = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    amp = spark.read.parquet(f"{out}/events.parquet")
    assert amp.count() == 2 * src.count()
    # Per-user event counts replicate exactly: the replica-1 histogram
    # (ids offset by 1e9) equals the replica-0 histogram.
    h0 = (
        amp.filter(F.col("user_id") < ss.REPLICA_OFFSET)
        .groupBy("user_id")
        .count()
    )
    h1 = (
        amp.filter(F.col("user_id") >= ss.REPLICA_OFFSET)
        .withColumn("user_id", F.col("user_id") - ss.REPLICA_OFFSET)
        .groupBy("user_id")
        .count()
    )
    assert h0.exceptAll(h1).count() == 0 and h1.exceptAll(h0).count() == 0
