"""S4 API-BFS source + custom stateful streaming operator."""

from __future__ import annotations

import pyspark.sql.functions as F

from fs_indexer_elasticsearch_spark.sources.api_walker import (
    api_bfs_scan,
    fake_tree_lister,
)

TREE = {
    "/": [
        {"path": "/docs", "type": "directory"},
        {"path": "/media", "type": "directory"},
        {"path": "/readme.txt", "type": "file", "size_bytes": 10, "creation_ns": 1700000000_000000000},
    ],
    "/docs": [
        {"path": "/docs/a.md", "type": "file", "size_bytes": 20},
        {"path": "/docs/drafts", "type": "directory"},
    ],
    "/docs/drafts": [
        {"path": "/docs/drafts/wip.md", "type": "file", "size_bytes": 5},
    ],
    "/media": [
        {"path": "/media/.cache", "type": "directory"},
        {"path": "/media/img.png", "type": "file", "size_bytes": 999},
    ],
    "/media/.cache": [
        {"path": "/media/.cache/tmp1", "type": "file", "size_bytes": 1},
    ],
}


def test_api_bfs_scan_full_tree(spark):
    out = api_bfs_scan(spark, fake_tree_lister(TREE), "/")
    paths = {r.path for r in out.collect()}
    assert "/docs/drafts/wip.md" in paths  # depth-3 reached
    assert "/media/img.png" in paths
    assert len(paths) == 9


def test_api_bfs_prunes_frontier(spark):
    out = api_bfs_scan(spark, fake_tree_lister(TREE), "/", skip_patterns=[".cache"])
    paths = {r.path for r in out.collect()}
    # .cache dir dropped AND never listed (its child is absent).
    assert "/media/.cache" not in paths
    assert "/media/.cache/tmp1" not in paths
    assert "/media/img.png" in paths


def test_running_user_stats_accumulates(spark, tmp_path):
    from fs_indexer_elasticsearch_spark.streaming.stateful import running_user_stats
    from fs_indexer_elasticsearch_spark.tables import load

    ev = load(spark, "/root/testdata/sf0.001", "events").limit(300).cache()
    src = str(tmp_path / "stream")
    # Two micro-batches: two files, maxFilesPerTrigger=1.
    ev.filter(F.col("event_id") % 2 == 0).coalesce(1).write.parquet(src + "/b1")
    ev.filter(F.col("event_id") % 2 == 1).coalesce(1).write.parquet(src + "/b2")

    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src + "/b*")
    )
    q = (
        running_user_stats(stream)
        .writeStream.outputMode("update")
        .format("memory")
        .queryName("user_stats")
        .start()
    )
    try:
        q.processAllAvailable()
        # Final per-user totals (last update per user) must equal the
        # batch ground truth — state accumulated across micro-batches.
        import pandas as pd

        got = spark.sql(
            """
            SELECT user_id, n_events FROM (
              SELECT *, row_number() OVER (PARTITION BY user_id
                        ORDER BY n_events DESC) rn FROM user_stats
            ) WHERE rn = 1
            """
        ).toPandas()
        truth = (
            ev.groupBy("user_id").count().toPandas().rename(columns={"count": "n"})
        )
        m = got.merge(truth, on="user_id")
        assert (m.n_events == m.n).all()
        assert len(m) == len(truth)
    finally:
        q.stop()


def test_api_bfs_terminates_on_listing_cycle(spark):
    """A listing with a cycle (parent links: A lists B, B lists A)
    must list each directory ONCE and terminate — the cross-round
    visited set (`_seen_paths` parity); per-round dropDuplicates alone
    re-fetched the cycle for all max_depth rounds."""
    import glob
    import os
    import tempfile
    import uuid

    # The lister runs on EXECUTORS (mapInPandas) — record calls through
    # the filesystem (local mode shares it), not a driver-side list.
    call_dir = tempfile.mkdtemp(prefix="api-cycle-calls-")

    def lister(path):
        tag = path.strip("/").replace("/", "_") or "root"
        open(os.path.join(call_dir, f"{tag}.{uuid.uuid4().hex}"), "w").close()
        cyc = {
            "/": [{"path": "/a", "type": "directory"}],
            "/a": [
                {"path": "/b", "type": "directory"},
                {"path": "/a/f.txt", "type": "file", "size_bytes": 1},
            ],
            "/b": [{"path": "/a", "type": "directory"}],  # back-edge
        }
        return cyc.get(path, [])

    out = api_bfs_scan(spark, lister, "/", max_depth=16)
    paths = {r.path for r in out.collect()}
    assert paths == {"/a", "/b", "/a/f.txt"}
    # Each directory listed exactly once despite the cycle.
    calls = sorted(
        os.path.basename(f).split(".")[0]
        for f in glob.glob(os.path.join(call_dir, "*"))
    )
    assert calls == ["a", "b", "root"]
