"""REST-API traversal source (S4).

Reference parity: LucidLinkAPI.traverse_filesystem
(lucidlink_api.py:182-298) — an asyncio recursive walk over the
HTTP directory API with depth-adaptive chunked concurrency (50/30/20,
:172-180) and a `_seen_paths` visited set (:43, 149-151).

Spark-first shape: iterative frontier BFS. Each round is one
distributed job — the frontier DataFrame of directories fans out via
mapInPandas (bounded per-task concurrency replaces the asyncio
semaphore), listings come back as rows, `dropDuplicates` on the path
replaces `_seen_paths`, and skip patterns prune the NEXT frontier
before fan-out (P2 pushdown analog). Level-synchronous BFS bounds
total in-flight requests at (tasks × per_task_concurrency), the
cluster analog of the reference's 300-request cap.

The lister is injectable: tests use an in-memory tree; production
would wrap the LucidLink REST client. Requests are idempotent (list
of a path), so Spark task retries are safe.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import pyspark.sql.functions as F
import pyspark.sql.types as T
from pyspark.sql import DataFrame, SparkSession

from ..tables import ckpt_shared

from ..functions import skip_filter

# One listed entry: mirrors the LucidLink payload shape
# (name/type/size/creationTime ns — lucidlink_api.py:64-74).
LISTING_SCHEMA = T.StructType(
    [
        T.StructField("path", T.StringType()),
        T.StructField("name", T.StringType()),
        T.StructField("type", T.StringType()),
        T.StructField("size_bytes", T.LongType()),
        T.StructField("creation_ns", T.LongType()),
    ]
)

ListFn = Callable[[str], list[dict]]


def api_bfs_scan(
    spark: SparkSession,
    list_fn: ListFn,
    root: str = "/",
    *,
    skip_patterns: list[str] | None = None,
    per_task_concurrency: int = 8,
    max_depth: int = 64,
    frontier_partitions: int = 8,
) -> DataFrame:
    """BFS over a directory-listing API → DataFrame of all entries."""
    patterns = skip_patterns or []

    def expand(batches: Iterator) -> Iterator:
        from concurrent.futures import ThreadPoolExecutor

        import pandas as pd

        with ThreadPoolExecutor(max_workers=per_task_concurrency) as pool:
            for pdf in batches:
                dirs = pdf["dir"].tolist()
                rows: list[tuple] = []
                for listing in pool.map(list_fn, dirs):
                    for e in listing:
                        rows.append(
                            (
                                e["path"],
                                e.get("name") or e["path"].rsplit("/", 1)[-1],
                                e.get("type", "file"),
                                e.get("size_bytes"),
                                e.get("creation_ns"),
                            )
                        )
                yield pd.DataFrame(
                    rows, columns=[f.name for f in LISTING_SCHEMA.fields]
                )

    frontier = spark.createDataFrame([(root,)], "dir string")
    # Cross-round visited set (the reference's `_seen_paths`): every
    # dir ever LISTED FROM. Without it a listing cycle (A lists B, B
    # lists A — parent links, mounts) re-enters the frontier every
    # round and the same directories are re-fetched over HTTP for all
    # `max_depth` rounds; dropDuplicates below is per-round only.
    seen_dirs = frontier
    rounds: list[DataFrame] = []
    collected: DataFrame | None = None
    for _ in range(max_depth):
        listed = (
            frontier.repartition(frontier_partitions)
            .mapInPandas(expand, LISTING_SCHEMA)
            # a path listed via two routes in one round is kept once.
            .dropDuplicates(["path"])
            .filter(skip_filter(F.col("path"), patterns))
            .cache()
        )
        rounds.append(listed)
        if listed.isEmpty():
            break
        collected = listed if collected is None else collected.unionByName(listed)
        # Next frontier: directories only, pruned BEFORE fan-out (P2),
        # minus everything already listed from.
        frontier = (
            listed.filter(F.col("type") == "directory")
            .select(F.col("path").alias("dir"))
            .join(seen_dirs, on="dir", how="left_anti")
        )
        if frontier.isEmpty():
            break
        seen_dirs = seen_dirs.unionByName(frontier)
    if collected is None:
        for r in rounds:
            r.unpersist()
        return spark.createDataFrame([], LISTING_SCHEMA)
    # Materialize once, truncate the multi-round lineage, then RELEASE
    # every round's cache — without this each scan pins one cached
    # DataFrame per level for the life of the session (the exact leak
    # walker.py:308-318 documents and fixes).
    out = collected.dropDuplicates(["path"]).transform(ckpt_shared)
    for r in rounds:
        r.unpersist()
    return out


def fake_tree_lister(tree: dict[str, list[dict]]) -> ListFn:
    """In-memory listing API for tests: {dir_path: [entry, ...]}."""

    def list_fn(path: str) -> list[dict]:
        return tree.get(path, [])

    return list_fn
