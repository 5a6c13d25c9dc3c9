"""Distributed filesystem enumerator.

Reference parity (S1/S2/S3): the reference shells out to `find` —
sequentially (scanner.py:322-412) or one subprocess per top-level dir
in a thread pool with hand-rolled retries and worker-count heuristics
(parallel_scanner.py:199-334, 823-894). Spark replaces all of that:

  directory list → DataFrame → repartition(n) → mapInPandas(scan)

Task scheduling, retries (spark.task.maxFailures), stragglers
(speculation) and worker sizing (AQE / dynamic allocation) come from
the engine; the per-partition body is a plain os.scandir walk.

Predicate pushdown (P2): skip patterns prune the directory FRONTIER
before fan-out — excluded subtrees are never descended into, the
exact analog of the reference compiling skips into `find -not -path`
args (scanner.py:338-347).

Scale: for 100 TB / billions of entries, the driver only enumerates
the first `split_depth` levels (cheap); the heavy recursive walk is
distributed. Deep-skew directories are handled by re-splitting: any
partition yielding > max_entries_per_task re-enqueues its subdirs as
new work items (iterative frontier loop, the S4 BFS shape).
"""

from __future__ import annotations

import fnmatch
import os
from collections.abc import Iterator
from datetime import datetime, timezone

import pyspark.sql.functions as F
import pyspark.sql.types as T
from pyspark.sql import DataFrame, SparkSession

from ..tables import ckpt_shared

from ..functions import ancestors  # noqa: F401  (re-exported for callers)

_SCAN_SCHEMA = T.StructType(
    [
        T.StructField("filepath", T.StringType()),
        T.StructField("name", T.StringType()),
        T.StructField("type", T.StringType()),
        T.StructField("size_bytes", T.LongType()),
        T.StructField("modified_time", T.TimestampType()),
        T.StructField("creation_time", T.TimestampType()),
    ]
)


def _skip(name: str, path: str, patterns: list[str]) -> bool:
    return any(
        fnmatch.fnmatch(name, p) or fnmatch.fnmatch(path, p) for p in patterns
    )


_PENDING = "_pending"  # marker row: an unwalked dir re-enqueued as frontier work

# Work items are strings: a plain directory path, or a name-range SLICE
# of one directory encoded "dir\x00start\x00end" (NUL never appears in
# POSIX filenames). A slice means: scan only the direct children of
# `dir` whose name is in [start, end) — the mechanism that lets one
# flat directory with 10^8 direct children fan out across many tasks
# instead of being one os.scandir unit of work.


def _encode_slice(d: str, start: str, end: str | None) -> str:
    return f"{d}\x00{start}\x00{end or ''}"


def _decode_item(item: str) -> tuple[str, str | None, str | None]:
    if "\x00" in item:
        d, start, end = item.split("\x00")
        return d, start or None, end or None
    return item, None, None


def _walk(
    root: str, patterns: list[str], budget: int | None = None
) -> Iterator[tuple]:
    """DFS walk; with a ``budget``, stops DESCENDING once that many
    entries were emitted and re-emits the not-yet-walked work as
    ``_PENDING`` rows. Oversized subtrees come back as whole directories;
    a directory whose DIRECT children alone exceed the remaining budget
    is split into budget-sized name-range slices (sorted names, so
    slices are deterministic, disjoint and complete) — each slice fans
    out as its own work item next round. Rounds never duplicate or lose
    entries."""
    count = 0
    stack = [root] if isinstance(root, str) else list(root)
    while stack:
        item = stack.pop()
        d, start, end = _decode_item(item)
        if budget is not None and count >= budget:
            yield (item, os.path.basename(d), _PENDING, None, None, None)
            continue
        try:
            entries = list(os.scandir(d))
        except OSError:
            continue  # unreadable dir: skip, like find's permission errors
        remaining = None if budget is None else budget - count
        sliced = start is not None or end is not None
        if sliced or (remaining is not None and len(entries) > remaining):
            # Name order makes range boundaries reproducible across
            # rescans of the same directory.
            entries.sort(key=lambda e: e.name)
        if sliced:
            entries = [
                e
                for e in entries
                if (start is None or e.name >= start)
                and (end is None or e.name < end)
            ]
        if remaining is not None and len(entries) > remaining:
            rest = entries[remaining:]
            entries = entries[:remaining]
            # Hand the residue back as parallel budget-sized slices so
            # the NEXT round spreads one flat directory across tasks.
            for i in range(0, len(rest), budget):
                nxt = rest[i + budget].name if i + budget < len(rest) else end
                yield (
                    _encode_slice(d, rest[i].name, nxt),
                    rest[i].name,
                    _PENDING,
                    None,
                    None,
                    None,
                )
        for e in entries:
            if _skip(e.name, e.path, patterns):
                continue
            try:
                st = e.stat(follow_symlinks=False)
            except OSError:
                continue
            is_dir = e.is_dir(follow_symlinks=False)
            mt = datetime.fromtimestamp(st.st_mtime, tz=timezone.utc).replace(tzinfo=None)
            ct = datetime.fromtimestamp(st.st_ctime, tz=timezone.utc).replace(tzinfo=None)
            yield (
                e.path,
                e.name,
                "directory" if is_dir else "file",
                None if is_dir else st.st_size,
                mt,
                ct,
            )
            count += 1
            if is_dir:
                stack.append(e.path)


def list_top_dirs(root: str, patterns: list[str], depth: int = 1) -> list[str]:
    """Driver-side shallow enumeration: the work items for the
    distributed walk (the reference's split_directories,
    parallel_scanner.py:199-334). Frontier pruning applies the skip
    patterns here, so excluded subtrees are never shipped to tasks."""
    frontier = [root]
    for _ in range(depth):
        nxt: list[str] = []
        for d in frontier:
            try:
                for e in os.scandir(d):
                    if e.is_dir(follow_symlinks=False) and not _skip(
                        e.name, e.path, patterns
                    ):
                        nxt.append(e.path)
            except OSError:
                continue
        if not nxt:
            break
        frontier = nxt
    return sorted(frontier)


def _shallow_walk(
    root: str, patterns: list[str], depth: int
) -> tuple[list[tuple], list[str]]:
    """ONE driver-side pass over the first ``depth`` levels: returns
    (entry rows for levels 1..depth, frontier dirs AT level depth).

    The frontier is strictly the dirs at level ``depth`` — EMPTY when
    the tree ends earlier — so the distributed walk can never re-cover
    a level this walk already emitted (the old two-pass version handed
    a shallower fallback frontier to the tasks, double-emitting every
    entry under a root with no subdirectories; it also scandir'd the
    shallow levels twice)."""
    rows: list[tuple] = []
    frontier = [root]
    for _ in range(depth):
        nxt: list[str] = []
        for d in frontier:
            try:
                entries = list(os.scandir(d))
            except OSError:
                continue
            for e in entries:
                if _skip(e.name, e.path, patterns):
                    continue
                try:
                    st = e.stat(follow_symlinks=False)
                except OSError:
                    continue
                is_dir = e.is_dir(follow_symlinks=False)
                rows.append(
                    (
                        e.path,
                        e.name,
                        "directory" if is_dir else "file",
                        None if is_dir else st.st_size,
                        datetime.fromtimestamp(st.st_mtime, tz=timezone.utc).replace(
                            tzinfo=None
                        ),
                        datetime.fromtimestamp(st.st_ctime, tz=timezone.utc).replace(
                            tzinfo=None
                        ),
                    )
                )
                if is_dir:
                    nxt.append(e.path)
        frontier = nxt
        if not frontier:
            break
    return rows, sorted(frontier)


def scan_filesystem(
    spark: SparkSession,
    root: str,
    skip_patterns: list[str] | None = None,
    num_partitions: int | None = None,
    split_depth: int | None = None,
    max_entries_per_task: int | None = None,
) -> DataFrame:
    """Distributed recursive scan of ``root`` → raw entry DataFrame.

    The driver enumerates the first levels (plus the shallow entries
    themselves); each deeper subtree is walked inside a task.
    ``split_depth=None`` adapts: descend until the frontier has at
    least 2× the target parallelism work items (a tree with 2 huge
    top dirs must not run 2 tasks), capped at depth 4.

    ``max_entries_per_task`` bounds subtree skew: a work item that
    would emit more entries than the budget stops descending and hands
    its unwalked subdirectories back as new frontier work, which the
    next round spreads across tasks (the reference's oversized-dir
    re-split, parallel_scanner.py:823-894, as an iterative BFS round —
    the S4 api_walker shape). ``None`` keeps the single-round lazy
    plan.
    """
    patterns = skip_patterns or []
    target = num_partitions or spark.sparkContext.defaultParallelism
    if split_depth is None:
        split_depth = 1
        while split_depth < 4:
            dirs = list_top_dirs(root, patterns, split_depth)
            if len(dirs) >= 2 * target or not dirs:
                break
            deeper = list_top_dirs(root, patterns, split_depth + 1)
            if len(deeper) <= len(dirs):
                break  # no further fan-out available
            split_depth += 1
    # One pass over the shallow levels yields BOTH the entry rows and
    # the task frontier (strictly the dirs at split_depth, empty when
    # the tree ends earlier) — no double scandir, no overlap.
    shallow_rows, dirs = _shallow_walk(root, patterns, split_depth)
    n = num_partitions or max(min(len(dirs), 2 * target), 1)

    def scan_partition(it: Iterator) -> Iterator:
        import pandas as pd

        for pdf in it:
            rows = []
            for d in pdf["dir"]:
                rows.extend(_walk(d, patterns, max_entries_per_task))
            yield pd.DataFrame(
                rows, columns=[f.name for f in _SCAN_SCHEMA.fields]
            )

    def one_round(work: DataFrame, n_items: int) -> DataFrame:
        return work.repartition(min(n, max(n_items, 1))).mapInPandas(
            scan_partition, _SCAN_SCHEMA
        )

    def dirs_df() -> DataFrame:
        return spark.createDataFrame([(d,) for d in dirs], "dir string")

    if not dirs:
        deep = spark.createDataFrame([], _SCAN_SCHEMA)
    elif max_entries_per_task is None:
        deep = one_round(dirs_df(), len(dirs))
    else:
        # Iterative frontier rounds: each round's oversized subtrees
        # (or flat-directory slices) come back as _PENDING work items
        # and fan out across the next round's tasks. The frontier
        # stays a DataFrame end to end — the next round maps over the
        # persisted previous round's pending slice, so at extreme
        # fan-out no path list ever lands on the driver; loop control
        # collects ONLY the pending COUNT.
        parts: list[DataFrame] = []
        rounds: list[DataFrame] = []
        work, n_work = dirs_df(), len(dirs)
        while n_work:
            scanned = one_round(work, n_work).persist()
            rounds.append(scanned)
            pending = scanned.filter(F.col("type") == _PENDING)
            n_work = pending.count()
            work = pending.select(F.col("filepath").alias("dir"))
            parts.append(scanned.filter(F.col("type") != _PENDING))
        deep = parts[0]
        for p in parts[1:]:
            deep = deep.unionByName(p)
        # Materialize the union once (rounds are already in cache, so
        # this is a block copy, not a re-walk), truncate the multi-round
        # lineage, then RELEASE every round's pinned partitions — without
        # this each pipeline cycle leaks one persisted scan per round
        # for the life of the session.
        deep = deep.transform(ckpt_shared)
        for r in rounds:
            r.unpersist()

    shallow = spark.createDataFrame(shallow_rows, _SCAN_SCHEMA)
    return shallow.unionByName(deep)


def to_fs_entries(raw: DataFrame, root: str) -> DataFrame:
    """Derive the canonical fs_entry columns from a raw scan."""
    from ..functions import entry_id, extension, relative_to

    rel = relative_to(F.col("filepath"), root)
    return raw.select(
        entry_id(rel).alias("id"),
        F.col("name"),
        rel.alias("relative_path"),
        F.col("filepath"),
        F.col("type"),
        F.col("size_bytes"),
        extension(F.col("name")).alias("extension"),
        F.lit("").alias("checksum"),
        F.col("modified_time"),
        F.col("creation_time"),
        F.current_timestamp().alias("last_seen"),
    )
