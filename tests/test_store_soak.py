"""Long-horizon SnapshotStore soak (r7 verdict #6): 100+ incremental
cycles on one store with keep_versions retention must show BOUNDED
on-disk state and FLAT per-cycle latency — version accrual is the
classic slow leak in pointer-swap designs, and per-commit tests never
see it. Numbers are recorded in SCALE.md."""

from __future__ import annotations

import os
import time

import pyspark.sql.functions as F

from fs_indexer_elasticsearch_spark.sinks.snapshot import SnapshotStore

N_CYCLES = 100
KEEP = 2
N_BUCKETS = 8
KEYSPACE = 200  # batches cycle through this key range: upserts + inserts mix


def _disk_stats(path: str) -> tuple[int, int, int]:
    """(n_manifests, n_data_files, total_bytes) under the store."""
    n_manifests = sum(
        1
        for n in os.listdir(path)
        if n.startswith("_MANIFEST_v") and n.endswith(".json")
    )
    n_files = 0
    total = 0
    for root, _dirs, files in os.walk(path):
        for fn in files:
            p = os.path.join(root, fn)
            try:
                total += os.path.getsize(p)
            except OSError:
                continue
            if fn.endswith(".parquet") or (
                "_bucket=" in root and not fn.startswith((".", "_"))
            ):
                n_files += 1
    return n_manifests, n_files, total


def test_store_soak_bounded_disk_and_flat_latency(spark, tmp_path):
    path = str(tmp_path / "soak")
    store = SnapshotStore(
        spark,
        path,
        key="k",
        version_col="seq",
        num_buckets=N_BUCKETS,
        layout="manifest",  # the object-store layout is where file accrual bites
    )

    def batch(cycle: int):
        # 20 rows per cycle, keys sliding over the keyspace: every
        # cycle mixes updates of recent keys with fresh inserts early on.
        start = (cycle * 13) % KEYSPACE
        rows = [((start + i) % KEYSPACE, cycle, f"payload-{cycle}-{i}") for i in range(20)]
        return spark.createDataFrame(rows, "k int, seq long, payload string")

    cycle_secs: list[float] = []
    for c in range(N_CYCLES):
        t0 = time.perf_counter()
        store.merge(batch(c))
        store.vacuum(keep=KEEP)
        cycle_secs.append(time.perf_counter() - t0)

    n_manifests, n_files, total_bytes = _disk_stats(path)

    # Retention bounds metadata exactly: KEEP manifests survive.
    assert n_manifests <= KEEP
    # Data files bounded by (buckets per version x retained versions) +
    # the current version's fresh commit — NOT by cycle count. Generous
    # 2x slack over the hard bound to keep the test box-insensitive.
    assert n_files <= 2 * (N_BUCKETS * (KEEP + 1)), n_files
    # Total bytes bounded (200 tiny rows + parquet overhead per file).
    assert total_bytes < 20 * 1024 * 1024, total_bytes
    # Rows correct after 100 cycles: the keyspace saturates.
    assert store.read().count() == KEYSPACE
    # Newest seq won per key (LWW sanity on a long chain).
    max_seq = store.read().agg(F.max("seq")).collect()[0][0]
    assert max_seq == N_CYCLES - 1

    # Flat latency: the median of the last 20 cycles must not exceed
    # 3x the median of cycles 5..25 (skip JIT warmup). A version-chain
    # leak (e.g. manifests or files growing with N) trips this.
    def median(xs):
        xs = sorted(xs)
        return xs[len(xs) // 2]

    early, late = median(cycle_secs[5:25]), median(cycle_secs[-20:])
    assert late < 3 * early, (early, late)
