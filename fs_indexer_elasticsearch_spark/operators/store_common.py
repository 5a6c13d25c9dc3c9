"""Shared plumbing for the persisted incremental index stores.

Three index classes ride one SnapshotStore each — the MinHash band
index (incremental_dedup.MinHashBandStore), the IVF ANN index
(incremental_ann.IvfIndexStore), and the positional-shingle index
(incremental_substring.ShingleSpanStore) — and they share the same
bucket-pruned probe/maintenance discipline. Keeping that discipline
here, in ONE place, prevents the contract drift a triplicated copy
invites (r7 review finding: the replay-purity and bucket-routing
fixes had to be hand-applied per store).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def touched_buckets(snapshot_store, rows: DataFrame) -> list[int]:
    """Distinct physical buckets the given keyed rows hash into.

    Bounded driver metadata: <= num_buckets ints — the one justified
    collect in the probe path (same class as SnapshotStore.merge's
    own touched-bucket listing)."""
    return sorted(
        r._bucket
        for r in rows.withColumn("_bucket", snapshot_store._bucket_col())
        .select("_bucket")
        .distinct()
        .collect()
    )


def read_pruned(snapshot_store, rows: DataFrame, *, empty_msg: str) -> DataFrame:
    """The stored slice covering ``rows``'s buckets, or raise
    ValueError(empty_msg) on an unseeded store."""
    stored = snapshot_store.read_buckets(touched_buckets(snapshot_store, rows))
    if stored is None:
        raise ValueError(empty_msg)
    return stored


def remove_by_column(
    snapshot_store, ids: DataFrame, col: str, *, empty_msg: str
) -> int:
    """Anti-join overwrite dropping every row whose ``col`` is in the
    one-column ``ids`` DataFrame — the shared slow path that makes
    MUTATION safe on an index bucketed by something other than its
    logical id (band hash / cell id / shingle hash): the rows to drop
    cannot be found by bucket pruning, so this is deliberately
    O(index) — one broadcast-anti-join pass and an overwrite commit.
    Returns the new store version."""
    ids2 = ids.select(F.col(ids.columns[0]).alias("_rm_id"))
    cur = snapshot_store.read()
    if cur is None:
        raise ValueError(empty_msg)
    kept = cur.join(F.broadcast(ids2), cur[col] == ids2["_rm_id"], "left_anti")
    return snapshot_store.overwrite(kept)
