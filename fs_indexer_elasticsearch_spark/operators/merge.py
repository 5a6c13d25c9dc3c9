"""Snapshot merge / diff — the reference's signature upsert operators
re-expressed as deterministic DataFrame joins (SURVEY §2.5).

Reference parity:
 - upsert_newer_wins: ``INSERT ... ON CONFLICT(key) DO UPDATE ...
   WHERE excluded.modified_time > files.modified_time``
   (scanner.py:225-244, parallel_scanner.py:752-771)
 - insert_or_replace: ``INSERT OR REPLACE`` last-writer-wins
   (db_duckdb.py:242-245, direct_links.py:169-172)
 - snapshot_diff: removed/added/changed detection
   (main.py:339-362, scanner.py:414-463, db_duckdb.py:296-312)

Scale design: there is no table format with MERGE here (no Delta in
the image), so merge = one full-outer join on the key. At 100 TB the
snapshot is stored partitioned by a stable prefix of the key hash
(see sinks/snapshot.py); incoming batches touch few partitions, and a
partition-pruned merge (join only the affected partitions, copy the
rest forward) keeps the rewrite proportional to the batch, not the
table. Both sides arrive hash-partitioned on the key → sort-merge
join with no extra exchange when bucketed.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window


def upsert_newer_wins(
    current: DataFrame,
    batch: DataFrame,
    key: str | list[str],
    version_col: str,
    *,
    delta_batch: bool = True,
    dedup_current: bool = False,
) -> DataFrame:
    """Insert new keys; update existing keys only when the incoming row
    is strictly newer (P8 staleness predicate, scanner.py:243).

    ``key`` may be a single column or a COMPOSITE key (list of
    columns, each non-null by contract) — e.g. the positional shingle
    index upserts on (sid, pos), which as a composite avoids
    materializing a concatenated "sid:pos" string per row (r7 verdict
    #3: at O(corpus tokens) rows that string is a storage-bill
    constant).

    Implemented as a full-outer join + per-column ``when`` pick —
    deterministic, idempotent (re-applying the same batch is a no-op).

    Join strategy: with ``delta_batch=True`` (the default, and the
    SnapshotStore.merge contract) the BATCH side carries a shuffle_hash
    hint — in a snapshot merge the batch is the delta (small), so the
    planner builds the per-partition hash map on it and STREAMS the
    current side with no sort on either side (full-outer shuffled-hash
    join). At 100 TB this removes the two table-scale sorts a
    sort-merge join would pay; the build side stays bounded because it
    is delta-sized (and bucket-pruned by SnapshotStore.merge).

    PRECONDITION for ``delta_batch=True``: the batch must be
    delta-sized — ShuffledHashJoin's build side does not spill, so a
    table-sized batch risks executor OOM. Pass ``delta_batch=False``
    for table-vs-table upserts to keep the spill-safe sort-merge plan
    (the same reason snapshot_diff, where BOTH sides are table-sized,
    never hints).
    """
    cols = current.columns
    if set(cols) != set(batch.columns):
        raise ValueError(
            f"schema mismatch: current={sorted(cols)} batch={sorted(batch.columns)}"
        )
    keys = [key] if isinstance(key, str) else list(key)
    if dedup_current:
        # PRECONDITION RELAXATION: the join below assumes the current
        # side is key-unique — a duplicated key fans every matching
        # batch row out into one output row PER duplicate (exact
        # duplicate rows after the pick). Stores whose layout can
        # legitimately hold superseded copies of a key in the touched
        # slice (e.g. an index bucketed on a DERIVED column, where a
        # re-assigned row's old copy survives in its old bucket — the
        # IVF store's documented dead weight) opt into collapsing the
        # current slice to its newest row per key first, with the
        # same deterministic full-column tiebreak the streaming dedup
        # uses. Side effect: rewritten buckets shed their superseded
        # copies — the slice self-heals as it is touched.
        from pyspark.sql import Window

        tiebreak = [
            F.desc(c)
            for c in sorted(cols)
            if c not in keys and c != version_col
        ]
        w = Window.partitionBy(*keys).orderBy(
            F.desc(version_col), *tiebreak
        )
        current = (
            current.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .drop("_rn")
        )
    cur = current.alias("cur")
    new = (batch.hint("shuffle_hash") if delta_batch else batch).alias("new")
    # Key columns are non-null by contract, so one component's nullity
    # marks side-absence for the whole (possibly composite) key.
    take_new = F.col(f"cur.{keys[0]}").isNull() | (
        F.col(f"new.{version_col}") > F.col(f"cur.{version_col}")
    )
    cond = F.lit(True)
    for k in keys:
        cond = cond & (F.col(f"cur.{k}") == F.col(f"new.{k}"))
    joined = cur.join(new, cond, "full_outer")
    picked = [
        F.when(
            F.col(f"new.{keys[0]}").isNotNull() & take_new, F.col(f"new.{c}")
        )
        .otherwise(F.col(f"cur.{c}"))
        .alias(c)
        for c in cols
    ]
    return joined.select(*picked)


def insert_or_replace(
    current: DataFrame,
    batch: DataFrame,
    key: str,
    version_col: str | None = None,
) -> DataFrame:
    """Last-writer-wins whole-row upsert (INSERT OR REPLACE,
    db_duckdb.py:242-245): keep current rows whose key is absent from
    the batch, then append the batch.

    A batch with DUPLICATE keys (e.g. a rescan union) collapses to one
    row per key first — DuckDB's INSERT OR REPLACE keeps exactly one
    (the last in statement order), and skipping this would plant
    duplicate keys in the table of record, fanning out every later
    merge join. A distributed batch has no statement order, so the
    winner is deterministic instead: greatest ``version_col`` when
    given (ties broken by the full row), else the greatest full row."""
    order = F.struct(
        *([F.col(version_col)] if version_col else []),
        *[F.col(c) for c in batch.columns],
    )
    w = Window.partitionBy(key).orderBy(order.desc())
    batch = (
        batch.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
    survivors = current.join(batch.select(key), on=key, how="left_anti")
    return survivors.unionByName(batch)


def snapshot_diff(
    previous: DataFrame, current: DataFrame, key: str, compare_cols: list[str] | None = None
) -> DataFrame:
    """Change detection between two snapshots → DataFrame of
    ``(key, change)`` with change ∈ {'added', 'removed', 'changed'}.

    Replaces the reference's three separate passes (ES-ids set minus,
    DELETE..NOT IN, last_seen watermark) with one full-outer join; the
    'removed' set is exactly the reference's cleanup list and has no
    10k cap (fixes elasticsearch_integration.py:495-499).
    """
    prev = previous.alias("p")
    cur = current.alias("c")
    joined = prev.join(cur, F.col(f"p.{key}") == F.col(f"c.{key}"), "full_outer")
    changed = F.lit(False)
    for c in compare_cols or []:
        changed = changed | ~(
            F.col(f"p.{c}").eqNullSafe(F.col(f"c.{c}"))
        )
    status = (
        F.when(F.col(f"p.{key}").isNull(), F.lit("added"))
        .when(F.col(f"c.{key}").isNull(), F.lit("removed"))
        .when(changed, F.lit("changed"))
    )
    return (
        joined.select(
            F.coalesce(F.col(f"p.{key}"), F.col(f"c.{key}")).alias(key),
            status.alias("change"),
        )
        .filter(F.col("change").isNotNull())
    )
