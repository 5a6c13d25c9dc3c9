"""Scale-pattern demonstrations: algebraic incremental aggregate
maintenance and an iterative PageRank with drift-pinned rounds.

Two patterns every 100 TB deployment leans on, registered as oracle-
gated queries so they are verified, not asserted:

- ``incremental_agg_maintenance``: a daily-snapshot aggregate updated
  by MERGING a delta's partial aggregate into yesterday's result —
  count and sum are algebraic (mergeable partials), so the update
  touches |delta| + |groups| rows instead of rescanning the corpus.
  The oracle is the FULL recompute over base ∪ delta: the gate proves
  the merged result is indistinguishable from the rescan. This is the
  aggregate-side counterpart of the SnapshotStore's merge
  (sinks/snapshot.py) and the foreachBatch incremental pipeline
  (streaming/pipeline.py) — the reference's closest analog is its
  scan-over-scan freshness logic (scanner.py:414-463), which always
  rescans.
- ``pagerank_neardup_graph``: 8 fixed PageRank rounds over the
  undirected MinHash near-dup graph (damping 0.85). Iterative float
  algorithms diverge across engines via summation order, so each
  round's rank is rounded to 10 decimals (+1e-12 boundary shift) in
  BOTH engines — the same drift-pinning idea as stable_round, applied
  per iteration so error cannot compound. The Spark loop truncates
  lineage per round (lazy localCheckpoint — the connected_components
  hygiene, operators/dedup.py:236-312); the oracle unrolls the same
  rounds as chained CTEs.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..operators.dedup import minhash_lsh_pairs
from ..tables import ckpt_shared, load
from .llm_queries import _aug_corpus
from .registry import ORACLES, query, stable_round


@query(
    "incremental_agg_maintenance",
    oracle="""
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(sum(CASE WHEN event_id % 20 = 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_delta,
           round(sum(value) + 1e-7, 4) AS total_value
    FROM events GROUP BY event_type
    """,
)
def incremental_agg_maintenance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maintain a per-event-type (count, sum) aggregate INCREMENTALLY:
    yesterday's snapshot aggregate (event_id % 20 != 0) merged with
    the delta's partial aggregate (event_id % 20 == 0) via a full-outer
    join and coalesced partial merges — never rescanning the base.

    The oracle recomputes from scratch over the whole table; the hash
    gate therefore proves the algebraic identity agg(base ∪ delta) =
    merge(agg(base), agg(delta)) holds bit-stably after rounding. At
    100 TB this is the difference between touching a day's partition
    and touching three years of them; it works precisely because
    count/sum/min/max are mergeable partials (avg = sum/count at read
    time) — the same property Spark's own partial aggregation exploits
    map-side.
    """
    ev = load(spark, sf_dir, "events")
    base = ev.filter(F.col("event_id") % 20 != 0)
    delta = ev.filter(F.col("event_id") % 20 == 0)
    old = base.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n0"), F.sum("value").alias("s0")
    )
    inc = delta.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n1"), F.sum("value").alias("s1")
    )
    return old.join(inc, "event_type", "full_outer").select(
        "event_type",
        (F.coalesce("n0", F.lit(0)) + F.coalesce("n1", F.lit(0)))
        .cast("long")
        .alias("n_events"),
        F.coalesce("n1", F.lit(0)).cast("long").alias("n_delta"),
        stable_round(
            F.coalesce("s0", F.lit(0.0)) + F.coalesce("s1", F.lit(0.0)), 4
        ).alias("total_value"),
    )


_PR_DAMP = 0.85
_PR_ITERS = 8


def _pagerank_oracle() -> str:
    pairs = ORACLES["dedup_minhash_lsh"]
    ctes = [
        f"""
    WITH pairs AS (SELECT id_a, id_b FROM ({pairs})),
    sym AS (
        SELECT id_a AS u, id_b AS v FROM pairs
        UNION
        SELECT id_b AS u, id_a AS v FROM pairs
    ),
    deg AS (SELECT u, count(*) AS deg FROM sym GROUP BY u),
    nn AS (SELECT count(*)::DOUBLE AS n FROM deg),
    r0 AS (SELECT u AS node, round(1.0 / n + 1e-12, 10) AS rank FROM deg, nn)
    """
    ]
    for i in range(_PR_ITERS):
        ctes.append(
            f"""
    , r{i + 1} AS (
        SELECT s.v AS node,
               round((1.0 - {_PR_DAMP}) / max(nn.n)
                     + {_PR_DAMP} * sum(r{i}.rank / d.deg) + 1e-12, 10) AS rank
        FROM sym s JOIN r{i} ON s.u = r{i}.node JOIN deg d ON s.u = d.u, nn
        GROUP BY s.v
    )
    """
        )
    return (
        "".join(ctes)
        + f"""
    SELECT node, round(rank + 1e-7, 6) AS rank
    FROM r{_PR_ITERS} ORDER BY rank DESC, node LIMIT 10
    """
    )


@query("pagerank_neardup_graph", oracle=_pagerank_oracle())
def pagerank_neardup_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank (damping 0.85, 8 fixed rounds) over the undirected
    MinHash near-dup graph; returns the top-10 nodes — the "most
    duplicated" documents, the ones whose removal shrinks the corpus
    most. Every node has degree ≥ 1 by construction (no dangling-mass
    term needed).

    Engine-stability: each round's rank is rounded to 10 decimals
    (+1e-12 boundary shift) in both engines, so cross-engine summation
    -order differences (~1e-16 per round) are flattened before they
    can compound across iterations — without this, 8 rounds of float
    drift would make a hash-compare meaningless.

    Scale shape: one round = an equi-join of the rank vector with the
    symmetrized edge list + a groupBy-sum on the destination — the
    textbook distributed PageRank step, O(E) per round, nothing
    quadratic, per-round lazy localCheckpoint keeping round k's plan
    O(1) instead of O(k) (same hygiene as connected_components).
    """
    pairs = minhash_lsh_pairs(
        _aug_corpus(spark, sf_dir), "doc_id", "text",
        num_hashes=16, bands=4, shingle_n=3, threshold=0.5,
    ).transform(ckpt_shared)
    sym = (
        pairs.select(F.col("id_a").alias("u"), F.col("id_b").alias("v"))
        .union(pairs.select(F.col("id_b").alias("u"), F.col("id_a").alias("v")))
        .distinct()
        .transform(ckpt_shared)
    )
    deg = sym.groupBy("u").agg(F.count(F.lit(1)).alias("deg"))
    nn = deg.agg(F.count(F.lit(1)).cast("double").alias("n"))
    # n is loop-invariant: attach it to the degree table ONCE (1-row
    # broadcast join, plan-audit whitelisted scalar pattern) so the
    # iteration body contains only keyed joins.
    degn = deg.join(F.broadcast(nn)).transform(ckpt_shared)
    ranks = degn.select(
        F.col("u").alias("node"), F.round(1.0 / F.col("n") + 1e-12, 10).alias("rank")
    )
    for _ in range(_PR_ITERS):
        contrib = (
            sym.join(ranks, sym.u == ranks.node)
            .join(degn.select("u", "deg", "n"), "u")
            .select(
                F.col("v"),
                (F.col("rank") / F.col("deg")).alias("c"),
                F.col("n"),
            )
        )
        ranks = (
            contrib.groupBy("v")
            .agg(
                F.round(
                    (1.0 - _PR_DAMP) / F.max("n") + _PR_DAMP * F.sum("c") + 1e-12, 10
                ).alias("rank")
            )
            .select(F.col("v").alias("node"), "rank")
            .localCheckpoint(eager=False)
        )
    return (
        ranks.select("node", stable_round("rank", 6).alias("rank"))
        .orderBy(F.col("rank").desc(), F.col("node"))
        .limit(10)
    )


# --------------------------------------------------------------------------
# Incremental batch-vs-corpus dedup (persisted MinHash band index)
# --------------------------------------------------------------------------

def _dataset_fingerprint(sf_dir: str, *tables: str) -> str:
    """md5 over (relpath, size, mtime_ns) of the given tables' data
    files. Folded into the cached index stores' /tmp tags so
    regenerating a dataset at the same path changes the tag and can
    never silently reuse a stale seeded index (r7 advice)."""
    import hashlib
    import os

    hsh = hashlib.md5()
    for t in tables:
        root = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.isfile(root):
            st = os.stat(root)
            hsh.update(f"{t}|{st.st_size}|{st.st_mtime_ns}".encode())
            continue
        for r, _dirs, files in sorted(os.walk(root)):
            for fn in sorted(files):
                try:
                    st = os.stat(os.path.join(r, fn))
                except OSError:
                    continue
                rel = os.path.relpath(os.path.join(r, fn), root)
                hsh.update(f"{t}/{rel}|{st.st_size}|{st.st_mtime_ns}".encode())
    return hsh.hexdigest()[:12]


from contextlib import contextmanager


@contextmanager
def _store_lock(path: str):
    """Exclusive flock over the store dir for the whole
    seed+probe+merge+vacuum cycle: the index stores are single-writer
    by contract, and concurrent bench/gate processes sharing a /tmp
    tag would otherwise race the seed (r7 advice — seed() detects a
    racing writer only after its overwrite committed). The matches
    DataFrame returned to the caller stays readable after release:
    vacuum(keep=2) retains the version it reads."""
    import fcntl
    import os

    os.makedirs(path, exist_ok=True)
    f = open(os.path.join(path, ".lock"), "w")
    fcntl.flock(f, fcntl.LOCK_EX)
    try:
        yield
    finally:
        fcntl.flock(f, fcntl.LOCK_UN)
        f.close()

def _pin(df: DataFrame) -> DataFrame:
    """Materialize a store-backed result INSIDE the store lock (eager
    localCheckpoint): the returned plan reads executor blocks, not
    store files, so a CONCURRENT process's later vacuum on the shared
    /tmp store cannot delete parquet the caller hasn't collected yet —
    the flock serializes the seed/merge/vacuum cycle, but never the
    caller's collect (review r8: the lazy read outlived the lock)."""
    return df.transform(ckpt_shared)


def _incremental_dedup_oracle() -> str:
    """From-scratch recompute of what the band store answers
    incrementally: signatures over the full augmented corpus, bands,
    batch-side (planted ids >= 1e12) vs corpus-side candidates sharing
    a band, signature-agreement Jaccard estimate. Reuses the EXACT SQL
    fragments of the dedup_minhash_lsh oracle so the stored index and
    the recompute are definitionally the same hashing chain."""
    from ..functions.text import MINHASH_P
    from .llm_queries import _CORPUS_SQL, _MINHASH_SIG_ITEMS, _SHINGLES_SQL

    return (
        _CORPUS_SQL
        + _SHINGLES_SQL
        + f"""
    , hbase AS (
        SELECT sid,
               list_transform(shingles,
                   s -> ('0x' || substr(md5(s), 1, 8))::BIGINT % {MINHASH_P}) AS hb
        FROM sh
    ),
    sig AS (
        SELECT sid, [{_MINHASH_SIG_ITEMS}] AS sg
        FROM hbase
    ),"""
        + """
    bands AS (
        SELECT sid, b, md5(array_to_string(sg[(4*b+1):(4*b+4)], '|')) AS h
        FROM sig, (SELECT unnest(range(0, 4)) AS b)
    ),
    cand AS (
        SELECT DISTINCT q.sid AS batch_id, c.sid AS corpus_id
        FROM bands q JOIN bands c ON q.b = c.b AND q.h = c.h
        WHERE q.sid >= 1000000000000 AND c.sid < 1000000000000
    )
    SELECT batch_id, corpus_id, est_jaccard FROM (
        SELECT batch_id, corpus_id,
               round(len(list_filter(range(1, 17), i -> x.sg[i] = y.sg[i]))::DOUBLE
                     / 16 + 1e-7, 3) AS est_jaccard
        FROM cand
        JOIN sig x ON x.sid = cand.batch_id
        JOIN sig y ON y.sid = cand.corpus_id
    ) WHERE est_jaccard >= 0.5
    """
    )


@query("dedup_incremental_batch", oracle=_incremental_dedup_oracle())
def dedup_incremental_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental batch-vs-corpus dedup — the O(delta) path a 100 TB
    deployment actually runs nightly (r6 verdict's top engine gap; the
    reference's signature property is incremental upsert,
    scanner.py:225-244).

    The corpus's MinHash band index is persisted ONCE in a
    SnapshotStore bucketed by band hash (here seeded in-query so the
    gate is self-contained; in production seed() runs once and only
    match_and_merge() recurs). The delta batch — the planted
    copies/truncations (ids >= 1e12) of the shared augmented corpus —
    is shingled, signed, banded (O(batch)), probed against the PRUNED
    bucket slice of the stored index, scored by signature agreement,
    and merged in (bucket-pruned upsert). The oracle recomputes the
    same matches from scratch over the full corpus, proving the
    incremental answer equals the full recompute.

    The seeded store is CACHED per (sf_dir, band config) under one
    deterministic /tmp path: the first invocation pays the one-time
    O(corpus) seed, every later one (bench's cold+steady loops, plan
    audit, repeated gates) exercises — and therefore times — only the
    O(delta) probe+merge cycle, and /tmp stops accumulating orphaned
    index copies (r7 review finding). Correctness is invariant to
    reuse: the batch merges at batch_seq=1 and matching is restricted
    to strictly earlier batches, so a prior run's merged batch rows
    (seq 1) are invisible to the next run's seq-1 match — byte-
    identical to a fresh store."""
    return _incremental_batch_matches(spark, sf_dir, layout="hardlink")


@query("dedup_incremental_batch_manifest", oracle=_incremental_dedup_oracle())
def dedup_incremental_batch_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SAME incremental cycle on the OBJECT-STORE snapshot layout
    (``layout="manifest"``: data files written once, versions commit
    by swapping a tiny manifest — no links/renames, S3/GCS-safe).
    Layout must be a pure storage decision, so this query shares
    dedup_incremental_batch's oracle verbatim: seed, pruned probe
    (manifest's bucket->files map pruned before the reader runs), and
    merge all hash-match the from-scratch recompute — the driver-gate
    upgrade of the pytest byte-parity check (r6 verdict #7)."""
    return _incremental_batch_matches(spark, sf_dir, layout="manifest")


@query("dedup_incremental_rebucket", oracle=_incremental_dedup_oracle())
def dedup_incremental_rebucket(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partition-layout EVOLUTION under the incremental dedup cycle:
    the band index is seeded at 8 physical buckets, grown to 32 via
    ``SnapshotStore.rebucket`` (one O(table) rewrite committed as a
    normal version whose _STORECFG sidecar records the new count),
    and THEN the O(delta) probe runs — against the post-evolution
    layout. Shares dedup_incremental_batch's oracle verbatim: the
    bucket count is a physical knob, so growing it mid-life must be
    invisible in the answers while every subsequent probe/merge
    prunes under the new, finer layout.

    Why this is a first-class scale operator: a store bucketed for
    today's corpus under-partitions next year's — at 100 TB with 32
    buckets every touched bucket is a ~3 TB rewrite per nightly
    merge. Growing the count (here 8 -> 32; production 32 -> 4096)
    shrinks the merge's rewrite unit without re-seeding, and because
    the count rides in the version's own config sidecar, crash
    recovery, rollback, and reopening with a stale constructor value
    all resolve the layout the live data was actually written under
    (`sinks/snapshot.py` rebucket/_commit_cfg). Idempotent across
    bench/gate reruns: once grown, rebucket(32) is a no-op."""
    import hashlib
    import os

    from ..operators.incremental_dedup import MinHashBandStore
    from .llm_queries import _aug_corpus

    aug = _aug_corpus(spark, sf_dir)
    corpus = aug.filter(F.col("doc_id") < 1_000_000_000_000)
    batch = aug.filter(F.col("doc_id") >= 1_000_000_000_000)
    fp = _dataset_fingerprint(sf_dir, "documents")
    tag = hashlib.md5(
        f"{os.path.abspath(sf_dir)}|{fp}|nh16|b4|sh3|nb8rb32|hardlink|v1".encode()
    ).hexdigest()[:12]
    path = f"/tmp/spark-graft-bandstore-{tag}"
    with _store_lock(path):
        store = MinHashBandStore(spark, path, num_buckets=8, layout="hardlink")
        if store.store.current_version() is None:
            store.seed(corpus, "doc_id", "text")
        store.store.rebucket(32)
        matches = _pin(
            store.match_and_merge(
                batch, "doc_id", "text", batch_seq=1, threshold=0.5
            )
        )
        store.store.vacuum(keep=2)
    return matches


_LOOKUP_KEYS = [1, 2, 3, 4, 5, 6, 7, 32, 33, 34, 10**9]  # last one misses


@query(
    "store_point_lookup",
    oracle=f"""
    SELECT o_orderkey, o_custkey, o_orderstatus, o_orderpriority
    FROM orders WHERE o_orderkey IN ({", ".join(map(str, _LOOKUP_KEYS))})
    """,
)
def store_point_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Operational point lookup through the snapshot store: seed a
    manifest-layout store from ``orders`` (key-clustered bucket files),
    then ``read_keys`` a fixed key list. The oracle filters the raw
    table directly, so the gate proves the whole physical path —
    bucketed clustered write → manifest commit → driver-side key→bucket
    hash → pruned file list → pushed IN-filter — is value-invisible.

    At 100 TB this is the "show me these rows" path: O(keys) buckets
    opened instead of a table scan, the IN predicate pushed into the
    parquet scan, and row-group min/max skipping inside each file via
    the writers' sortWithinPartitions clustering (sinks/snapshot.py
    read_keys/_write_data_files). The reference serves this with a
    B-tree primary key (db_duckdb schema); buckets + clustering are
    the shared-nothing equivalent."""
    import hashlib
    import os

    from ..sinks.snapshot import SnapshotStore

    fp = _dataset_fingerprint(sf_dir, "orders")
    tag = hashlib.md5(
        f"{os.path.abspath(sf_dir)}|{fp}|orders|nb32|manifest|v1".encode()
    ).hexdigest()[:12]
    path = f"/tmp/spark-graft-orderstore-{tag}"
    cols = ["o_orderkey", "o_custkey", "o_orderstatus", "o_orderpriority"]
    with _store_lock(path):
        store = SnapshotStore(
            spark,
            path,
            key="o_orderkey",
            version_col="o_custkey",  # unused: seed-only store, no merges
            num_buckets=32,
            layout="manifest",
        )
        if store.current_version() is None:
            store.overwrite(load(spark, sf_dir, "orders").select(*cols))
        return store.read_keys(_LOOKUP_KEYS).select(*cols)


# --------------------------------------------------------------------------
# Change data feed through the snapshot store
# --------------------------------------------------------------------------

_CDF_ORACLE = """
    WITH base AS (
        SELECT o_orderkey, 1 AS v, o_orderstatus,
               round(o_totalprice + 1e-7, 2) AS price
        FROM orders WHERE o_orderkey % 10 <> 3
    ),
    delta AS (
        SELECT o_orderkey, 2 AS v, o_orderstatus,
               round(o_totalprice + 1000 + 1e-7, 2) AS price
        FROM orders WHERE o_orderkey % 10 IN (3, 7)
    )
    SELECT o_orderkey, v, o_orderstatus, price, 'insert' AS change
    FROM delta WHERE o_orderkey % 10 = 3
    UNION ALL
    SELECT o_orderkey, v, o_orderstatus, price, 'update' AS change
    FROM delta WHERE o_orderkey % 10 = 7
    UNION ALL
    SELECT o_orderkey, v, o_orderstatus, price, 'delete' AS change
    FROM base WHERE o_orderkey % 10 = 5
"""


def _cdf_demo_frames(spark: SparkSession, sf_dir: str, dim_col: str):
    """The ONE definition of the CDF demo window (shared by every
    CDF-family builder so the oracles can't diverge from one copy):
    base = ``orders`` minus the %10==3 keys at v=1; delta = updates
    (%10==7) + inserts (%10==3) with the price bumped, v=2; removals =
    %10==5. ``dim_col`` is the carried dimension column
    (o_orderstatus for the flat views, o_custkey for the joined one)."""
    orders = load(spark, sf_dir, "orders")
    base = orders.filter(F.col("o_orderkey") % 10 != 3).select(
        "o_orderkey",
        F.lit(1).alias("v"),
        dim_col,
        stable_round(F.col("o_totalprice"), 2).alias("price"),
    )
    delta = orders.filter((F.col("o_orderkey") % 10).isin(3, 7)).select(
        "o_orderkey",
        F.lit(2).alias("v"),
        dim_col,
        stable_round(F.col("o_totalprice") + 1000, 2).alias("price"),
    )
    removed = orders.filter(F.col("o_orderkey") % 10 == 5).select("o_orderkey")
    return base, delta, removed


def _cdf_store(
    spark: SparkSession,
    sf_dir: str,
    *,
    layout: str,
    dim_col: str = "o_orderstatus",
    tag_body: str = "orders-cdf|nb16",
    path_prefix: str = "cdfstore",
    rebucket_to: int | None = None,
):
    """Seed-and-merge the change-feed demo store (frames per
    ``_cdf_demo_frames``), optionally committing a pure REBUCKET
    between the seed and the merge (``rebucket_to``), so the merge
    lands at v3 instead of v2. The store persists across runs
    (fingerprint-tagged path, flock around the cycle); replays skip
    straight to the reads — the retained versions are immutable state
    shared by every CDF-family gate query."""
    import hashlib
    import os

    from ..sinks.snapshot import SnapshotStore

    fp = _dataset_fingerprint(sf_dir, "orders")
    tag = hashlib.md5(
        f"{os.path.abspath(sf_dir)}|{fp}|{tag_body}|{layout}|v1".encode()
    ).hexdigest()[:12]
    path = f"/tmp/spark-graft-{path_prefix}-{tag}"
    base, delta, removed = _cdf_demo_frames(spark, sf_dir, dim_col)
    with _store_lock(path):
        store = SnapshotStore(
            spark,
            path,
            key="o_orderkey",
            version_col="v",
            num_buckets=16,
            layout=layout,
        )
        if store.current_version() is None:
            store.overwrite(base)
        merge_base = 1
        if rebucket_to is not None:
            if store.current_version() == 1:
                v = store.rebucket(rebucket_to)  # plain: survives -O
                if v != 2:
                    raise RuntimeError(f"rebucket committed v{v}, expected v2")
            merge_base = 2
        if store.current_version() == merge_base:
            store.merge(delta, removed=removed)
    return store


def _cdf_changes(spark: SparkSession, sf_dir: str, *, layout: str) -> DataFrame:
    store = _cdf_store(spark, sf_dir, layout=layout)
    return store.read_changes(1, 2).withColumnRenamed("_change", "change")


@query("store_read_changes", oracle=_CDF_ORACLE)
def store_read_changes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Change data feed through the snapshot store (manifest layout):
    what tonight's merge actually DID — one row per key whose state
    differs between version 1 and version 2, labeled insert / update /
    delete (post-image for insert/update, pre-image for delete). The
    oracle recomputes the expected diff from the raw table, so the
    gate proves the whole path — bucket-pruned merge, commit-metadata
    changed-bucket resolution (sinks/snapshot.py changed_buckets), the
    two pruned version slices, null-safe row classification — emits
    exactly the true delta, no phantoms.

    At 100 TB this is how a DOWNSTREAM incremental consumer (the
    nightly curation cycle, an index refresh, an ES sync) gets its
    input: O(changed buckets) read from commit metadata instead of
    diffing two full snapshots. Reference parity: the scanner's
    new/modified/removed detection between consecutive scans
    (scanner.py:414-463), served from the store's own commit metadata
    instead of a rescan."""
    return _cdf_changes(spark, sf_dir, layout="manifest")


@query("store_read_changes_hardlink", oracle=_CDF_ORACLE)
def store_read_changes_hardlink(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The same change feed on the hardlink layout, where changed
    buckets are resolved from per-bucket FILE NAMES (an untouched
    bucket is hard-linked forward under the same names; a rewrite
    mints fresh task-UUID part names) — both layouts must serve the
    identical feed (same oracle, same hash)."""
    return _cdf_changes(spark, sf_dir, layout="hardlink")


@query("store_read_changes_rebucket", oracle=_CDF_ORACLE)
def store_read_changes_rebucket(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The change feed across a BUCKET-COUNT EVOLUTION: v1 = base at
    16 buckets, v2 = rebucket to 32 (a pure layout rewrite, tagged
    rebucket_from in its commit cfg), v3 = the nightly merge. The same
    oracle as store_read_changes proves the feed window (1 -> 3)
    contributes ZERO rows for the rebucket transition and stays exact
    through the count change — while the version-path walk
    (sinks/snapshot.py _changed_bucket_groups) keeps the reads pruned
    to the merge's touched buckets projected onto each endpoint's own
    layout, instead of r8's honest-but-O(table) full two-version diff.
    At 100 TB a quarterly bucket evolution would otherwise turn every
    spanning feed consumer into a double full-table scan."""
    store = _cdf_store(
        spark,
        sf_dir,
        layout="manifest",
        tag_body="orders-cdf-rb|nb16-32",
        path_prefix="cdfrbstore",
        rebucket_to=32,
    )
    return store.read_changes(1, 3).withColumnRenamed("_change", "change")


# Sums run on integer CENTS (round(price*100) as BIGINT) in BOTH
# engines: the maintained identity agg(v1) + signed(feed) sums a
# DIFFERENT operand set than the oracle's direct rescan, and float
# cancellation error grows with group size — at a large SF the drift
# would straddle a half-cent boundary and flake the hash gate.
# Integer sums are exact at any scale; the single final /100.0 is the
# same operation on the same long in both engines.
_VIEW_ORACLE = """
    WITH base AS (
        SELECT o_orderkey, o_orderstatus,
               round(o_totalprice + 1e-7, 2) AS price
        FROM orders WHERE o_orderkey % 10 <> 3
    ),
    delta AS (
        SELECT o_orderkey, o_orderstatus,
               round(o_totalprice + 1000 + 1e-7, 2) AS price
        FROM orders WHERE o_orderkey % 10 IN (3, 7)
    ),
    v2 AS (
        SELECT * FROM base WHERE o_orderkey % 10 NOT IN (5, 7)
        UNION ALL
        SELECT * FROM delta
    )
    SELECT o_orderstatus,
           CAST(count(*) AS BIGINT) AS n_orders,
           round(sum(CAST(round(price * 100) AS BIGINT)) / 100.0 + 1e-7, 2)
               AS total_price
    FROM v2 GROUP BY o_orderstatus
"""


@query("incremental_view_maintenance", oracle=_VIEW_ORACLE)
def incremental_view_maintenance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Materialized-view maintenance from the change feed: yesterday's
    per-status (count, sum) aggregate is updated by ADDING the feed's
    insert/update_postimage rows and SUBTRACTING its delete/
    update_preimage rows (``read_changes(update_images="both")``) —
    the base is never rescanned. The oracle aggregates the post-merge
    state from scratch, so the hash gate proves the algebraic identity
    agg(v2) = agg(v1) + signed(feed) holds bit-stably after rounding.

    This is the CDC-driven view-maintenance pattern (Delta CDF /
    Materialize shape): at 100 TB the nightly dashboard aggregate
    costs O(feed) + O(groups), not an O(table) rescan — the feed
    itself already costs only O(changed buckets) from commit metadata.
    Composes incremental_agg_maintenance (mergeable partials) with the
    store's CDF: together they close the loop the reference's
    scan-over-scan freshness logic (scanner.py:414-463) rescans for."""
    store = _cdf_store(spark, sf_dir, layout="manifest")
    cents = F.round(F.col("price") * 100).cast("long")
    old_agg = (
        store.read(version=1)
        .groupBy("o_orderstatus")
        .agg(F.count(F.lit(1)).alias("n0"), F.sum(cents).alias("s0"))
    )
    feed = store.read_changes(1, 2, update_images="both")
    sign = F.when(
        F.col("_change").isin("insert", "update_postimage"), F.lit(1)
    ).otherwise(F.lit(-1))
    inc = feed.groupBy("o_orderstatus").agg(
        F.sum(sign).alias("n1"),
        F.sum(sign * cents).alias("s1"),
    )
    return (
        old_agg.join(inc, "o_orderstatus", "full_outer")
        .select(
            "o_orderstatus",
            (F.coalesce("n0", F.lit(0)) + F.coalesce("n1", F.lit(0)))
            .cast("long")
            .alias("n_orders"),
            stable_round(
                (F.coalesce("s0", F.lit(0)) + F.coalesce("s1", F.lit(0)))
                / 100.0,
                2,
            ).alias("total_price"),
        )
        .filter(F.col("n_orders") > 0)
    )


_VIEW_MINMAX_ORACLE = """
    WITH base AS (
        SELECT o_orderkey, o_orderstatus,
               round(o_totalprice + 1e-7, 2) AS price
        FROM orders WHERE o_orderkey % 10 <> 3
    ),
    delta AS (
        SELECT o_orderkey, o_orderstatus,
               round(o_totalprice + 1000 + 1e-7, 2) AS price
        FROM orders WHERE o_orderkey % 10 IN (3, 7)
    ),
    v2 AS (
        SELECT * FROM base WHERE o_orderkey % 10 NOT IN (5, 7)
        UNION ALL
        SELECT * FROM delta
    )
    SELECT o_orderstatus,
           CAST(count(*) AS BIGINT) AS n_orders,
           round(min(price) + 1e-7, 2) AS min_price,
           round(max(price) + 1e-7, 2) AS max_price
    FROM v2 GROUP BY o_orderstatus
"""


@query("incremental_view_minmax", oracle=_VIEW_MINMAX_ORACLE)
def incremental_view_minmax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MIN/MAX view maintenance from the change feed — the
    NON-distributive extension of incremental_view_maintenance: inserts
    improve the extremum algebraically, but a delete that ties-or-beats
    a group's stored extremum forces a recompute OF THAT GROUP ONLY
    (operators/ivm.maintain_min_max), read from the post-state with a
    pushed-down group predicate. The oracle recomputes every group from
    scratch, so the hash gate proves both paths — pure-delta groups and
    extremum-departure recomputes — land on the exact final view. The
    demo window deletes every %10==5 key, so statuses whose cheapest/
    priciest order sits in that residue exercise the recompute branch
    on real data. At 100 TB: O(feed) on cycles where no extremum
    departs; an extremum departure pays one pushed-predicate scan
    restricted to the affected groups (see operators/ivm.py's cost
    note) — still never on the common path."""
    from ..operators.ivm import maintain_min_max

    store = _cdf_store(spark, sf_dir, layout="manifest")
    view = maintain_min_max(store, 1, 2, ["o_orderstatus"], "price")
    return view.select(
        "o_orderstatus",
        F.col("n").alias("n_orders"),
        stable_round(F.col("min_v"), 2).alias("min_price"),
        stable_round(F.col("max_v"), 2).alias("max_price"),
    )


@query("incremental_view_minmax_chained", oracle=_VIEW_MINMAX_ORACLE)
def incremental_view_minmax_chained(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The STEADY-STATE maintenance path, chained across a bucket
    evolution: cycle 1 maintains the view over the pure-rebucket
    window (1 -> 2: zero feed rows, view carried), cycle 2 feeds that
    output back in as ``old_view=`` and maintains over the merge
    window (2 -> 3) — so the base is never rescanned after the first
    derivation, exactly how a nightly job runs. The final state equals
    the flat store's v2, so the SAME oracle as incremental_view_minmax
    must hash-match — proving view-chaining and the evolved layout's
    feed compose without drift."""
    from ..operators.ivm import maintain_min_max

    store = _cdf_store(
        spark,
        sf_dir,
        layout="manifest",
        tag_body="orders-cdf-rb|nb16-32",
        path_prefix="cdfrbstore",
        rebucket_to=32,
    )
    # No extra checkpoint: maintain_min_max lazily checkpoints its own
    # internal join, and cycle1 is consumed once inside cycle2's.
    cycle1 = maintain_min_max(store, 1, 2, ["o_orderstatus"], "price")
    view = maintain_min_max(
        store, 2, 3, ["o_orderstatus"], "price", old_view=cycle1
    )
    return view.select(
        "o_orderstatus",
        F.col("n").alias("n_orders"),
        stable_round(F.col("min_v"), 2).alias("min_price"),
        stable_round(F.col("max_v"), 2).alias("max_price"),
    )


_VIEW_MINMAX_HICARD_ORACLE = """
    WITH base AS (
        SELECT o_orderkey, o_custkey,
               round(o_totalprice + 1e-7, 2) AS price
        FROM orders WHERE o_orderkey % 10 <> 3
    ),
    delta AS (
        SELECT o_orderkey, o_custkey,
               round(o_totalprice + 1000 + 1e-7, 2) AS price
        FROM orders WHERE o_orderkey % 10 IN (3, 7)
    ),
    v2 AS (
        SELECT * FROM base WHERE o_orderkey % 10 NOT IN (5, 7)
        UNION ALL
        SELECT * FROM delta
    )
    SELECT o_custkey,
           CAST(count(*) AS BIGINT) AS n_orders,
           round(min(price) + 1e-7, 2) AS min_price,
           round(max(price) + 1e-7, 2) AS max_price
    FROM v2 GROUP BY o_custkey
"""


@query("incremental_view_minmax_hicard", oracle=_VIEW_MINMAX_HICARD_ORACLE)
def incremental_view_minmax_hicard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MIN/MAX view maintenance under the MASS-DELETE regime: the view
    is keyed on o_custkey (every customer is a group, ~1 group per 10
    rows), and the demo window deletes 10% of orders and re-prices
    another 20% — so a large fraction of ALL groups lose their stored
    extremum in one cycle. This is exactly the shape where a
    driver-collected affected-key list would melt (millions of groups
    at 100 TB): maintain_min_max keeps the affected set as a DataFrame
    and left-semi-joins it against the post-state base (AQE picks
    broadcast for small sets, shuffle for huge ones), so the cycle's
    cost is O(feed) + one semi-join-filtered scan, with nothing
    group-proportional on the driver. Reuses the joined-view
    demo store (o_custkey dim); the oracle recomputes every group from
    scratch. Registered as a SCALE_STRESS probe (amplified orders
    grow rows per group k-fold while the group count stays fixed —
    alpha ~ 1 proves the recompute stays row-linear)."""
    from ..operators.ivm import maintain_min_max

    store = _cdf_store(
        spark,
        sf_dir,
        layout="manifest",
        dim_col="o_custkey",
        tag_body="orders-cdf-join|nb16",
        path_prefix="cdfjoinstore",
    )
    view = maintain_min_max(store, 1, 2, ["o_custkey"], "price")
    return view.select(
        "o_custkey",
        F.col("n").alias("n_orders"),
        stable_round(F.col("min_v"), 2).alias("min_price"),
        stable_round(F.col("max_v"), 2).alias("max_price"),
    )


_VIEW_JOIN_ORACLE = """
    WITH base AS (
        SELECT o_orderkey, 1 AS v, o_custkey,
               round(o_totalprice + 1e-7, 2) AS price
        FROM orders WHERE o_orderkey % 10 <> 3
    ),
    delta AS (
        SELECT o_orderkey, 2 AS v, o_custkey,
               round(o_totalprice + 1000 + 1e-7, 2) AS price
        FROM orders WHERE o_orderkey % 10 IN (3, 7)
    ),
    v2 AS (
        SELECT * FROM base WHERE o_orderkey % 10 NOT IN (5, 7)
        UNION ALL
        SELECT * FROM delta
    )
    SELECT c_nationkey,
           CAST(count(*) AS BIGINT) AS n_orders,
           round(sum(CAST(round(price * 100) AS BIGINT)) / 100.0 + 1e-7, 2)
               AS total_price
    FROM v2 JOIN customer ON o_custkey = c_custkey
    GROUP BY c_nationkey
"""


@query("incremental_view_joined", oracle=_VIEW_JOIN_ORACLE)
def incremental_view_joined(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JOINED-view maintenance from the fact feed alone: the view is
    fact ⋈ dim aggregated (orders joined to customer, per-nation count
    + revenue), and the dim side is static across the window — so the
    delta is just the feed rows JOINED TO THE DIM with the same signed
    algebra as the flat view (pre-images subtract, post-images add).
    The oracle rejoins and reaggregates the post-state from scratch.
    At 100 TB the nightly cost is O(feed ⋈ dim) + O(groups): the fact
    table — the big side — is never rescanned; only changed fact rows
    visit the join."""
    store = _cdf_store(
        spark,
        sf_dir,
        layout="manifest",
        dim_col="o_custkey",
        tag_body="orders-cdf-join|nb16",
        path_prefix="cdfjoinstore",
    )
    dim = load(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    cents = F.round(F.col("price") * 100).cast("long")
    old_agg = (
        store.read(version=1)
        .join(dim, F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("c_nationkey")
        .agg(F.count(F.lit(1)).alias("n0"), F.sum(cents).alias("s0"))
    )
    feed = store.read_changes(1, 2, update_images="both").join(
        dim, F.col("o_custkey") == F.col("c_custkey")
    )
    sign = F.when(
        F.col("_change").isin("insert", "update_postimage"), F.lit(1)
    ).otherwise(F.lit(-1))
    inc = feed.groupBy("c_nationkey").agg(
        F.sum(sign).alias("n1"), F.sum(sign * cents).alias("s1")
    )
    return (
        old_agg.join(inc, "c_nationkey", "full_outer")
        .select(
            "c_nationkey",
            (F.coalesce("n0", F.lit(0)) + F.coalesce("n1", F.lit(0)))
            .cast("long")
            .alias("n_orders"),
            stable_round(
                (F.coalesce("s0", F.lit(0)) + F.coalesce("s1", F.lit(0)))
                / 100.0,
                2,
            ).alias("total_price"),
        )
        .filter(F.col("n_orders") > 0)
    )


def _demo_store(
    spark: SparkSession,
    sf_dir: str,
    *,
    name: str,
    key: str,
    num_buckets: int,
    frames,
    fp_tables: tuple[str, ...],
):
    """Shared scaffold for the CDC demo stores: fingerprint-tagged
    /tmp path, flock around the build, idempotent seed-and-step-merge
    replay (``frames`` = [("seed", df, None), (1, delta, removed),
    ...] — step N merges only when the store sits at version N, so
    reruns skip straight to the reads). ONE definition so the tag
    scheme and replay guard cannot drift between store builders."""
    import hashlib
    import os

    from ..sinks.snapshot import SnapshotStore

    fp = _dataset_fingerprint(sf_dir, *fp_tables)
    tag = hashlib.md5(
        f"{os.path.abspath(sf_dir)}|{fp}|{name}|nb{num_buckets}|manifest|v1".encode()
    ).hexdigest()[:12]
    path = f"/tmp/spark-graft-{name}-{tag}"
    with _store_lock(path):
        store = SnapshotStore(
            spark, path, key=key, version_col="v",
            num_buckets=num_buckets, layout="manifest",
        )
        for step, frame, removed in frames:
            if step == "seed":
                if store.current_version() is None:
                    store.overwrite(frame)
            elif store.current_version() == step:
                store.merge(frame, removed=removed)
    return store


def _dim_cdf_store(spark: SparkSession, sf_dir: str):
    """Seed-and-merge the DIM-side CDC demo store: v1 = customer
    minus the %13==2 keys; v2 inserts them back, re-nations the
    %13==4 keys (c_nationkey -> (c_nationkey+7) % 25) and deletes the
    %13==6 keys — one window exercising dim insert, dim update and
    dim delete against live fact contributions. Same persistence
    contract as _cdf_store (_demo_store: fingerprint-tagged path,
    flock, replays skip to the reads)."""
    cust = load(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    m = F.col("c_custkey") % 13
    base = cust.filter(m != 2).select(
        "c_custkey", F.lit(1).alias("v"), "c_nationkey"
    )
    delta = cust.filter(m.isin(2, 4)).select(
        "c_custkey",
        F.lit(2).alias("v"),
        F.when(m == 4, (F.col("c_nationkey") + 7) % 25)
        .otherwise(F.col("c_nationkey"))
        .alias("c_nationkey"),
    )
    removed = cust.filter(m == 6).select("c_custkey")
    return _demo_store(
        spark, sf_dir, name="dimcdfstore",
        key="c_custkey", num_buckets=8,
        frames=[("seed", base, None), (1, delta, removed)],
        fp_tables=("customer",),
    )


_VIEW_JOIN_DIMCHANGE_ORACLE = """
    WITH fbase AS (
        SELECT o_orderkey, o_custkey,
               round(o_totalprice + 1e-7, 2) AS price
        FROM orders WHERE o_orderkey % 10 <> 3
    ),
    fdelta AS (
        SELECT o_orderkey, o_custkey,
               round(o_totalprice + 1000 + 1e-7, 2) AS price
        FROM orders WHERE o_orderkey % 10 IN (3, 7)
    ),
    f2 AS (
        SELECT * FROM fbase WHERE o_orderkey % 10 NOT IN (5, 7)
        UNION ALL
        SELECT * FROM fdelta
    ),
    d2 AS (
        SELECT c_custkey,
               CASE WHEN c_custkey % 13 = 4
                    THEN (c_nationkey + 7) % 25
                    ELSE c_nationkey END AS c_nationkey
        FROM customer WHERE c_custkey % 13 <> 6
    )
    SELECT c_nationkey,
           CAST(count(*) AS BIGINT) AS n_orders,
           round(sum(CAST(round(price * 100) AS BIGINT)) / 100.0 + 1e-7, 2)
               AS total_price
    FROM f2 JOIN d2 ON o_custkey = c_custkey
    GROUP BY c_nationkey
"""


@query(
    "incremental_view_joined_dimchange", oracle=_VIEW_JOIN_DIMCHANGE_ORACLE
)
def incremental_view_joined_dimchange(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """JOINED-view maintenance where BOTH sides change in the window —
    the r9 verdict's named gap: incremental_view_joined assumes a
    static dim, but a re-nationed customer must re-sign every one of
    its fact contributions. Exact two-term delta decomposition

        V2 - V1 = ΔF ⋈ D1  +  F2 ⋈ ΔD

    (first change the facts under yesterday's dim, then move whole
    per-key fact aggregates between groups as the dim rows move):

    - term 1: the FACT feed joined to the pre-state dim — identical
      signed algebra to incremental_view_joined; the dim side is
      broadcast-sized.
    - term 2: the DIM feed (pre-images subtract a customer's entire
      post-state aggregate from its old nation, post-images add it to
      the new one) joined to per-customer fact aggregates computed
      from F2 RESTRICTED by a semi-join to only the dim-changed keys
      (strategy left to AQE: small sets broadcast, a dim-wide change
      shuffles) — the fact table contributes O(rows of changed
      customers), never a full rescan, and nothing is collected to
      the driver.

    The oracle rejoins and reaggregates the post-state from scratch,
    so the hash gate proves the two-term algebra lands on exactly
    F2 ⋈ D2 through dim inserts (a key with live facts appearing),
    dim updates (group migration) and dim deletes (contribution
    withdrawal). At 100 TB the cycle costs O(fact feed ⋈ dim) +
    O(facts of dim-changed keys) + O(groups) — the enrichment-
    staleness shape the r9 CDC republish solved for links, closed on
    the view side."""
    from ..operators.ivm import maintain_joined_agg

    fact = _cdf_store(
        spark,
        sf_dir,
        layout="manifest",
        dim_col="o_custkey",
        tag_body="orders-cdf-join|nb16",
        path_prefix="cdfjoinstore",
    )
    dim = _dim_cdf_store(spark, sf_dir)
    view = maintain_joined_agg(
        fact,
        dim,
        1,
        2,
        fact_key_col="o_custkey",
        dim_key_col="c_custkey",
        group_col="c_nationkey",
    )
    return view.select(
        "c_nationkey",
        F.col("n").alias("n_orders"),
        stable_round(F.col("s") / 100.0, 2).alias("total_price"),
    )


class _CentsView:
    """Thin read adapter giving ``maintain_min_max`` an exact integer
    measure over a store that persists 2-decimal prices: ``read`` /
    ``read_changes`` pass through with a derived ``cents`` column
    (round(price*100) as long). Incremental float sums drift from a
    from-scratch sum by accumulation order (non-associative doubles),
    which would flake the hash gate near rounding boundaries; integer
    cents make the distributive ``s`` algebra exact — the same
    money-through-cents rule every oracle twin uses."""

    def __init__(self, store):
        self._store = store

    def _with_cents(self, df):
        return df.withColumn(
            "cents", F.round(F.col("price") * 100).cast("long")
        )

    def read(self, version=None):
        return self._with_cents(self._store.read(version=version))

    def read_changes(self, v_from, v_to, update_images="both"):
        return self._with_cents(
            self._store.read_changes(v_from, v_to, update_images=update_images)
        )


_VIEW_SUMMINMAX_ORACLE = """
    WITH base AS (
        SELECT o_orderkey, o_orderstatus,
               round(o_totalprice + 1e-7, 2) AS price
        FROM orders WHERE o_orderkey % 10 <> 3
    ),
    delta AS (
        SELECT o_orderkey, o_orderstatus,
               round(o_totalprice + 1000 + 1e-7, 2) AS price
        FROM orders WHERE o_orderkey % 10 IN (3, 7)
    ),
    v2 AS (
        SELECT * FROM base WHERE o_orderkey % 10 NOT IN (5, 7)
        UNION ALL
        SELECT * FROM delta
    )
    SELECT o_orderstatus,
           CAST(count(*) AS BIGINT) AS n_orders,
           round(min(CAST(round(price * 100) AS BIGINT)) / 100.0 + 1e-7, 2)
               AS min_price,
           round(max(CAST(round(price * 100) AS BIGINT)) / 100.0 + 1e-7, 2)
               AS max_price,
           round(sum(CAST(round(price * 100) AS BIGINT)) / 100.0 + 1e-7, 2)
               AS total_price
    FROM v2 GROUP BY o_orderstatus
"""


@query("incremental_view_summinmax", oracle=_VIEW_SUMMINMAX_ORACLE)
def incremental_view_summinmax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The COMBINED view shape the streaming pipeline maintains
    (streaming/pipeline.streaming_maintained_view_pipeline): count +
    distributive SUM + semi-incremental MIN/MAX per group in ONE
    maintenance pass — ``maintain_min_max(with_sum=True)``, the r11
    extension. Sum rides the same signed delta algebra as
    incremental_view_maintenance (adds add, removals subtract) while
    min/max keep their kept/recompute split; measures flow through
    integer cents (``_CentsView``) so the incremental sum is
    bit-exact against the oracle's from-scratch recompute — float
    accumulation order can never flake the gate. Same demo window as
    incremental_view_minmax (mass %10==5 deletes exercise the
    extremum-departure recompute alongside the sum algebra)."""
    from ..operators.ivm import maintain_min_max

    store = _cdf_store(spark, sf_dir, layout="manifest")
    view = maintain_min_max(
        _CentsView(store), 1, 2, ["o_orderstatus"], "cents", with_sum=True
    )
    return view.select(
        "o_orderstatus",
        F.col("n").alias("n_orders"),
        stable_round(F.col("min_v") / 100.0, 2).alias("min_price"),
        stable_round(F.col("max_v") / 100.0, 2).alias("max_price"),
        stable_round(F.col("s") / 100.0, 2).alias("total_price"),
    )


class _PKView:
    """Read adapter deriving the bounded-domain measure the histogram
    view maintains: ``pk = cents % 1000`` (round(price*100) as long,
    mod 1000) — a 1000-bin value domain, the shape (status codes,
    star ratings, size buckets) where an exact maintained histogram
    beats both a rescan and a sketch. Same pass-through contract as
    _CentsView."""

    def __init__(self, store):
        self._store = store

    def _with_pk(self, df):
        return df.withColumn(
            "pk",
            F.pmod(F.round(F.col("price") * 100).cast("long"), F.lit(1000)),
        )

    def read(self, version=None):
        return self._with_pk(self._store.read(version=version))

    def read_changes(self, v_from, v_to, update_images="both"):
        return self._with_pk(
            self._store.read_changes(v_from, v_to, update_images=update_images)
        )


_VIEW_HISTOGRAM_ORACLE = """
    WITH base AS (
        SELECT o_orderkey, o_orderstatus,
               round(o_totalprice + 1e-7, 2) AS price
        FROM orders WHERE o_orderkey % 10 <> 3
    ),
    delta AS (
        SELECT o_orderkey, o_orderstatus,
               round(o_totalprice + 1000 + 1e-7, 2) AS price
        FROM orders WHERE o_orderkey % 10 IN (3, 7)
    ),
    v2 AS (
        SELECT * FROM base WHERE o_orderkey % 10 NOT IN (5, 7)
        UNION ALL
        SELECT * FROM delta
    ),
    t AS (
        SELECT o_orderstatus,
               CAST(round(price * 100) AS BIGINT) % 1000 AS pk
        FROM v2
    ),
    h AS (
        SELECT o_orderstatus, pk, count(*) AS c
        FROM t GROUP BY o_orderstatus, pk
    ),
    m AS (
        SELECT o_orderstatus,
               max(c) AS mc,
               CAST(sum(c) AS BIGINT) AS n,
               CAST(count(*) AS BIGINT) AS n_distinct
        FROM h GROUP BY o_orderstatus
    ),
    mo AS (
        SELECT h.o_orderstatus, min(h.pk) AS mode_v
        FROM h JOIN m USING (o_orderstatus)
        WHERE h.c = m.mc GROUP BY h.o_orderstatus
    ),
    md AS (
        SELECT o_orderstatus, median(pk) AS median_v
        FROM t GROUP BY o_orderstatus
    )
    SELECT m.o_orderstatus, m.n, m.n_distinct, mo.mode_v, md.median_v
    FROM m
    JOIN mo USING (o_orderstatus)
    JOIN md USING (o_orderstatus)
"""


@query("incremental_view_histogram", oracle=_VIEW_HISTOGRAM_ORACLE)
def incremental_view_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HOLISTIC aggregates — exact COUNT(DISTINCT), exact interpolated
    MEDIAN, MODE — maintained incrementally through the per-(group,
    value) multiplicity histogram (operators/ivm.maintain_value_counts
    + histogram_stats). None of these is distributive, and the usual
    escape hatches both fail here: a rescan is O(table) per cycle,
    and mergeable sketches (HLL, KLL) cannot process DELETES — while
    the histogram algebra is CLOSED under them (+1/−1 per feed row,
    bins dropped at zero; the stats are pure functions of the bins).
    The demo window exercises every branch on real data: %10==3
    inserts open bins, %10==5 mass deletes retire bins (including
    last-row-of-bin departures that shift medians and demote modes),
    %10==7 updates move multiplicity between bins. The oracle
    recomputes distinct/median/mode from scratch over the post state
    — DuckDB's median is quantile_cont(0.5), exactly the weighted
    interpolation histogram_stats serves from the cumulative bins;
    MODE's engine-unspecified tiebreak is made deterministic
    (smallest value) in BOTH engines.

    At 100 TB: maintenance is O(feed) + O(touched bins) with state
    O(groups × 1000 bins) — the nightly distinct/percentile dashboard
    never rescans the base. Reference parity: the per-extension stats
    rescans of db_duckdb.py:342-356, upgraded to exact-incremental."""
    from ..operators.ivm import histogram_stats, maintain_value_counts

    store = _cdf_store(spark, sf_dir, layout="manifest")
    hist = maintain_value_counts(_PKView(store), 1, 2, ["o_orderstatus"], "pk")
    return histogram_stats(hist, ["o_orderstatus"], "pk").select(
        "o_orderstatus", "n", "n_distinct", "mode_v", "median_v"
    )


@query("incremental_view_histogram_chained", oracle=_VIEW_HISTOGRAM_ORACLE)
def incremental_view_histogram_chained(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The histogram's STEADY-STATE path, chained across the bucket
    evolution store: cycle 1 maintains the bins over the pure-rebucket
    window (1 -> 2: zero feed rows, bins carried), cycle 2 feeds that
    histogram back in as ``old_hist=`` over the merge window (2 -> 3)
    — the base is aggregated exactly once, at the first derivation,
    and the final stats still hash-match the flat store's oracle:
    bin-feedback and the evolved layout's feed compose without
    drift."""
    from ..operators.ivm import histogram_stats, maintain_value_counts

    store = _cdf_store(
        spark,
        sf_dir,
        layout="manifest",
        tag_body="orders-cdf-rb|nb16-32",
        path_prefix="cdfrbstore",
        rebucket_to=32,
    )
    pk = _PKView(store)
    cycle1 = maintain_value_counts(pk, 1, 2, ["o_orderstatus"], "pk")
    hist = maintain_value_counts(
        pk, 2, 3, ["o_orderstatus"], "pk", old_hist=cycle1
    )
    return histogram_stats(hist, ["o_orderstatus"], "pk").select(
        "o_orderstatus", "n", "n_distinct", "mode_v", "median_v"
    )


_VIEW_MOMENTS_ORACLE = """
    WITH base AS (
        SELECT o_orderkey, o_orderstatus,
               round(o_totalprice + 1e-7, 2) AS price
        FROM orders WHERE o_orderkey % 10 <> 3
    ),
    delta AS (
        SELECT o_orderkey, o_orderstatus,
               round(o_totalprice + 1000 + 1e-7, 2) AS price
        FROM orders WHERE o_orderkey % 10 IN (3, 7)
    ),
    v2 AS (
        SELECT * FROM base WHERE o_orderkey % 10 NOT IN (5, 7)
        UNION ALL
        SELECT * FROM delta
    ),
    t AS (
        SELECT o_orderstatus, CAST(round(price * 100) AS BIGINT) AS cents
        FROM v2
    ),
    m AS (
        SELECT o_orderstatus,
               CAST(count(*) AS BIGINT) AS n,
               CAST(sum(cents) AS DECIMAL(38,0)) AS s,
               CAST(sum(CAST(cents AS DECIMAL(19,0))
                        * CAST(cents AS DECIMAL(19,0))) AS DECIMAL(38,0))
                   AS s2
        FROM t GROUP BY o_orderstatus
    )
    SELECT o_orderstatus, n,
           round(CAST(s AS DOUBLE) / CAST(n AS DOUBLE) / 100.0 + 1e-7, 2)
               AS mean_price,
           round((CAST(s2 AS DOUBLE)
                  - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / CAST(n AS DOUBLE))
                 / CAST(n AS DOUBLE) / 10000.0 + 1e-7, 2) AS var_price
    FROM m
"""


@query("incremental_view_moments", oracle=_VIEW_MOMENTS_ORACLE)
def incremental_view_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MEAN/VARIANCE view maintenance (operators/ivm.maintain_moments):
    the per-group (n, s, s2) moment state is fully distributive —
    adds add, removals subtract, NO recompute branch even on mass
    deletes — and the derived mean/population-variance are computed
    from the exact integers only at presentation time. The 100 TB
    teeth are in the ACCUMULATOR TYPE: sums of squares ride
    decimal(38,0), because a long s2 of cent-scale measures wraps at
    ~1e5 rows — silently with ANSI off, the worst failure mode for a
    metric nobody cross-checks (the unit test pins a >2^63 s2 held
    exactly). Both engines derive mean/variance from the same exact
    decimals with the same double-arithmetic shape, so the rounded
    outputs are bit-stable against the from-scratch oracle."""
    from ..operators.ivm import maintain_moments

    store = _cdf_store(spark, sf_dir, layout="manifest")
    view = maintain_moments(_CentsView(store), 1, 2, ["o_orderstatus"], "cents")
    nd = F.col("n").cast("double")
    sd = F.col("s").cast("double")
    qd = F.col("s2").cast("double")
    return view.select(
        "o_orderstatus",
        "n",
        stable_round(sd / nd / 100.0, 2).alias("mean_price"),
        stable_round((qd - sd * sd / nd) / nd / 10000.0, 2).alias(
            "var_price"
        ),
    )


_VIEW_TOPK_ORACLE = """
    WITH base AS (
        SELECT o_orderkey, o_orderstatus,
               round(o_totalprice + 1e-7, 2) AS price
        FROM orders WHERE o_orderkey % 10 <> 3
    ),
    delta AS (
        SELECT o_orderkey, o_orderstatus,
               round(o_totalprice + 1000 + 1e-7, 2) AS price
        FROM orders WHERE o_orderkey % 10 IN (3, 7)
    ),
    v2 AS (
        SELECT * FROM base WHERE o_orderkey % 10 NOT IN (5, 7)
        UNION ALL
        SELECT * FROM delta
    ),
    r AS (
        SELECT o_orderstatus,
               CAST(round(price * 100) AS BIGINT) AS cents,
               row_number() OVER (
                   PARTITION BY o_orderstatus
                   ORDER BY CAST(round(price * 100) AS BIGINT) DESC
               ) AS rk
        FROM v2
    )
    SELECT o_orderstatus, rk, round(cents / 100.0 + 1e-7, 2) AS price
    FROM r WHERE rk <= 5
"""


@query("incremental_view_topk", oracle=_VIEW_TOPK_ORACLE)
def incremental_view_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TOP-K view maintenance from the change feed
    (operators/ivm.maintain_top_k) — the k-generalization of the
    min/max views, the shape every "top 10 per dimension" dashboard
    needs: inserts merge algebraically into the stored O(k) array, a
    removal strictly below the k-th stored value moves only the
    count, and a removal that ties-or-beats the horizon recomputes
    THAT GROUP ONLY via the same AQE-adaptive semi-join as min/max.
    The demo window's %10==5 mass deletes retire top prices in every
    status, so the recompute branch runs on real data, while the
    %10==3/7 adds exercise the O(k) merge; measures flow through
    integer cents so the final /100.0 rounding is bit-stable. The
    oracle ranks the post state from scratch — a hash match proves
    the maintained membership, order, and count all land exactly.
    At 100 TB: O(feed) + O(groups × k) state on the common cycle,
    one group-pruned scan when a horizon member departs."""
    from ..operators.ivm import maintain_top_k

    store = _cdf_store(spark, sf_dir, layout="manifest")
    view = maintain_top_k(
        _CentsView(store), 1, 2, ["o_orderstatus"], "cents", 5
    )
    return view.select(
        "o_orderstatus", F.posexplode("topk").alias("_pos", "cents")
    ).select(
        "o_orderstatus",
        (F.col("_pos") + 1).cast("long").alias("rk"),
        stable_round(F.col("cents") / 100.0, 2).alias("price"),
    )


_VIEW_JOIN_MINMAX_ORACLE = """
    WITH fbase AS (
        SELECT o_orderkey, o_custkey,
               round(o_totalprice + 1e-7, 2) AS price
        FROM orders WHERE o_orderkey % 10 <> 3
    ),
    fdelta AS (
        SELECT o_orderkey, o_custkey,
               round(o_totalprice + 1000 + 1e-7, 2) AS price
        FROM orders WHERE o_orderkey % 10 IN (3, 7)
    ),
    f2 AS (
        SELECT * FROM fbase WHERE o_orderkey % 10 NOT IN (5, 7)
        UNION ALL
        SELECT * FROM fdelta
    ),
    d2 AS (
        SELECT c_custkey,
               CASE WHEN c_custkey % 13 = 4
                    THEN (c_nationkey + 7) % 25
                    ELSE c_nationkey END AS c_nationkey
        FROM customer WHERE c_custkey % 13 <> 6
    )
    SELECT c_nationkey,
           CAST(count(*) AS BIGINT) AS n_orders,
           round(sum(CAST(round(price * 100) AS BIGINT)) / 100.0 + 1e-7, 2)
               AS total_price,
           round(min(CAST(round(price * 100) AS BIGINT)) / 100.0 + 1e-7, 2)
               AS min_price,
           round(max(CAST(round(price * 100) AS BIGINT)) / 100.0 + 1e-7, 2)
               AS max_price
    FROM f2 JOIN d2 ON o_custkey = c_custkey
    GROUP BY c_nationkey
"""


@query("incremental_view_joined_minmax", oracle=_VIEW_JOIN_MINMAX_ORACLE)
def incremental_view_joined_minmax(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The COMPOSED IVM algebras (r10 verdict #5): extremum measures
    over a JOINED view with BOTH stores changing in the window —
    (n, s, min, max) per nation over orders ⋈ customer. Neither
    parent algebra covers it: maintain_joined_agg is count/sum only,
    and maintain_min_max is single-table, but a RE-NATIONED customer
    can retire its old nation's min/max without any fact delete
    (the extremum rows re-group away with their key).

    n/s ride the exact two-term decomposition; min/max split per
    group: add-candidates (fact post-images under the POST dim +
    moved-in keys' post-state per-key extrema) improve extrema
    algebraically, while groups threatened by a fact removal that
    ties-or-beats the stored extremum OR by a genuine dim departure
    recompute from the post-state join — D2 semi-joined to the
    affected groups first, so the key join prunes the fact scan to
    the threatened groups' facts (never a rescan; no driver key
    lists; AQE picks join strategies).

    The oracle rejoins/reaggregates v2 from scratch, so the hash
    gate proves the composition lands on exactly F2 ⋈ D2 through
    fact inserts/updates/deletes AND dim inserts/re-nations/deletes
    (operators/ivm.maintain_joined_min_max)."""
    from ..operators.ivm import maintain_joined_min_max

    fact = _cdf_store(
        spark,
        sf_dir,
        layout="manifest",
        dim_col="o_custkey",
        tag_body="orders-cdf-join|nb16",
        path_prefix="cdfjoinstore",
    )
    dim = _dim_cdf_store(spark, sf_dir)
    view = maintain_joined_min_max(
        fact,
        dim,
        1,
        2,
        fact_key_col="o_custkey",
        dim_key_col="c_custkey",
        group_col="c_nationkey",
    )
    return view.select(
        "c_nationkey",
        F.col("n").alias("n_orders"),
        stable_round(F.col("s") / 100.0, 2).alias("total_price"),
        stable_round(F.col("min_c") / 100.0, 2).alias("min_price"),
        stable_round(F.col("max_c") / 100.0, 2).alias("max_price"),
    )


def _nullgroup_dim_store(spark: SparkSession, sf_dir: str):
    """DIM CDC store whose grouping attribute contains NULLs — the
    one-group-per-SQL semantics the r10 verdict #4 demands: base
    (v1) groups customers by nation except the %7==1 keys, whose
    group is NULL (an unset attribute); the v2 window inserts the
    %13==2 keys, re-groups the %13==4 keys so that some move INTO
    the NULL group (%7==2) and some move OUT of it (%7==1 gets a
    real nation), and deletes the %13==6 keys."""
    cust = load(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    m = F.col("c_custkey") % 13
    base_grp = F.when(F.col("c_custkey") % 7 == 1, F.lit(None)).otherwise(
        F.col("c_nationkey")
    )
    moved_grp = F.when(F.col("c_custkey") % 7 == 2, F.lit(None)).otherwise(
        (F.col("c_nationkey") + 7) % 25
    )
    base = cust.filter(m != 2).select(
        "c_custkey", F.lit(1).alias("v"), base_grp.alias("grp")
    )
    delta = cust.filter(m.isin(2, 4)).select(
        "c_custkey",
        F.lit(2).alias("v"),
        F.when(m == 4, moved_grp).otherwise(base_grp).alias("grp"),
    )
    removed = cust.filter(m == 6).select("c_custkey")
    return _demo_store(
        spark,
        sf_dir,
        name="nulldim",
        key="c_custkey",
        num_buckets=8,
        frames=[("seed", base, None), (1, delta, removed)],
        fp_tables=("customer",),
    )


_VIEW_JOIN_NULLGROUP_ORACLE = """
    WITH fbase AS (
        SELECT o_orderkey, o_custkey,
               round(o_totalprice + 1e-7, 2) AS price
        FROM orders WHERE o_orderkey % 10 <> 3
    ),
    fdelta AS (
        SELECT o_orderkey, o_custkey,
               round(o_totalprice + 1000 + 1e-7, 2) AS price
        FROM orders WHERE o_orderkey % 10 IN (3, 7)
    ),
    f2 AS (
        SELECT * FROM fbase WHERE o_orderkey % 10 NOT IN (5, 7)
        UNION ALL
        SELECT * FROM fdelta
    ),
    d2 AS (
        SELECT c_custkey,
               CASE WHEN c_custkey % 13 = 4
                    THEN CASE WHEN c_custkey % 7 = 2 THEN NULL
                              ELSE (c_nationkey + 7) % 25 END
                    ELSE CASE WHEN c_custkey % 7 = 1 THEN NULL
                              ELSE c_nationkey END END AS grp
        FROM customer WHERE c_custkey % 13 <> 6
    )
    SELECT grp,
           CAST(count(*) AS BIGINT) AS n_orders,
           round(sum(CAST(round(price * 100) AS BIGINT)) / 100.0 + 1e-7, 2)
               AS total_price
    FROM f2 JOIN d2 ON o_custkey = c_custkey
    GROUP BY grp
"""


@query("incremental_view_joined_nullgroup", oracle=_VIEW_JOIN_NULLGROUP_ORACLE)
def incremental_view_joined_nullgroup(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """JOINED-view maintenance where the grouping attribute contains
    NULL — SQL GROUP BY treats NULL as ONE group, and the r10 verdict
    #4 named the hazard: maintain_joined_agg's three-way combine
    previously joined groups by plain equality, so the NULL group's
    old count, fact delta and dim moves would split into three
    output rows instead of pairing. The combine now pairs terms with
    eqNullSafe (the treatment maintain_min_max already used), and
    this window moves dim keys INTO the NULL group, OUT of it, and
    changes facts under keys that stay in it — the oracle recomputes
    the post-state from scratch with DuckDB's one-NULL-group
    semantics, so the hash gate proves all three NULL-group
    contributions land on a single row."""
    from ..operators.ivm import maintain_joined_agg

    fact = _cdf_store(
        spark,
        sf_dir,
        layout="manifest",
        dim_col="o_custkey",
        tag_body="orders-cdf-join|nb16",
        path_prefix="cdfjoinstore",
    )
    dim = _nullgroup_dim_store(spark, sf_dir)
    view = maintain_joined_agg(
        fact,
        dim,
        1,
        2,
        fact_key_col="o_custkey",
        dim_key_col="c_custkey",
        group_col="grp",
    )
    return view.select(
        "grp",
        F.col("n").alias("n_orders"),
        stable_round(F.col("s") / 100.0, 2).alias("total_price"),
    )


def _cdf3_stores(spark: SparkSession, sf_dir: str):
    """THREE-version fact + dim CDC stores for the chained joined-view
    demo — two consecutive windows in which BOTH sides change:

    fact (orders): v1 = minus %10==3; v2 = merge (insert 3 / update 7,
    price+1000; remove 5); v3 = merge (update 1, price+500; remove 9).
    dim (customer): v1 = minus %13==2; v2 = merge (insert 2 /
    re-nation 4 (+7 mod 25); remove 6); v3 = merge (re-nation 7
    (+3 mod 25); remove 11)."""
    orders = load(spark, sf_dir, "orders")
    fm = F.col("o_orderkey") % 10
    f_base = orders.filter(fm != 3).select(
        "o_orderkey", F.lit(1).alias("v"), "o_custkey",
        stable_round(F.col("o_totalprice"), 2).alias("price"),
    )
    f_d1 = orders.filter(fm.isin(3, 7)).select(
        "o_orderkey", F.lit(2).alias("v"), "o_custkey",
        stable_round(F.col("o_totalprice") + 1000, 2).alias("price"),
    )
    f_r1 = orders.filter(fm == 5).select("o_orderkey")
    f_d2 = orders.filter(fm == 1).select(
        "o_orderkey", F.lit(3).alias("v"), "o_custkey",
        stable_round(F.col("o_totalprice") + 500, 2).alias("price"),
    )
    f_r2 = orders.filter(fm == 9).select("o_orderkey")

    cust = load(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    dm = F.col("c_custkey") % 13
    d_base = cust.filter(dm != 2).select(
        "c_custkey", F.lit(1).alias("v"), "c_nationkey"
    )
    d_d1 = cust.filter(dm.isin(2, 4)).select(
        "c_custkey", F.lit(2).alias("v"),
        F.when(dm == 4, (F.col("c_nationkey") + 7) % 25)
        .otherwise(F.col("c_nationkey")).alias("c_nationkey"),
    )
    d_r1 = cust.filter(dm == 6).select("c_custkey")
    d_d2 = cust.filter(dm == 7).select(
        "c_custkey", F.lit(3).alias("v"),
        ((F.col("c_nationkey") + 3) % 25).alias("c_nationkey"),
    )
    d_r2 = cust.filter(dm == 11).select("c_custkey")

    return [
        _demo_store(
            spark, sf_dir, name="cdf3fact", key="o_orderkey",
            num_buckets=16,
            frames=[("seed", f_base, None), (1, f_d1, f_r1),
                    (2, f_d2, f_r2)],
            fp_tables=("orders", "customer"),
        ),
        _demo_store(
            spark, sf_dir, name="cdf3dim", key="c_custkey",
            num_buckets=8,
            frames=[("seed", d_base, None), (1, d_d1, d_r1),
                    (2, d_d2, d_r2)],
            fp_tables=("orders", "customer"),
        ),
    ]


_VIEW_JOIN_CHAINED_ORACLE = """
    WITH f3 AS (
        SELECT o_orderkey, o_custkey,
               round(o_totalprice
                     + CASE WHEN o_orderkey % 10 IN (3, 7) THEN 1000
                            WHEN o_orderkey % 10 = 1 THEN 500
                            ELSE 0 END + 1e-7, 2) AS price
        FROM orders WHERE o_orderkey % 10 NOT IN (5, 9)
    ),
    d3 AS (
        SELECT c_custkey,
               CASE WHEN c_custkey % 13 = 4 THEN (c_nationkey + 7) % 25
                    WHEN c_custkey % 13 = 7 THEN (c_nationkey + 3) % 25
                    ELSE c_nationkey END AS c_nationkey
        FROM customer WHERE c_custkey % 13 NOT IN (6, 11)
    )
    SELECT c_nationkey,
           CAST(count(*) AS BIGINT) AS n_orders,
           round(sum(CAST(round(price * 100) AS BIGINT)) / 100.0 + 1e-7, 2)
               AS total_price
    FROM f3 JOIN d3 ON o_custkey = c_custkey
    GROUP BY c_nationkey
"""


@query("incremental_view_joined_chained", oracle=_VIEW_JOIN_CHAINED_ORACLE)
def incremental_view_joined_chained(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The STEADY-STATE path for joined views with changing dims:
    cycle 1 maintains over window (1 -> 2) of BOTH stores, cycle 2
    feeds that output back in as ``old_view=`` and maintains over
    (2 -> 3) — after the first derivation neither the fact table nor
    the dim is ever reaggregated from scratch; each night costs
    O(fact feed ⋈ dim) + O(facts of dim-changed keys) + O(groups).
    Cycle 2's term-1 joins against the dim's INTERMEDIATE state
    (v2 — yesterday's dim), which is exactly what the decomposition
    requires; the oracle recomputes the final v3 ⋈ v3 state from
    scratch, so the hash gate proves two chained applications of the
    two-term algebra land bit-stably on the truth through fact
    inserts/updates/deletes AND dim inserts/re-groupings/deletes in
    BOTH windows (operators/ivm.maintain_joined_agg)."""
    from ..operators.ivm import maintain_joined_agg

    fact, dim = _cdf3_stores(spark, sf_dir)
    c1 = maintain_joined_agg(
        fact, dim, 1, 2,
        fact_key_col="o_custkey",
        dim_key_col="c_custkey",
        group_col="c_nationkey",
    ).transform(ckpt_shared)
    view = maintain_joined_agg(
        fact, dim, 2, 3,
        fact_key_col="o_custkey",
        dim_key_col="c_custkey",
        group_col="c_nationkey",
        old_view=c1,
    )
    return view.select(
        "c_nationkey",
        F.col("n").alias("n_orders"),
        stable_round(F.col("s") / 100.0, 2).alias("total_price"),
    )


def _incremental_batch_matches(
    spark: SparkSession, sf_dir: str, *, layout: str
) -> DataFrame:
    import hashlib
    import os

    from ..operators.incremental_dedup import MinHashBandStore
    from .llm_queries import _aug_corpus

    aug = _aug_corpus(spark, sf_dir)
    corpus = aug.filter(F.col("doc_id") < 1_000_000_000_000)
    batch = aug.filter(F.col("doc_id") >= 1_000_000_000_000)
    fp = _dataset_fingerprint(sf_dir, "documents")
    tag = hashlib.md5(
        f"{os.path.abspath(sf_dir)}|{fp}|nh16|b4|sh3|nb32|{layout}|v2".encode()
    ).hexdigest()[:12]
    path = f"/tmp/spark-graft-bandstore-{tag}"
    with _store_lock(path):
        store = MinHashBandStore(spark, path, num_buckets=32, layout=layout)
        if store.store.current_version() is None:
            store.seed(corpus, "doc_id", "text")
        # Pinned before the vacuum: safe against our own retention AND
        # a concurrent process's (see _pin).
        matches = _pin(
            store.match_and_merge(
                batch, "doc_id", "text", batch_seq=1, threshold=0.5
            )
        )
        store.store.vacuum(keep=2)
    return matches


def _incremental_curation_oracle() -> str:
    """From-scratch recompute of the nightly O(delta) curation cycle:
    the planted delta (ids >= 1e12 — exact re-crawls + truncated
    variants of the base corpus) is quality-gated, then every quality
    survivor with a banded-MinHash match (est_jaccard >= 0.5) against
    the BASE corpus is dropped. Reuses the dedup_minhash_lsh oracle's
    exact SQL fragments plus the shared QUALITY_SCORE_SQL, so the
    composed recompute is definitionally the same chain the engine
    runs."""
    from ..functions.text import MINHASH_P
    from .llm_pipeline5 import QUALITY_SCORE_SQL
    from .llm_queries import _CORPUS_SQL, _MINHASH_SIG_ITEMS, _SHINGLES_SQL

    return (
        _CORPUS_SQL
        + _SHINGLES_SQL
        + f"""
    , hbase AS (
        SELECT sid,
               list_transform(shingles,
                   s -> ('0x' || substr(md5(s), 1, 8))::BIGINT % {MINHASH_P}) AS hb
        FROM sh
    ),
    sig AS (
        SELECT sid, [{_MINHASH_SIG_ITEMS}] AS sg
        FROM hbase
    ),
    quality AS (
        SELECT doc_id, len(toks) AS n_tokens, {QUALITY_SCORE_SQL} AS score
        FROM (SELECT doc_id, tk AS toks FROM toks
              WHERE doc_id >= 1000000000000 AND len(tk) > 0)
    ),
    qkeep AS (SELECT * FROM quality WHERE score >= 0.5),"""
        + """
    bands AS (
        SELECT sid, b, md5(array_to_string(sg[(4*b+1):(4*b+4)], '|')) AS h
        FROM sig, (SELECT unnest(range(0, 4)) AS b)
    ),
    cand AS (
        SELECT DISTINCT q.sid AS batch_id, c.sid AS corpus_id
        FROM bands q JOIN bands c ON q.b = c.b AND q.h = c.h
        WHERE q.sid IN (SELECT doc_id FROM qkeep)
          AND c.sid < 1000000000000
    ),
    matched AS (
        SELECT DISTINCT batch_id FROM (
            SELECT batch_id,
                   round(len(list_filter(range(1, 17), i -> x.sg[i] = y.sg[i]))::DOUBLE
                         / 16 + 1e-7, 3) AS est_jaccard
            FROM cand
            JOIN sig x ON x.sid = cand.batch_id
            JOIN sig y ON y.sid = cand.corpus_id
        ) WHERE est_jaccard >= 0.5
    ),
    kept AS (
        SELECT * FROM qkeep WHERE doc_id NOT IN (SELECT batch_id FROM matched)
    )
    SELECT
        CAST((SELECT count(*) FROM corpus
              WHERE doc_id >= 1000000000000) AS BIGINT) AS n_batch,
        CAST((SELECT count(*) FROM qkeep) AS BIGINT) AS n_quality,
        CAST((SELECT count(*) FROM matched) AS BIGINT) AS n_dropped_neardup,
        CAST((SELECT count(*) FROM kept) AS BIGINT) AS n_kept,
        CAST(coalesce((SELECT sum(n_tokens) FROM kept), 0) AS BIGINT)
            AS kept_tokens,
        CAST(coalesce((SELECT sum(doc_id) FROM kept), 0) AS BIGINT)
            AS sum_kept_ids
    """
    )


@query("incremental_curation_cycle", oracle=_incremental_curation_oracle())
def incremental_curation_cycle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The NIGHTLY O(delta) curation cycle, composed: a delta batch
    (the planted re-crawls + truncations, ids >= 1e12) runs quality
    gate -> near-dup-vs-corpus probe against the PERSISTED MinHash
    band index -> survivor rollup, and the whole composition sits
    under one from-scratch oracle. This is the incremental twin of
    ``curation_pipeline_e2e``: that query proves the composed
    FULL-CORPUS chain; this one proves the composed chain a 100 TB
    deployment actually runs every night, where the corpus side is
    TOUCHED ONLY THROUGH THE INDEX (bucket-pruned probe, O(delta)) —
    never rescanned, never reshingled.

    The probe uses ``merge=False``: the cycle's sink decision (merge
    survivors, merge everything, or quarantine) belongs to the caller;
    a pure probe also makes repeated gate/bench invocations trivially
    idempotent. Quality runs FIRST so the band probe only pays for
    quality survivors — filters before joins, the usual order."""
    import hashlib
    import os

    from ..functions.text import tokens
    from ..operators.incremental_dedup import MinHashBandStore
    from .llm_pipeline5 import quality_score_expr
    from .llm_queries import _aug_corpus

    aug = _aug_corpus(spark, sf_dir)
    corpus = aug.filter(F.col("doc_id") < 1_000_000_000_000)
    batch = aug.filter(F.col("doc_id") >= 1_000_000_000_000)
    fp = _dataset_fingerprint(sf_dir, "documents")
    tag = hashlib.md5(
        f"{os.path.abspath(sf_dir)}|{fp}|nh16|b4|sh3|nb32|cur|v1".encode()
    ).hexdigest()[:12]
    path = f"/tmp/spark-graft-bandstore-{tag}"

    bt = batch.select(
        "doc_id", "text", tokens("text").alias("toks")
    ).filter(F.size("toks") > 0)
    qkeep = (
        bt.withColumn("score", quality_score_expr())
        .filter(F.col("score") >= 0.5)
        .select("doc_id", "text", F.size("toks").alias("n_tokens"))
        # Three consumers (probe input, anti-join, rollup) share one
        # computation of the tokenize+score chain.
        .transform(ckpt_shared)
    )
    with _store_lock(path):
        store = MinHashBandStore(spark, path, num_buckets=32)
        if store.store.current_version() is None:
            store.seed(corpus, "doc_id", "text")
        matches = store.match_and_merge(
            qkeep.select("doc_id", "text"),
            "doc_id",
            "text",
            batch_seq=1,
            threshold=0.5,
            merge=False,
        )
    matched = matches.select(F.col("batch_id").alias("doc_id")).distinct()
    kept = qkeep.join(matched, "doc_id", "left_anti")

    n_batch = batch.agg(F.count(F.lit(1)).cast("long").alias("n_batch"))
    n_quality = qkeep.agg(F.count(F.lit(1)).cast("long").alias("n_quality"))
    n_matched = matched.agg(
        F.count(F.lit(1)).cast("long").alias("n_dropped_neardup")
    )
    kept_agg = kept.agg(
        F.count(F.lit(1)).cast("long").alias("n_kept"),
        F.coalesce(F.sum("n_tokens"), F.lit(0)).cast("long").alias("kept_tokens"),
        F.coalesce(F.sum("doc_id"), F.lit(0)).cast("long").alias("sum_kept_ids"),
    )
    return n_batch.join(n_quality).join(n_matched).join(kept_agg)


def _incremental_tombstone_oracle() -> str:
    """The incremental-dedup recompute with the tombstoned corpus slice
    (sid % 7 == 0) excluded from the candidate side — what the band
    store must answer after an O(removal) tombstone pass, BEFORE any
    compaction has physically dropped the rows."""
    base = _incremental_dedup_oracle()
    old = "WHERE q.sid >= 1000000000000 AND c.sid < 1000000000000"
    assert old in base  # our own oracle text — keep the splice honest
    return base.replace(old, old + " AND c.sid % 7 != 0")


@query("dedup_incremental_tombstone", oracle=_incremental_tombstone_oracle())
def dedup_incremental_tombstone(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental dedup with TOMBSTONED removals (r7 verdict #2): a
    seventh of the corpus is removed via the O(removal) tombstone log
    (``remove_docs(mode="tombstone")`` — a bucket-pruned merge into
    the removal log; the index itself is NOT rewritten), then the
    delta batch is matched. The probe filters the pruned index slice
    against the log, so removed docs are logically gone immediately;
    :meth:`compact_tombstones` folds the log in with one amortized
    O(index) pass later (pytest-covered). The oracle recomputes the
    matches from scratch over corpus-minus-removed, proving the
    tombstone filter is exact — not just 'applied'."""
    import hashlib
    import os

    from ..operators.incremental_dedup import MinHashBandStore
    from .llm_queries import _aug_corpus

    aug = _aug_corpus(spark, sf_dir)
    corpus = aug.filter(F.col("doc_id") < 1_000_000_000_000)
    batch = aug.filter(F.col("doc_id") >= 1_000_000_000_000)
    fp = _dataset_fingerprint(sf_dir, "documents")
    tag = hashlib.md5(
        f"{os.path.abspath(sf_dir)}|{fp}|nh16|b4|sh3|nb32|tomb|v1".encode()
    ).hexdigest()[:12]
    path = f"/tmp/spark-graft-bandstore-{tag}"
    with _store_lock(path):
        store = MinHashBandStore(spark, path, num_buckets=32)
        if store.store.current_version() is None:
            store.seed(corpus, "doc_id", "text")
        # O(removal), idempotent across runs (LWW on the id).
        store.remove_docs(
            corpus.filter(F.col("doc_id") % 7 == 0).select("doc_id"),
            mode="tombstone",
        )
        matches = _pin(
            store.match_and_merge(
                batch, "doc_id", "text", batch_seq=1, threshold=0.5
            )
        )
        store.store.vacuum(keep=2)
        store.tombstones.store.vacuum(keep=2)
    return matches


@query("ann_incremental_ivf_topk", oracle=ORACLES["similarity_ivf_topk"])
def ann_incremental_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN over a PERSISTED, INCREMENTALLY-BUILT index
    (operators/incremental_ann.py): seed with 90% of the corpus, add
    the remaining 10% as a delta batch (broadcast-argmin assignment +
    bucket-pruned merge, O(delta)), then search the stored index —
    reading ONLY the probed cells' buckets from disk, the on-disk
    analog of an inverted list.

    The oracle is similarity_ivf_topk's VERBATIM: assignment is a pure
    function of (vector, fixed centroids), so seed+add must be
    row-identical to a single-pass build and the search must hash-match
    the one-shot operator — incremental maintenance proven
    behavior-preserving under the driver gate, the same guarantee
    dedup_incremental_batch gives the dedup layer."""
    import hashlib
    import os

    from ..operators.incremental_ann import IvfIndexStore

    return _incremental_ivf_matches(spark, sf_dir, layout="hardlink")


@query("ann_incremental_ivf_manifest", oracle=ORACLES["similarity_ivf_topk"])
def ann_incremental_ivf_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SAME incremental IVF cycle on the OBJECT-STORE snapshot
    layout (``layout="manifest"``) — r8: the centroid set now commits
    through the snapshot's per-version meta payload
    (SnapshotStore.read_meta) instead of a POSIX directory sidecar, so
    the WHOLE index (rows + centroids) rides the
    write-files-then-swap-pointer protocol and is S3/GCS-safe. Shares
    similarity_ivf_topk's oracle verbatim: layout must be a pure
    storage decision (the driver-gate upgrade of the pytest
    byte-parity check, mirroring dedup_incremental_batch_manifest)."""
    return _incremental_ivf_matches(spark, sf_dir, layout="manifest")


def _incremental_ivf_matches(
    spark: SparkSession, sf_dir: str, *, layout: str
) -> DataFrame:
    import hashlib
    import os

    from ..operators.incremental_ann import IvfIndexStore

    emb = load(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.transform(F.col("embedding"), lambda x: x.cast("double")).alias("emb"),
    )
    centroids = emb.filter(F.col("vec_id") < 16)
    fp = _dataset_fingerprint(sf_dir, "embeddings")
    tag = hashlib.md5(
        f"{os.path.abspath(sf_dir)}|{fp}|ivf|c16|nb32|{layout}|v3".encode()
    ).hexdigest()[:12]
    path = f"/tmp/spark-graft-ivfstore-{tag}"
    with _store_lock(path):
        store = IvfIndexStore(spark, path, num_buckets=32, layout=layout)
        if store.store.current_version() is None:
            store.seed(emb.filter(F.col("vec_id") % 10 != 0), centroids,
                       "vec_id", "emb")
        store.add(emb.filter(F.col("vec_id") % 10 == 0), "vec_id", "emb", seq=1)
        matches = _pin(
            store.search(
                emb.filter(F.col("vec_id") < 8), "vec_id", "emb", k=3, nprobe=2
            )
        )
        store.store.vacuum(keep=2)
    return matches


@query("ann_ivf_split_topk", oracle=ORACLES["similarity_bruteforce_topk"])
def ann_ivf_split_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HOT-CELL SPLIT proven content-preserving under the driver gate
    (operators/incremental_ann.IvfIndexStore.split_hot_cells, r11):
    the index seeds with 16 centroids, every cell above the average
    occupancy binary-splits (parent centroid retired, only its
    vectors re-assigned — deterministic in-cell 2-means, committed
    atomically with the new centroid meta), and the search then
    probes EVERY live cell — which must return exactly the
    brute-force cosine top-k. Probing all cells deliberately removes
    the approximation so the hash gate checks the strongest possible
    property: a split loses no vector, duplicates none, and leaves
    none stranded under a retired cid (a stranded vector would be
    missing from some query's top-k). The pruning/latency side —
    fixed threshold, k-growing skewed corpus, flat probe time,
    recall >= 0.8 at nprobe=2 — is measured by SCALE_STRESS's
    ivf_hot_split probe."""
    import hashlib
    import os

    from ..operators.incremental_ann import IvfIndexStore

    emb = load(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.transform(F.col("embedding"), lambda x: x.cast("double")).alias(
            "emb"
        ),
    )
    centroids = emb.filter(F.col("vec_id") < 16)
    fp = _dataset_fingerprint(sf_dir, "embeddings")
    tag = hashlib.md5(
        f"{os.path.abspath(sf_dir)}|{fp}|ivfsplit|c16|nb32|v1".encode()
    ).hexdigest()[:12]
    path = f"/tmp/spark-graft-ivfsplitstore-{tag}"
    with _store_lock(path):
        store = IvfIndexStore(spark, path, num_buckets=32)
        if store.store.current_version() is None:
            store.seed(emb, centroids, "vec_id", "emb")
        if store.store.current_version() == 1:
            # Average occupancy as the threshold: any skewed cell
            # splits. Bounded rounds — a degenerate all-identical
            # cell cannot split below any threshold (docstring),
            # and 4 halvings ≥ 16x reduction covers this corpus.
            n = store.store.read(version=1).count()
            thr = max(1, n // 16)
            for s in range(1, 5):
                if store.split_hot_cells(threshold=thr, seq=s) is None:
                    break
        live_cells = store.centroid_count()
        matches = _pin(
            store.search(
                emb.filter(F.col("vec_id") < 8),
                "vec_id",
                "emb",
                k=3,
                nprobe=live_cells,
            )
        )
        store.store.vacuum(keep=2)
    return matches


_VIEW_HLL_ORACLE = """
    SELECT o_orderstatus,
           CAST(count(DISTINCT o_orderkey) AS BIGINT) AS n_exact,
           TRUE AS within_5pct
    FROM orders GROUP BY o_orderstatus
"""


@query("incremental_view_hll_distinct", oracle=_VIEW_HLL_ORACLE)
def incremental_view_hll_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SKETCH path for maintained distinct counts
    (operators/ivm.maintain_hll_distinct) — the documented dual of
    the exact histogram: a near-unique measure (order keys per
    status) makes O(distinct values) histogram state pointless, and
    an INSERT-ONLY feed makes the HLL's one weakness (registers
    cannot forget — the operator REFUSES delete-bearing windows
    loudly) irrelevant. Union-of-sketches is register-wise max, so
    the maintained sketch is bit-identical to a from-scratch
    ``hll_sketch_agg`` over the post state — maintenance adds zero
    error on top of the sketch's own. The gate shape follows
    approx_distinct_tolerance: the query emits the EXACT post-state
    distinct count alongside a within-5% verdict on the maintained
    estimate (HLL lgK=12 ≈ 1.6% typical error), and the oracle
    asserts the exact counts and an all-TRUE verdict column — a hash
    match proves the maintained estimate lands inside the band for
    every group. At 100 TB: per-group state is KBs regardless of
    cardinality, the cycle is O(feed), and the estimate is mergeable
    across shards/sites by construction."""
    from ..operators.ivm import maintain_hll_distinct

    orders = load(spark, sf_dir, "orders")
    base = orders.filter(F.col("o_orderkey") % 10 != 3).select(
        "o_orderkey", F.lit(1).alias("v"), "o_orderstatus"
    )
    delta = orders.filter(F.col("o_orderkey") % 10 == 3).select(
        "o_orderkey", F.lit(2).alias("v"), "o_orderstatus"
    )
    store = _demo_store(
        spark,
        sf_dir,
        name="cdfinsstore",
        key="o_orderkey",
        num_buckets=16,
        frames=[("seed", base, None), (1, delta, None)],
        fp_tables=("orders",),
    )
    sketches = maintain_hll_distinct(
        store, 1, 2, ["o_orderstatus"], "o_orderkey"
    )
    est = sketches.select(
        "o_orderstatus", F.hll_sketch_estimate("sk").alias("_est")
    )
    exact = (
        store.read(version=2)
        .groupBy("o_orderstatus")
        .agg(F.countDistinct("o_orderkey").alias("n_exact"))
    )
    return est.join(exact, "o_orderstatus").select(
        "o_orderstatus",
        "n_exact",
        (
            F.abs(F.col("_est") - F.col("n_exact"))
            <= 0.05 * F.col("n_exact")
        ).alias("within_5pct"),
    )


_VIEW_JOIN_HISTOGRAM_ORACLE = """
    WITH fbase AS (
        SELECT o_orderkey, o_custkey,
               round(o_totalprice + 1e-7, 2) AS price
        FROM orders WHERE o_orderkey % 10 <> 3
    ),
    fdelta AS (
        SELECT o_orderkey, o_custkey,
               round(o_totalprice + 1000 + 1e-7, 2) AS price
        FROM orders WHERE o_orderkey % 10 IN (3, 7)
    ),
    f2 AS (
        SELECT * FROM fbase WHERE o_orderkey % 10 NOT IN (5, 7)
        UNION ALL
        SELECT * FROM fdelta
    ),
    d2 AS (
        SELECT c_custkey,
               CASE WHEN c_custkey % 13 = 4
                    THEN (c_nationkey + 7) % 25
                    ELSE c_nationkey END AS c_nationkey
        FROM customer WHERE c_custkey % 13 <> 6
    ),
    t AS (
        SELECT c_nationkey,
               CAST(round(price * 100) AS BIGINT) % 1000 AS pk
        FROM f2 JOIN d2 ON o_custkey = c_custkey
    ),
    h AS (
        SELECT c_nationkey, pk, count(*) AS c
        FROM t GROUP BY c_nationkey, pk
    ),
    m AS (
        SELECT c_nationkey,
               max(c) AS mc,
               CAST(sum(c) AS BIGINT) AS n,
               CAST(count(*) AS BIGINT) AS n_distinct
        FROM h GROUP BY c_nationkey
    ),
    mo AS (
        SELECT h.c_nationkey, min(h.pk) AS mode_v
        FROM h JOIN m USING (c_nationkey)
        WHERE h.c = m.mc GROUP BY h.c_nationkey
    ),
    md AS (
        SELECT c_nationkey, median(pk) AS median_v
        FROM t GROUP BY c_nationkey
    )
    SELECT m.c_nationkey, m.n, m.n_distinct, mo.mode_v, md.median_v
    FROM m
    JOIN mo USING (c_nationkey)
    JOIN md USING (c_nationkey)
"""


@query(
    "incremental_view_joined_histogram", oracle=_VIEW_JOIN_HISTOGRAM_ORACLE
)
def incremental_view_joined_histogram(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """HOLISTIC aggregates over a JOIN, maintained through BOTH feeds
    (operators/ivm.maintain_joined_value_counts + histogram_stats):
    exact per-nation COUNT(DISTINCT) / MEDIAN / MODE of the order-
    price measure, advanced across a window where orders churn
    (%10==3 inserts, ==5 mass deletes, ==7 re-prices) AND customers
    churn (%13==2 inserts surface dark facts, ==4 re-nations move
    whole per-customer value multisets between nations, ==6 deletes
    withdraw them). The bin algebra composes with the two-term
    decomposition bins(V2) − bins(V1) = bins(ΔF⋈D1) + bins(F2⋈ΔD),
    and because bins are closed under deletes there is NO recompute
    branch — a dim departure that would force the joined min/max
    view to rescan affected groups is pure delta here. The oracle
    rejoins the post state from scratch and recomputes median
    (quantile_cont parity) / deterministic-tiebreak mode / distinct,
    so the hash gate proves the composed algebra lands on exactly
    F2 ⋈ D2's holistic stats. At 100 TB: O(fact feed ⋈ dim) +
    O(facts of dim-changed keys) + O(bins) per cycle — the
    \"median order value per segment\" dashboard with neither a
    rescan nor a delete-blind sketch."""
    from ..operators.ivm import histogram_stats, maintain_joined_value_counts

    fact = _cdf_store(
        spark,
        sf_dir,
        layout="manifest",
        dim_col="o_custkey",
        tag_body="orders-cdf-join|nb16",
        path_prefix="cdfjoinstore",
    )
    dim = _dim_cdf_store(spark, sf_dir)
    bins = maintain_joined_value_counts(
        _PKView(fact),
        dim,
        1,
        2,
        fact_key_col="o_custkey",
        dim_key_col="c_custkey",
        group_col="c_nationkey",
        value_col="pk",
    )
    return histogram_stats(bins, ["c_nationkey"], "pk").select(
        "c_nationkey", "n", "n_distinct", "mode_v", "median_v"
    )


def _coldmerge_oracle() -> str:
    from .llm_queries import _COS_SQL

    # Brute-force cosine top-3 over the LIVE corpus (vec_id % 7 == 2
    # eagerly removed), queries = the live ids < 8 — the from-scratch
    # twin of probing every live cell after the cold merge.
    return f"""
    WITH live AS (
        SELECT vec_id, embedding FROM embeddings WHERE vec_id % 7 <> 2
    ),
    q AS (SELECT vec_id AS query_id, embedding AS qv FROM live WHERE vec_id < 8),
    c AS (SELECT vec_id AS neighbor_id, embedding AS nv FROM live),
    scored AS (
        SELECT query_id, neighbor_id, {_COS_SQL} AS cos_sim
        FROM q, c WHERE neighbor_id <> query_id
    )
    SELECT query_id, neighbor_id, cos_sim FROM (
        SELECT *, row_number() OVER (PARTITION BY query_id
                                     ORDER BY cos_sim DESC, neighbor_id) AS rn
        FROM scored
    ) WHERE rn <= 3
    """


@query("ann_ivf_coldmerge_topk", oracle=_coldmerge_oracle())
def ann_ivf_coldmerge_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COLD-CELL MERGE proven content-preserving under the driver
    gate (operators/incremental_ann.IvfIndexStore.merge_cold_cells,
    r12 — the split's inverse): the index seeds with 16 centroids,
    an eager removal deletes every ``vec_id % 7 == 2`` (cells decay),
    every cell below the post-removal average occupancy retires (its
    survivors re-assign to the nearest surviving centroid, committed
    atomically with the shrunk centroid meta), and the search then
    probes EVERY live cell — which must return exactly the
    brute-force cosine top-k over the live corpus. Probing all cells
    removes the approximation so the hash gate checks the strongest
    property: a merge loses no vector, resurrects no removed one,
    and strands none under a retired cid. Why it matters at scale: a
    split-only policy grows the centroid set (broadcast to every
    probe) without bound under churn, and near-empty cells crowd
    full ones out of the ``nprobe`` budget — recall decays with no
    correctness signal; the merge is the bounded-state half of the
    maintenance pair."""
    import hashlib
    import os

    from ..operators.incremental_ann import IvfIndexStore

    emb = load(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.transform(F.col("embedding"), lambda x: x.cast("double")).alias(
            "emb"
        ),
    )
    centroids = emb.filter(F.col("vec_id") < 16)
    fp = _dataset_fingerprint(sf_dir, "embeddings")
    tag = hashlib.md5(
        f"{os.path.abspath(sf_dir)}|{fp}|ivfcold|c16|nb32|v1".encode()
    ).hexdigest()[:12]
    path = f"/tmp/spark-graft-ivfcoldstore-{tag}"
    with _store_lock(path):
        store = IvfIndexStore(spark, path, num_buckets=32)
        if store.store.current_version() is None:
            store.seed(emb, centroids, "vec_id", "emb")
        if store.store.current_version() == 1:
            store.remove_vecs(
                emb.filter(F.col("vec_id") % 7 == 2).select("vec_id"),
                mode="eager",
            )  # v2 (anti-join overwrite — cells genuinely shrink)
        if store.store.current_version() == 2:
            # Average post-removal occupancy: decayed cells retire.
            n = store.store.read(version=2).count()
            store.merge_cold_cells(threshold=max(1, n // 16), seq=1)
        live_cells = store.centroid_count()
        matches = _pin(
            store.search(
                emb.filter(
                    (F.col("vec_id") < 8) & (F.col("vec_id") % 7 != 2)
                ),
                "vec_id",
                "emb",
                k=3,
                nprobe=live_cells,
            )
        )
        store.store.vacuum(keep=2)
    return matches


@query(
    "substring_incremental_tombstone",
    oracle="""
    WITH d AS (
        SELECT doc_id,
               list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
                           x -> x <> '') AS toks
        FROM documents
    ),
    corpus AS (
        SELECT * FROM d WHERE doc_id % 10 != 0 AND doc_id % 6 != 3
    ),
    batch  AS (SELECT * FROM d WHERE doc_id % 10 = 0),
    csh AS (
        SELECT DISTINCT array_to_string(toks[i:i+4], ' ') AS shingle
        FROM corpus, unnest(range(1, len(toks) - 3)) AS t(i)
        WHERE len(toks) >= 5
    ),
    bsh AS (
        SELECT doc_id, i AS pos, array_to_string(toks[i:i+4], ' ') AS shingle
        FROM batch, unnest(range(1, len(toks) - 3)) AS t(i)
        WHERE len(toks) >= 5
    ),
    dup AS (
        SELECT b.doc_id, b.pos,
               b.pos - row_number() OVER (
                   PARTITION BY b.doc_id ORDER BY b.pos) AS grp
        FROM bsh b JOIN csh c USING (shingle)
    ),
    spans AS (
        SELECT doc_id, count(*) AS n_pos, min(pos) AS p0, max(pos) AS p1
        FROM dup GROUP BY doc_id, grp
    )
    SELECT doc_id AS batch_id,
           CAST(count(*) AS BIGINT) AS n_spans,
           CAST(max(p1 - p0 + 5) AS BIGINT) AS max_span_words,
           CAST(sum(n_pos) AS BIGINT) AS dup_shingles
    FROM spans GROUP BY doc_id
    """,
)
def substring_incremental_tombstone(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental substring dedup with TOMBSTONED corpus removals —
    the shingle-store twin of ``dedup_incremental_tombstone``: corpus
    docs with doc_id % 6 == 3 are removed via the O(removal) tombstone
    log (the shingle index itself is NOT rewritten), then the delta
    batch's spans are extracted against corpus-minus-removed. The
    oracle recomputes from scratch with the removed slice excluded,
    proving the log's filter is exact at the position-row level (a
    doc's EVERY shingle row must vanish, or a span would survive
    partially)."""
    import hashlib
    import os

    from ..operators.incremental_substring import ShingleSpanStore

    docs = load(spark, sf_dir, "documents")
    corpus = docs.filter(F.col("doc_id") % 10 != 0)
    batch = docs.filter(F.col("doc_id") % 10 == 0)
    fp = _dataset_fingerprint(sf_dir, "documents")
    tag = hashlib.md5(
        f"{os.path.abspath(sf_dir)}|{fp}|shingle|k5|nb32|tomb|v1".encode()
    ).hexdigest()[:12]
    path = f"/tmp/spark-graft-shinglestore-{tag}"
    with _store_lock(path):
        store = ShingleSpanStore(spark, path, k=5, num_buckets=32)
        if store.store.current_version() is None:
            store.seed(corpus, "doc_id", "text")
        store.remove_docs(
            corpus.filter(F.col("doc_id") % 6 == 3).select("doc_id"),
            mode="tombstone",
        )
        out = _pin(
            store.match_and_merge(
                batch, "doc_id", "text", batch_seq=1, merge=False
            )
        )
        store.tombstones.store.vacuum(keep=2)
    return out


@query(
    "substring_dup_incremental",
    oracle="""
    WITH d AS (
        SELECT doc_id,
               list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
                           x -> x <> '') AS toks
        FROM documents
    ),
    corpus AS (SELECT * FROM d WHERE doc_id % 10 != 0),
    batch  AS (SELECT * FROM d WHERE doc_id % 10 = 0),
    csh AS (
        SELECT DISTINCT array_to_string(toks[i:i+4], ' ') AS shingle
        FROM corpus, unnest(range(1, len(toks) - 3)) AS t(i)
        WHERE len(toks) >= 5
    ),
    bsh AS (
        SELECT doc_id, i AS pos, array_to_string(toks[i:i+4], ' ') AS shingle
        FROM batch, unnest(range(1, len(toks) - 3)) AS t(i)
        WHERE len(toks) >= 5
    ),
    dup AS (
        SELECT b.doc_id, b.pos,
               b.pos - row_number() OVER (
                   PARTITION BY b.doc_id ORDER BY b.pos) AS grp
        FROM bsh b JOIN csh c USING (shingle)
    ),
    spans AS (
        SELECT doc_id, count(*) AS n_pos, min(pos) AS p0, max(pos) AS p1
        FROM dup GROUP BY doc_id, grp
    )
    SELECT doc_id AS batch_id,
           CAST(count(*) AS BIGINT) AS n_spans,
           CAST(max(p1 - p0 + 5) AS BIGINT) AS max_span_words,
           CAST(sum(n_pos) AS BIGINT) AS dup_shingles
    FROM spans GROUP BY doc_id
    """,
)
def substring_dup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental batch-vs-corpus EXACT SUBSTRING dedup
    (operators/incremental_substring.py): the corpus' positional
    shingle index is persisted ONCE in a SnapshotStore bucketed by
    shingle hash; the delta batch (every 10th doc) is shingled
    (O(batch)), probed against the PRUNED bucket slice, and its
    duplicated positions merged into maximal spans — the O(delta)
    nightly form of ``substring_dup_spans``, completing the
    incremental triad (near-dup bands, IVF ANN, substrings).

    The oracle recomputes the same spans from scratch (batch shingles
    joined against the corpus partition's distinct shingle set),
    proving the incremental answer equals the full recompute. Reuse
    across runs is correctness-invariant: the batch merges at
    batch_seq=1 and matching is restricted to strictly earlier
    batches, so a prior run's merged rows are invisible to the next
    run's seq-1 match (replay purity) — byte-identical to a fresh
    store."""
    import hashlib
    import os

    from ..operators.incremental_substring import ShingleSpanStore

    docs = load(spark, sf_dir, "documents")
    corpus = docs.filter(F.col("doc_id") % 10 != 0)
    batch = docs.filter(F.col("doc_id") % 10 == 0)
    fp = _dataset_fingerprint(sf_dir, "documents")
    tag = hashlib.md5(
        f"{os.path.abspath(sf_dir)}|{fp}|shingle|k5|nb32|v2".encode()
    ).hexdigest()[:12]
    path = f"/tmp/spark-graft-shinglestore-{tag}"
    with _store_lock(path):
        store = ShingleSpanStore(spark, path, k=5, num_buckets=32)
        if store.store.current_version() is None:
            store.seed(corpus, "doc_id", "text")
        out = _pin(store.match_and_merge(batch, "doc_id", "text", batch_seq=1))
        store.store.vacuum(keep=2)
    return out


# --------------------------------------------------------------------------
# Join-membership (semi/anti partition) maintenance
# --------------------------------------------------------------------------

_VIEW_JOIN_MEMBERSHIP_ORACLE = """
    WITH fbase AS (
        SELECT o_orderkey, 1 AS v, o_custkey,
               round(o_totalprice + 1e-7, 2) AS price
        FROM orders WHERE o_orderkey % 10 <> 3
    ),
    fdelta AS (
        SELECT o_orderkey, 2 AS v, o_custkey,
               round(o_totalprice + 1000 + 1e-7, 2) AS price
        FROM orders WHERE o_orderkey % 10 IN (3, 7)
    ),
    f2 AS (
        SELECT * FROM fbase WHERE o_orderkey % 10 NOT IN (5, 7)
        UNION ALL
        SELECT * FROM fdelta
    ),
    d2 AS (
        SELECT c_custkey FROM customer WHERE c_custkey % 13 <> 6
    )
    SELECT o_orderkey, v, o_custkey, price,
           CASE WHEN o_custkey IN (SELECT c_custkey FROM d2)
                THEN 1 ELSE 0 END AS matched
    FROM f2
"""


@query("incremental_view_join_membership", oracle=_VIEW_JOIN_MEMBERSHIP_ORACLE)
def incremental_view_join_membership(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """SEMI/ANTI-JOIN PARTITION maintenance
    (operators/ivm.maintain_join_membership): every fact post-state
    row tagged with whether its customer key currently exists in the
    dim store, maintained through a window where BOTH stores changed.
    The matched=0 rows ARE the maintained anti-join — the orphan /
    referential-integrity view the reference recomputes with a full
    NOT-IN rescan every cycle (scanner.py:447-454) — and because the
    view holds BOTH partitions, a dim key's appearance or
    disappearance flips flags on rows the view already owns: zero
    fact rescans in either direction. The cycle's only non-feed input
    is one column-pruned scan of the dim post-state key column (to
    classify brand-new fact keys). The oracle recomputes the
    partition from scratch over the post states, so the hash gate
    proves row-level membership — both partitions, not just counts —
    through fact inserts/updates/deletes AND dim inserts/deletes."""
    from ..operators.ivm import maintain_join_membership

    fact = _cdf_store(
        spark,
        sf_dir,
        layout="manifest",
        dim_col="o_custkey",
        tag_body="orders-cdf-join|nb16",
        path_prefix="cdfjoinstore",
    )
    dim = _dim_cdf_store(spark, sf_dir)
    view = maintain_join_membership(
        fact, dim, 1, 2, fact_key_col="o_custkey", dim_key_col="c_custkey"
    )
    return view.select(
        "o_orderkey",
        "v",
        "o_custkey",
        "price",
        F.col("matched").cast("int").alias("matched"),
    )


def _jm_fact_store(spark: SparkSession, sf_dir: str):
    """Three-version fact store for the CHAINED membership demo: the
    %7 residues partition orders into per-window roles so every code
    path fires across both windows — v2 inserts %7==1 (+111), updates
    %7==2 (+222), deletes %7==3; v3 re-inserts %7==3 (+333, a key the
    view once dropped), updates %7==4 (+444), deletes %7==5."""
    orders = load(spark, sf_dir, "orders")
    r = F.col("o_orderkey") % 7
    row = lambda v, bump: orders.select(  # noqa: E731
        "o_orderkey",
        F.lit(v).alias("v"),
        "o_custkey",
        stable_round(F.col("o_totalprice") + bump, 2).alias("price"),
    )
    base = row(1, 0).filter(r != 1)
    d2 = row(2, 111).filter(r == 1).unionByName(row(2, 222).filter(r == 2))
    rm2 = orders.filter(r == 3).select("o_orderkey")
    d3 = row(3, 333).filter(r == 3).unionByName(row(3, 444).filter(r == 4))
    rm3 = orders.filter(r == 5).select("o_orderkey")
    return _demo_store(
        spark,
        sf_dir,
        name="jmfact",
        key="o_orderkey",
        num_buckets=16,
        frames=[("seed", base, None), (1, d2, rm2), (2, d3, rm3)],
        fp_tables=("orders",),
    )


def _jm_dim_store(spark: SparkSession, sf_dir: str):
    """Three-version dim store for the chained membership demo: key
    existence churns both ways across both windows — v2 inserts the
    %5==1 keys and deletes %5==2; v3 re-inserts %5==2 (keys whose
    orphans the view created in window 1 must flip back) and deletes
    %5==3."""
    cust = load(spark, sf_dir, "customer").select("c_custkey")
    m = F.col("c_custkey") % 5
    tag = lambda v, pred: cust.filter(pred).select(  # noqa: E731
        "c_custkey", F.lit(v).alias("v")
    )
    return _demo_store(
        spark,
        sf_dir,
        name="jmdim",
        key="c_custkey",
        num_buckets=8,
        frames=[
            ("seed", tag(1, m != 1), None),
            (1, tag(2, m == 1), cust.filter(m == 2).select("c_custkey")),
            (2, tag(3, m == 2), cust.filter(m == 3).select("c_custkey")),
        ],
        fp_tables=("customer",),
    )


_VIEW_JM_CHAINED_ORACLE = """
    WITH f3 AS (
        SELECT o_orderkey,
               CASE WHEN o_orderkey % 7 IN (0, 6) THEN 1
                    WHEN o_orderkey % 7 IN (1, 2) THEN 2
                    ELSE 3 END AS v,
               o_custkey,
               round(o_totalprice
                     + CASE o_orderkey % 7
                           WHEN 1 THEN 111 WHEN 2 THEN 222
                           WHEN 3 THEN 333 WHEN 4 THEN 444
                           ELSE 0 END + 1e-7, 2) AS price
        FROM orders WHERE o_orderkey % 7 <> 5
    ),
    d3 AS (SELECT c_custkey FROM customer WHERE c_custkey % 5 <> 3)
    SELECT o_orderkey, v, o_custkey, price,
           CASE WHEN o_custkey IN (SELECT c_custkey FROM d3)
                THEN 1 ELSE 0 END AS matched
    FROM f3
"""


@query(
    "incremental_view_join_membership_chained",
    oracle=_VIEW_JM_CHAINED_ORACLE,
)
def incremental_view_join_membership_chained(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """STEADY-STATE join-membership maintenance: two consecutive
    windows against dedicated three-version fact/dim stores, window 2
    consuming window 1's OUTPUT as ``old_view`` — after the first
    derivation the fact base is never read again; each cycle touches
    the two feeds plus the dim key column. The residue design makes
    the chain unfakeable: %5==2 customers vanish in window 1 (their
    orders become orphans inside the maintained view) and return in
    window 2 (those same rows must flip back), while %7==3 orders are
    deleted then RE-INSERTED with a new price — a row the view once
    dropped re-entering through the add path. The oracle recomputes
    the v3 partition from scratch; the hash gate proves two chained
    maintenance cycles land bit-exactly on the rejoin."""
    from ..operators.ivm import maintain_join_membership

    fact = _jm_fact_store(spark, sf_dir)
    dim = _jm_dim_store(spark, sf_dir)
    w1 = maintain_join_membership(
        fact, dim, 1, 2, fact_key_col="o_custkey", dim_key_col="c_custkey"
    )
    w2 = maintain_join_membership(
        fact,
        dim,
        2,
        3,
        fact_key_col="o_custkey",
        dim_key_col="c_custkey",
        old_view=w1,
    )
    return w2.select(
        "o_orderkey",
        "v",
        "o_custkey",
        "price",
        F.col("matched").cast("int").alias("matched"),
    )


# --------------------------------------------------------------------------
# Hierarchical rollup cascade (day -> month) maintenance
# --------------------------------------------------------------------------

def _cascade_store(spark: SparkSession, sf_dir: str):
    """CDF demo store carrying a DATE grain column: the standard
    demo window (base = orders minus %10==3; v2 inserts %10==3 and
    updates %10==7 with the price bumped, deletes %10==5) with each
    row's ``day`` = CAST(o_orderdate AS DATE) and the price in
    integer cents (exact sums through the cascade)."""
    orders = load(spark, sf_dir, "orders")
    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    row = lambda v, bump: orders.select(  # noqa: E731
        "o_orderkey",
        F.lit(v).alias("v"),
        F.to_date("o_orderdate").alias("day"),
        (cents + F.lit(bump)).alias("cents"),
    )
    base = row(1, 0).filter(F.col("o_orderkey") % 10 != 3)
    delta = row(2, 100000).filter((F.col("o_orderkey") % 10).isin(3, 7))
    removed = orders.filter(F.col("o_orderkey") % 10 == 5).select("o_orderkey")
    return _demo_store(
        spark,
        sf_dir,
        name="cascstore",
        key="o_orderkey",
        num_buckets=16,
        frames=[("seed", base, None), (1, delta, removed)],
        fp_tables=("orders",),
    )


_VIEW_CASCADE_ORACLE = """
    WITH base AS (
        SELECT o_orderkey, CAST(o_orderdate AS DATE) AS day,
               CAST(round(o_totalprice * 100) AS BIGINT) AS cents
        FROM orders WHERE o_orderkey % 10 <> 3
    ),
    delta AS (
        SELECT o_orderkey, CAST(o_orderdate AS DATE) AS day,
               CAST(round(o_totalprice * 100) AS BIGINT) + 100000 AS cents
        FROM orders WHERE o_orderkey % 10 IN (3, 7)
    ),
    v2 AS (
        SELECT * FROM base WHERE o_orderkey % 10 NOT IN (5, 7)
        UNION ALL
        SELECT * FROM delta
    ),
    byday AS (
        SELECT day AS grain, CAST(count(*) AS BIGINT) AS n_rows,
               CAST(sum(cents) AS BIGINT) AS s_cents
        FROM v2 GROUP BY day
    )
    SELECT 'day' AS level, grain, n_rows,
           round(s_cents / 100.0 + 1e-7, 2) AS total_price
    FROM byday
    UNION ALL
    SELECT 'month' AS level, CAST(date_trunc('month', grain) AS DATE),
           CAST(sum(n_rows) AS BIGINT),
           round(sum(s_cents) / 100.0 + 1e-7, 2)
    FROM byday GROUP BY date_trunc('month', grain)
"""


@query("incremental_view_rollup_cascade", oracle=_VIEW_CASCADE_ORACLE)
def incremental_view_rollup_cascade(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """HIERARCHICAL rollup maintenance
    (operators/ivm.maintain_rollup_cascade): per-day AND per-month
    (count, revenue) views maintained from one change feed, where the
    month level consumes the DAY LEVEL'S DELTA — the feed is
    aggregated exactly once, each coarser level costs O(changed
    groups at the level below), and neither level ever rescans the
    base. This is the composition law behind every
    hour→day→month→year dashboard tree at 100 TB: a merge touching
    one day's rows costs O(feed) once plus O(1) per coarser level,
    not one rescan per level (the reference recomputes its whole
    directory-size tree per scan — directory_size.py:39-60).

    The oracle recomputes both grains from the post state from
    scratch; the hash gate proves the cascaded deltas land bit-exactly
    on both levels — counts and cent-exact sums — through inserts,
    updates and deletes."""
    from ..operators.ivm import maintain_rollup_cascade

    store = _cascade_store(spark, sf_dir)
    fine, coarse = maintain_rollup_cascade(
        store,
        1,
        2,
        fine_col="day",
        coarse_col="month",
        coarse_of=lambda d: F.trunc(d, "month"),
        value_col="cents",
    )
    out = lambda df, lvl, grain: df.select(  # noqa: E731
        F.lit(lvl).alias("level"),
        F.col(grain).alias("grain"),
        F.col("n").alias("n_rows"),
        stable_round(F.col("s") / 100.0, 2).alias("total_price"),
    )
    return out(fine, "day", "day").unionByName(
        out(coarse, "month", "month")
    )


# --------------------------------------------------------------------------
# Incremental connected components over a maintained edge store
# --------------------------------------------------------------------------

def _cc_chain_frames(spark: SparkSession, sf_dir: str):
    """Deterministic chain graph over the orders row sequence: node i
    = rank of o_orderkey (1..N), edge i = (i, i+1). v1 drops the
    century edges (i%100==0 — permanent component boundaries) and the
    %10==3 edges (healable holes); the v2 window RE-ADDS the %10==3
    edges (merging fragments) and DELETES the %50==17 edges (new
    splits) — both maintenance directions in one window.

    The ids are just 1..N: ``rank of o_orderkey`` over a table whose
    key is UNIQUE is, as a SET, exactly {1..count(orders)} — and every
    downstream consumer (node universe, chain edges, the oracle's
    labeling) depends only on the id VALUES, never on which orderkey
    maps to which rank. Earlier rounds derived the ranks
    distributively (range-repartition + per-partition window + a
    per-partition-counts collect + broadcast offset join — the r12
    verdict #4 fix for the global-window version); optimization round
    r15 removed that machinery outright (guide §1.2 step 1: don't
    compute what the result doesn't depend on): one count() action
    pins N, ``spark.range`` emits the ids with no shuffle, no window,
    no collect — per invocation, and bench pays this three times
    (1 cold + 2 warm). Output rows are identical by the set argument
    above; the oracle hash gate pins it."""
    cnt = load(spark, sf_dir, "orders").count()
    nodes = spark.range(1, cnt + 1).select(F.col("id").alias("node"))
    e = spark.range(1, cnt).select(
        F.col("id").alias("eid"),
        F.col("id").alias("u"),
        (F.col("id") + 1).alias("vtx"),
    )
    tag = lambda df, v: df.select(  # noqa: E731
        "eid", F.lit(v).alias("v"), "u", "vtx"
    )
    base = tag(
        e.filter((F.col("eid") % 100 != 0) & (F.col("eid") % 10 != 3)), 1
    )
    adds = tag(
        e.filter((F.col("eid") % 10 == 3) & (F.col("eid") % 100 != 0)), 2
    )
    removed = e.filter(
        (F.col("eid") % 50 == 17) & (F.col("eid") % 100 != 0)
    ).select("eid")
    return nodes, base, adds, removed


def _cc_edge_store(spark: SparkSession, sf_dir: str, frames=None):
    # ``frames``: a prebuilt _cc_chain_frames tuple — the chain
    # construction is EAGER (a per-partition-counts collect + range
    # shuffle), so a caller that also needs the node frame passes its
    # own rather than paying the construction twice per invocation.
    _, base, adds, removed = frames or _cc_chain_frames(spark, sf_dir)
    return _demo_store(
        spark,
        sf_dir,
        name="ccedges",
        key="eid",
        num_buckets=16,
        frames=[("seed", base, None), (1, adds, removed)],
        fp_tables=("orders",),
    )


_INCREMENTAL_CC_ORACLE = """
    WITH RECURSIVE nodes AS (
        SELECT CAST(row_number() OVER (ORDER BY o_orderkey) AS BIGINT) AS rn
        FROM orders
    ),
    mx AS (SELECT max(rn) AS m FROM nodes),
    edges0 AS (
        SELECT rn AS u, rn + 1 AS v FROM nodes, mx
        WHERE rn < m AND rn % 100 <> 0 AND rn % 50 <> 17
    ),
    sym AS (SELECT u, v FROM edges0 UNION SELECT v, u FROM edges0),
    reach(node, label) AS (
        SELECT rn, rn FROM nodes
        UNION
        SELECT s.v, r.label FROM reach r JOIN sym s ON s.u = r.node
    ),
    cc AS (SELECT node, min(label) AS cluster FROM reach GROUP BY node)
    SELECT node, cluster,
           count(*) OVER (PARTITION BY cluster) AS cluster_size
    FROM cc
"""


@query("dedup_incremental_cc", oracle=_INCREMENTAL_CC_ORACLE)
def dedup_incremental_cc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INCREMENTAL connected components
    (operators/dedup.maintain_connected_components): the near-dup
    cluster labeling maintained across one edge-store window that
    both ADDS edges (the %10==3 holes heal — fragments merge at
    CLUSTER grain, an O(feed) contraction over cluster ids) and
    DELETES edges (the %50==17 cuts — every post-merge cluster
    containing a cut recomputes from its own post-state edges via a
    semi-join-pruned subgraph CC, the affected-set contract of the
    other IVM recompute branches; splits are the direction no label
    algebra can answer locally). Isolated nodes remain singleton
    clusters — a document is its own cluster until merged.

    At 100 TB the similarity graph is maintained, not rebuilt: LSH
    batches append edges (merge-only — the cheap direction), and
    retention/tombstones delete them (paying only the affected
    components). The oracle recomputes the labeling from the
    post-state edge set with a recursive min-label-reachability CTE,
    so the hash gate proves merge relabels, split relabels, sizes and
    untouched clusters all land exactly."""
    from ..operators.dedup import maintain_connected_components
    from pyspark.sql import Window

    frames = _cc_chain_frames(spark, sf_dir)
    store = _cc_edge_store(spark, sf_dir, frames)
    nodes = frames[0]
    labels = maintain_connected_components(
        store, 1, 2, src="u", dst="vtx", nodes=nodes
    )
    return labels.select(
        "node",
        "cluster",
        F.count(F.lit(1))
        .over(Window.partitionBy("cluster"))
        .alias("cluster_size"),
    )


# --------------------------------------------------------------------------
# Maintained count-min sketch (turnstile — the delete-capable sketch)
# --------------------------------------------------------------------------

_VIEW_CMS_DEPTH = 4
_VIEW_CMS_WIDTH = 256
_VIEW_CMS_TOPK = 10


def _view_cms_bucket_sql(d: str, key: str) -> str:
    return (
        f"(('0x' || substr(md5('cms' || {d}::VARCHAR || ':' || {key}::VARCHAR),"
        f" 1, 8))::BIGINT % {_VIEW_CMS_WIDTH})"
    )


_VIEW_CMS_ORACLE = f"""
    WITH fbase AS (
        SELECT o_orderkey, o_custkey FROM orders WHERE o_orderkey % 10 <> 3
    ),
    fdelta AS (
        SELECT o_orderkey, o_custkey FROM orders
        WHERE o_orderkey % 10 IN (3, 7)
    ),
    f2 AS (
        SELECT * FROM fbase WHERE o_orderkey % 10 NOT IN (5, 7)
        UNION ALL
        SELECT * FROM fdelta
    ),
    cells AS (
        SELECT d, {_view_cms_bucket_sql("d", "o_custkey")} AS bucket,
               count(*) AS cnt
        FROM f2, range({_VIEW_CMS_DEPTH}) r(d)
        GROUP BY 1, 2
    ),
    exact AS (
        SELECT o_custkey, count(*) AS exact_cnt FROM f2 GROUP BY o_custkey
        ORDER BY exact_cnt DESC, o_custkey LIMIT {_VIEW_CMS_TOPK}
    ),
    probe AS (
        SELECT o_custkey, exact_cnt, d,
               {_view_cms_bucket_sql("d", "o_custkey")} AS bucket
        FROM exact, range({_VIEW_CMS_DEPTH}) r(d)
    )
    SELECT p.o_custkey AS custkey,
           CAST(p.exact_cnt AS BIGINT) AS exact_cnt,
           CAST(min(c.cnt) AS BIGINT) AS est_cnt,
           min(c.cnt) >= p.exact_cnt AS overestimate_ok
    FROM probe p JOIN cells c USING (d, bucket)
    GROUP BY p.o_custkey, p.exact_cnt
"""


@query("incremental_view_cms_topk", oracle=_VIEW_CMS_ORACLE)
def incremental_view_cms_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MAINTAINED count-min sketch (operators/ivm.maintain_cms), read
    back at the post-state top-10 customers: per-key
    order counts estimated from a 4x256
    cell frame maintained through the CDF window's inserts, updates
    AND deletes — CMS is a turnstile linear sketch (cells are sums),
    so removals subtract exactly where the HLL view
    (incremental_view_hll_distinct) must refuse them. The oracle
    rebuilds the sketch from the post state from scratch: a hash
    match proves maintained cells equal rebuilt cells BIT-EXACTLY, so
    maintenance costs the sketch nothing beyond its own approximation,
    and the one-sided guarantee (est >= exact, pinned as a column)
    survives maintenance. The exact top-k exists only to grade the
    sketch (the ann_recall_at_k discipline); state is O(depth x
    width) KB regardless of key-space size — the 100 TB heavy-hitter
    shape."""
    from ..operators.ivm import cms_bucket, maintain_cms

    store = _cdf_store(
        spark,
        sf_dir,
        layout="manifest",
        dim_col="o_custkey",
        tag_body="orders-cdf-join|nb16",
        path_prefix="cdfjoinstore",
    )
    cells = maintain_cms(
        store, 1, 2, "o_custkey",
        depth=_VIEW_CMS_DEPTH, width=_VIEW_CMS_WIDTH,
    )
    depths = F.array(
        *[F.lit(d).cast("long") for d in range(_VIEW_CMS_DEPTH)]
    )
    exact = (
        store.read(version=2)
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("exact_cnt"))
        .orderBy(F.col("exact_cnt").desc(), F.col("o_custkey"))
        .limit(_VIEW_CMS_TOPK)
    )
    probe = exact.select(
        "o_custkey", "exact_cnt", F.explode(depths).alias("d")
    ).withColumn(
        "bucket", cms_bucket(F.col("d"), F.col("o_custkey"), _VIEW_CMS_WIDTH)
    )
    return (
        F.broadcast(probe)
        .join(cells, ["d", "bucket"])
        .groupBy("o_custkey", "exact_cnt")
        .agg(F.min("cnt").alias("est_cnt"))
        .select(
            F.col("o_custkey").alias("custkey"),
            F.col("exact_cnt").cast("long").alias("exact_cnt"),
            F.col("est_cnt").cast("long").alias("est_cnt"),
            (F.col("est_cnt") >= F.col("exact_cnt")).alias("overestimate_ok"),
        )
    )


# --------------------------------------------------------------------------
# Maintained deterministic stratified sample (top-k over md5 rank)
# --------------------------------------------------------------------------

_SAMPLE_K = 20


def _sample_store(spark: SparkSession, sf_dir: str):
    """CDF demo store carrying a deterministic RANK KEY: rkey =
    md5('smp:' || key) || ':' || key — md5-uniform order with the key
    recoverable from the value (fixed-width hex prefix, key tiebreak
    exact). Standard demo window: %10==3 inserts, %10==7 updates
    (same rkey — an in-place update of a sample member lands exactly
    ON the horizon and exercises the recompute branch), %10==5
    deletes."""
    orders = load(spark, sf_dir, "orders")
    rkey = F.concat(
        F.md5(F.concat(F.lit("smp:"), F.col("o_orderkey").cast("string"))),
        F.lit(":"),
        F.col("o_orderkey").cast("string"),
    )
    row = lambda v: orders.select(  # noqa: E731
        "o_orderkey",
        F.lit(v).alias("v"),
        "o_orderstatus",
        rkey.alias("rkey"),
    )
    base = row(1).filter(F.col("o_orderkey") % 10 != 3)
    delta = row(2).filter((F.col("o_orderkey") % 10).isin(3, 7))
    removed = orders.filter(F.col("o_orderkey") % 10 == 5).select("o_orderkey")
    return _demo_store(
        spark,
        sf_dir,
        name="smpstore",
        key="o_orderkey",
        num_buckets=16,
        frames=[("seed", base, None), (1, delta, removed)],
        fp_tables=("orders",),
    )


_VIEW_SAMPLE_ORACLE = f"""
    WITH v2 AS (
        SELECT o_orderkey, o_orderstatus FROM orders
        WHERE o_orderkey % 10 <> 5
    ),
    r AS (
        SELECT o_orderstatus,
               md5('smp:' || o_orderkey::VARCHAR)
                   || ':' || o_orderkey::VARCHAR AS sv,
               row_number() OVER (
                   PARTITION BY o_orderstatus
                   ORDER BY md5('smp:' || o_orderkey::VARCHAR)
                            || ':' || o_orderkey::VARCHAR DESC
               ) AS rk
        FROM v2
    )
    SELECT o_orderstatus, rk,
           CAST(split_part(sv, ':', 2) AS BIGINT) AS o_orderkey
    FROM r WHERE rk <= {_SAMPLE_K}
"""


@query("incremental_view_sample", oracle=_VIEW_SAMPLE_ORACLE)
def incremental_view_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MAINTAINED deterministic stratified sample: the top-20
    rows per o_orderstatus by md5 hash rank, maintained through the
    CDF window's inserts, updates and deletes — maintain_top_k
    composed over a hash rank key instead of a price. This is the
    stable-held-out-subset shape a training pipeline needs: the
    sample is reproducible across engines (md5 hex order is byte
    order), UNIFORM per stratum, and under corpus churn it updates in
    O(feed) — an insert whose hash beats the horizon enters the
    sample algebraically, a departing member triggers exactly one
    group-pruned recompute, and untouched strata never move (unlike
    rerunning TABLESAMPLE, which reshuffles the whole selection every
    cycle). The rank value carries the key itself (fixed-width hex
    prefix + ':' + key) so membership is recoverable without a
    second join; the oracle re-ranks the post state from scratch.
    Note v2 = base minus %10==5: the %10==3 'inserts' and %10==7
    'updates' carry the same rkey as the raw table (rkey is a pure
    key function), so the post-state sample equals the raw rank over
    the surviving keys — which is exactly what makes in-place updates
    land ON the horizon and exercise the tie-recompute path."""
    from ..operators.ivm import maintain_top_k

    store = _sample_store(spark, sf_dir)
    view = maintain_top_k(store, 1, 2, ["o_orderstatus"], "rkey", _SAMPLE_K)
    return view.select(
        "o_orderstatus", F.posexplode("topk").alias("_pos", "sv")
    ).select(
        "o_orderstatus",
        (F.col("_pos") + 1).cast("long").alias("rk"),
        F.split(F.col("sv"), ":").getItem(1).cast("long").alias("o_orderkey"),
    )


# --------------------------------------------------------------------------
# Three-table joined IVM (snowflake arm, all three stores changing)
# --------------------------------------------------------------------------

def _nation_cdf_store(spark: SparkSession, sf_dir: str):
    """Second-dim CDC store over ``nation``: v1 = nation minus the
    %7==2 keys (region as generated); the v2 window RE-INSERTS the
    %7==2 keys, RE-REGIONS the %5==3 keys (region -> (region+2)%5 —
    a key that is both re-enters already moved) and DELETES the
    %7==4-and-not-%5==3 keys (the exclusion keeps one key from being
    both re-regioned and removed in one window)."""
    nat = load(spark, sf_dir, "nation").select(
        F.col("n_nationkey"), F.col("n_regionkey")
    )
    k = F.col("n_nationkey")
    moved = F.when(
        k % 5 == 3, (F.col("n_regionkey") + 2) % 5
    ).otherwise(F.col("n_regionkey"))
    base = nat.filter(k % 7 != 2).select(
        "n_nationkey", F.lit(1).alias("v"), F.col("n_regionkey").alias("region")
    )
    delta = nat.filter((k % 7 == 2) | (k % 5 == 3)).select(
        "n_nationkey", F.lit(2).alias("v"), moved.alias("region")
    )
    removed = nat.filter((k % 7 == 4) & (k % 5 != 3)).select("n_nationkey")
    return _demo_store(
        spark,
        sf_dir,
        name="nationcdf",
        key="n_nationkey",
        num_buckets=4,
        frames=[("seed", base, None), (1, delta, removed)],
        fp_tables=("nation",),
    )


_VIEW_JOINED3_ORACLE = """
    WITH fbase AS (
        SELECT o_orderkey, o_custkey,
               round(o_totalprice + 1e-7, 2) AS price
        FROM orders WHERE o_orderkey % 10 <> 3
    ),
    fdelta AS (
        SELECT o_orderkey, o_custkey,
               round(o_totalprice + 1000 + 1e-7, 2) AS price
        FROM orders WHERE o_orderkey % 10 IN (3, 7)
    ),
    f2 AS (
        SELECT * FROM fbase WHERE o_orderkey % 10 NOT IN (5, 7)
        UNION ALL
        SELECT * FROM fdelta
    ),
    d2 AS (
        SELECT c_custkey,
               CASE WHEN c_custkey % 13 = 4
                    THEN (c_nationkey + 7) % 25
                    ELSE c_nationkey END AS c_nationkey
        FROM customer WHERE c_custkey % 13 <> 6
    ),
    n2 AS (
        SELECT n_nationkey,
               CASE WHEN n_nationkey % 5 = 3
                    THEN (n_regionkey + 2) % 5
                    ELSE n_regionkey END AS region
        FROM nation
        WHERE NOT (n_nationkey % 7 = 4 AND n_nationkey % 5 <> 3)
    )
    SELECT region,
           CAST(count(*) AS BIGINT) AS n_orders,
           round(sum(CAST(round(price * 100) AS BIGINT)) / 100.0 + 1e-7, 2)
               AS total_price
    FROM f2
    JOIN d2 ON o_custkey = c_custkey
    JOIN n2 ON c_nationkey = n_nationkey
    GROUP BY region
"""


@query("incremental_view_joined3", oracle=_VIEW_JOINED3_ORACLE)
def incremental_view_joined3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """THREE-TABLE joined-view maintenance
    (operators/ivm.maintain_joined3_agg): per-region (count, revenue)
    over orders ⋈ customer ⋈ nation with ALL THREE stores changing in
    the window — fact inserts/updates/deletes, customers inserted/
    re-nationed/deleted, nations inserted/re-regioned/deleted — by
    the telescoping decomposition ΔF⋈C1⋈N1 + F2⋈ΔC⋈N1 + F2⋈C2⋈ΔN.
    Every term is delta-bound: the fact is read only under semi-joins
    of each dim's changed keys, the dim2 term filters the post-state
    customer side to the changed nations FIRST, and the n-table
    generalization is the same ladder (pre-state factors left of the
    changed one, post-state right). The oracle rejoins the three post
    states from scratch — a hash match proves the three-term algebra
    lands exactly through every churn direction at once. Reference
    parity: the maintained form of the reference's 3-way
    files × direct_links × directory_sizes join
    (direct_links.py:194-260, recomputed per scan there)."""
    from ..operators.ivm import maintain_joined3_agg

    fact = _cdf_store(
        spark,
        sf_dir,
        layout="manifest",
        dim_col="o_custkey",
        tag_body="orders-cdf-join|nb16",
        path_prefix="cdfjoinstore",
    )
    dim1 = _dim_cdf_store(spark, sf_dir)
    dim2 = _nation_cdf_store(spark, sf_dir)
    view = maintain_joined3_agg(
        fact,
        dim1,
        dim2,
        1,
        2,
        fact_key_col="o_custkey",
        dim1_key_col="c_custkey",
        dim1_attr_col="c_nationkey",
        dim2_key_col="n_nationkey",
        group_col="region",
    )
    return view.select(
        "region",
        F.col("n").alias("n_orders"),
        stable_round(F.col("s") / 100.0, 2).alias("total_price"),
    )


_VIEW_JOINED_TOPK_ORACLE = """
    WITH fbase AS (
        SELECT o_orderkey, o_custkey,
               round(o_totalprice + 1e-7, 2) AS price
        FROM orders WHERE o_orderkey % 10 <> 3
    ),
    fdelta AS (
        SELECT o_orderkey, o_custkey,
               round(o_totalprice + 1000 + 1e-7, 2) AS price
        FROM orders WHERE o_orderkey % 10 IN (3, 7)
    ),
    f2 AS (
        SELECT * FROM fbase WHERE o_orderkey % 10 NOT IN (5, 7)
        UNION ALL
        SELECT * FROM fdelta
    ),
    d2 AS (
        SELECT c_custkey,
               CASE WHEN c_custkey % 13 = 4
                    THEN (c_nationkey + 7) % 25
                    ELSE c_nationkey END AS c_nationkey
        FROM customer WHERE c_custkey % 13 <> 6
    ),
    r AS (
        SELECT c_nationkey,
               CAST(round(price * 100) AS BIGINT) AS cents,
               row_number() OVER (
                   PARTITION BY c_nationkey
                   ORDER BY CAST(round(price * 100) AS BIGINT) DESC
               ) AS rk
        FROM f2 JOIN d2 ON o_custkey = c_custkey
    )
    SELECT c_nationkey, rk, round(cents / 100.0 + 1e-7, 2) AS price
    FROM r WHERE rk <= 5
"""


@query("incremental_view_joined_topk", oracle=_VIEW_JOINED_TOPK_ORACLE)
def incremental_view_joined_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The LAST cell of the composition matrix
    (operators/ivm.maintain_joined_top_k): per-nation TOP-5 order
    prices over orders ⋈ customer with BOTH stores changing — count/
    sum ride the two-term decomposition, the k-deep extremum rides
    the horizon rule, and dim moves carry candidates IN (a re-nationed
    customer's post-state values enter the destination array, deduped
    against the fact feed's own post-images — arrays, unlike min/max,
    are not idempotent) and force recomputes OUT (a departed key may
    have held any of its old group's top-k). The demo window retires
    top prices via %10==5 mass deletes, beats horizons via the
    %10==3/7 price bumps, and re-nations the %13==4 customers, so
    every branch runs on real data; the oracle re-ranks the
    post-state join from scratch — membership, order and counts land
    exactly."""
    from ..operators.ivm import maintain_joined_top_k

    fact = _cdf_store(
        spark,
        sf_dir,
        layout="manifest",
        dim_col="o_custkey",
        tag_body="orders-cdf-join|nb16",
        path_prefix="cdfjoinstore",
    )
    dim = _dim_cdf_store(spark, sf_dir)
    view = maintain_joined_top_k(
        fact,
        dim,
        1,
        2,
        fact_key_col="o_custkey",
        dim_key_col="c_custkey",
        group_col="c_nationkey",
        k=5,
    )
    return view.select(
        "c_nationkey", F.posexplode("topk").alias("_pos", "cents")
    ).select(
        "c_nationkey",
        (F.col("_pos") + 1).cast("long").alias("rk"),
        stable_round(F.col("cents") / 100.0, 2).alias("price"),
    )


# --------------------------------------------------------------------------
# Maintained dyadic count-min rank sketch (turnstile quantiles)
# --------------------------------------------------------------------------

_DCMS_LEVELS = 12  # value domain [0, 4096)
_DCMS_DEPTH = 3
_DCMS_WIDTH = 128
_DCMS_PROBES = (512, 1024, 2048, 3000)


def _dcms_bucket_sql(lvl: str, d: str, node: str) -> str:
    return (
        f"(('0x' || substr(md5('dcms' || {lvl}::VARCHAR || ':' || "
        f"{d}::VARCHAR || ':' || {node}::VARCHAR), 1, 8))::BIGINT "
        f"% {_DCMS_WIDTH})"
    )


_VIEW_DCMS_ORACLE = f"""
    WITH fbase AS (
        SELECT o_orderkey, round(o_totalprice + 1e-7, 2) AS price
        FROM orders WHERE o_orderkey % 10 <> 3
    ),
    fdelta AS (
        SELECT o_orderkey, round(o_totalprice + 1000 + 1e-7, 2) AS price
        FROM orders WHERE o_orderkey % 10 IN (3, 7)
    ),
    f2 AS (
        SELECT price FROM fbase WHERE o_orderkey % 10 NOT IN (5, 7)
        UNION ALL
        SELECT price FROM fdelta
    ),
    vals AS (
        SELECT CAST(floor(price) AS BIGINT) % 4096 AS val FROM f2
    ),
    cells AS (
        SELECT lvl, d,
               {_dcms_bucket_sql("lvl", "d", "(val // (1 << lvl))")} AS bucket,
               count(*) AS cnt
        FROM vals, range({_DCMS_LEVELS}) l(lvl), range({_DCMS_DEPTH}) r(d)
        GROUP BY 1, 2, 3
    ),
    probes AS (SELECT unnest([{", ".join(str(p) for p in _DCMS_PROBES)}]) AS x),
    decomp AS (
        SELECT p.x, b.b,
               (p.x // (1 << (b.b + 1))) * 2 AS node,
               r.d
        FROM probes p, range({_DCMS_LEVELS}) b(b), range({_DCMS_DEPTH}) r(d)
        WHERE (p.x // (1 << b.b)) % 2 = 1
    ),
    node_est AS (
        SELECT dc.x, dc.b, dc.node,
               min(coalesce(c.cnt, 0)) AS node_cnt
        FROM decomp dc
        LEFT JOIN cells c
          ON c.lvl = dc.b AND c.d = dc.d
         AND c.bucket = {_dcms_bucket_sql("dc.b", "dc.d", "dc.node")}
        GROUP BY dc.x, dc.b, dc.node
    ),
    est AS (
        SELECT x, CAST(sum(node_cnt) AS BIGINT) AS est_rank
        FROM node_est GROUP BY x
    ),
    exact AS (
        SELECT p.x,
               CAST((SELECT count(*) FROM vals v WHERE v.val < p.x) AS BIGINT)
                   AS exact_rank
        FROM probes p
    )
    SELECT e.x AS probe, e.exact_rank, s.est_rank,
           s.est_rank >= e.exact_rank AS overestimate_ok
    FROM exact e JOIN est s USING (x)
"""


@query("incremental_view_quantile_sketch", oracle=_VIEW_DCMS_ORACLE)
def incremental_view_quantile_sketch(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """MAINTAINED dyadic count-min RANK sketch
    (operators/ivm.maintain_dyadic_cms) — the turnstile
    quantile/rank complement closing the sketch family: the HLL view
    counts distincts (insert-only), the flat CMS view counts per-key
    frequencies, the exact histogram serves exact quantiles at
    O(distinct) state — this serves approximate RANKS (and hence
    quantiles, by binary search over the same reads) at O(levels ×
    depth × width) state with DELETES subtracting exactly, per
    Cormode-Muthukrishnan's dyadic decomposition: one CMS per level
    of value//2^lvl nodes; rank(x) = sum of min-over-depth reads
    along the ≤levels dyadic nodes of [0, x).

    Maintained through the CDF window's inserts, updates AND deletes
    (value = floor(price) mod 4096 — prices move by the window's
    +1000 bump, so values genuinely migrate between dyadic nodes);
    the oracle rebuilds the sketch from the post state from scratch
    AND re-derives the same four rank probes, so the hash match
    proves (a) maintained cells equal rebuilt cells through the
    delta algebra and (b) the served ranks preserve the one-sided
    guarantee (est >= exact, pinned as a column). Exact ranks are
    computed as conditional aggregates (no join, no global window).
    100 TB: state is KBs regardless of row count; maintenance is one
    O(feed × levels × depth) signed aggregation per cycle."""
    from ..operators.ivm import dyadic_rank_probe, maintain_dyadic_cms

    store = _cdf_store(
        spark,
        sf_dir,
        layout="manifest",
        dim_col="o_custkey",
        tag_body="orders-cdf-join|nb16",
        path_prefix="cdfjoinstore",
    )
    val = (F.floor(F.col("price")).cast("long") % 4096).alias("_val")
    cells = maintain_dyadic_cms(
        store,
        1,
        2,
        F.floor(F.col("price")).cast("long") % 4096,
        levels=_DCMS_LEVELS,
        depth=_DCMS_DEPTH,
        width=_DCMS_WIDTH,
    )
    # Exact ranks via conditional aggregation — one row, no join.
    post_vals = store.read(version=2).select(val)
    exact_row = post_vals.agg(
        *[
            F.sum(F.when(F.col("_val") < p, 1).otherwise(0))
            .cast("long")
            .alias(f"_r{p}")
            for p in _DCMS_PROBES
        ]
    )
    stack_expr = ", ".join(f"{p}, _r{p}" for p in _DCMS_PROBES)
    exact = exact_row.select(
        F.expr(
            f"stack({len(_DCMS_PROBES)}, {stack_expr}) AS (probe, exact_rank)"
        )
    ).select(F.col("probe").cast("long"), F.col("exact_rank").cast("long"))
    # Executor-side rank serving (operators/ivm.dyadic_rank_probe —
    # r14: the shared serve the grouped/high-cardinality twins use;
    # cells broadcast because a single sketch is KBs by construction).
    return dyadic_rank_probe(
        cells,
        exact,
        levels=_DCMS_LEVELS,
        depth=_DCMS_DEPTH,
        width=_DCMS_WIDTH,
        probe_col="probe",
        out_col="est_rank",
        broadcast_cells=True,
    ).select(
        "probe",
        "exact_rank",
        "est_rank",
        (F.col("est_rank") >= F.col("exact_rank")).alias("overestimate_ok"),
    )


@query("ann_ivf_maintain_topk", oracle=ORACLES["similarity_bruteforce_topk"])
def ann_ivf_maintain_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The COMPOSED cell-maintenance POLICY proven content-preserving
    under the driver gate (operators/incremental_ann.IvfIndexStore.
    maintain_cells — r12 gated the split and the merge separately;
    this gates their composition, the exact invocation the streaming
    pipeline's growth-hint/cadence triggers fire): the index seeds
    with 16 centroids minus a slice, add()s the slice as a delta,
    then runs the full policy — split-until-quiesce at the average
    occupancy plus one cold merge at the enforced hysteresis band
    (merge = split//4) — and the search probes EVERY live cell, which
    must return exactly the brute-force cosine top-k. Whatever
    sequence of splits and merges the policy chose for this corpus,
    no vector may be lost, duplicated, or stranded under a retired
    cell id. Seq domains mirror the streaming feeder: seed owns 0,
    the add owns 1, maintenance owns 2.. (one per committed op)."""
    import hashlib
    import os

    from ..operators.incremental_ann import IvfIndexStore

    emb = load(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.transform(F.col("embedding"), lambda x: x.cast("double")).alias(
            "emb"
        ),
    )
    centroids = emb.filter(F.col("vec_id") < 16)
    fp = _dataset_fingerprint(sf_dir, "embeddings")
    tag = hashlib.md5(
        f"{os.path.abspath(sf_dir)}|{fp}|ivfmaint|c16|nb32|v1".encode()
    ).hexdigest()[:12]
    path = f"/tmp/spark-graft-ivfmaintstore-{tag}"
    with _store_lock(path):
        store = IvfIndexStore(spark, path, num_buckets=32)
        if store.store.current_version() is None:
            store.seed(
                emb.filter(F.col("vec_id") % 7 != 0), centroids,
                "vec_id", "emb",
            )
        if store.store.current_version() == 1:
            store.add(
                emb.filter(F.col("vec_id") % 7 == 0), "vec_id", "emb", seq=1
            )
        if store.store.current_version() == 2:
            n = store.store.read(version=2).count()
            thr = max(4, n // 16)
            store.maintain_cells(
                split_threshold=thr, merge_threshold=thr // 4, seq=2
            )
        live_cells = store.centroid_count()
        matches = _pin(
            store.search(
                emb.filter(F.col("vec_id") < 8),
                "vec_id",
                "emb",
                k=3,
                nprobe=live_cells,
            )
        )
        store.store.vacuum(keep=2)
    return matches


_VIEW_DCMS_GROUPED_ORACLE = f"""
    WITH fbase AS (
        SELECT o_orderkey, o_orderstatus,
               round(o_totalprice + 1e-7, 2) AS price
        FROM orders WHERE o_orderkey % 10 <> 3
    ),
    fdelta AS (
        SELECT o_orderkey, o_orderstatus,
               round(o_totalprice + 1000 + 1e-7, 2) AS price
        FROM orders WHERE o_orderkey % 10 IN (3, 7)
    ),
    f2 AS (
        SELECT o_orderstatus, price FROM fbase
        WHERE o_orderkey % 10 NOT IN (5, 7)
        UNION ALL
        SELECT o_orderstatus, price FROM fdelta
    ),
    vals AS (
        SELECT o_orderstatus,
               CAST(floor(price) AS BIGINT) % 4096 AS val
        FROM f2
    ),
    cells AS (
        SELECT o_orderstatus, lvl, d,
               {_dcms_bucket_sql("lvl", "d", "(val // (1 << lvl))")} AS bucket,
               count(*) AS cnt
        FROM vals, range({_DCMS_LEVELS}) l(lvl), range({_DCMS_DEPTH}) r(d)
        GROUP BY 1, 2, 3, 4
    ),
    probes AS (
        SELECT DISTINCT v.o_orderstatus, p.x
        FROM vals v,
             (SELECT unnest([{", ".join(str(p) for p in _DCMS_PROBES)}]) AS x) p
    ),
    decomp AS (
        SELECT p.o_orderstatus, p.x, b.b,
               (p.x // (1 << (b.b + 1))) * 2 AS node,
               r.d
        FROM probes p, range({_DCMS_LEVELS}) b(b), range({_DCMS_DEPTH}) r(d)
        WHERE (p.x // (1 << b.b)) % 2 = 1
    ),
    node_est AS (
        SELECT dc.o_orderstatus, dc.x, dc.b, dc.node,
               min(coalesce(c.cnt, 0)) AS node_cnt
        FROM decomp dc
        LEFT JOIN cells c
          ON c.o_orderstatus = dc.o_orderstatus
         AND c.lvl = dc.b AND c.d = dc.d
         AND c.bucket = {_dcms_bucket_sql("dc.b", "dc.d", "dc.node")}
        GROUP BY dc.o_orderstatus, dc.x, dc.b, dc.node
    ),
    est AS (
        SELECT o_orderstatus, x, CAST(sum(node_cnt) AS BIGINT) AS est_rank
        FROM node_est GROUP BY o_orderstatus, x
    ),
    exact AS (
        SELECT p.o_orderstatus, p.x,
               CAST((SELECT count(*) FROM vals v
                     WHERE v.o_orderstatus = p.o_orderstatus
                       AND v.val < p.x) AS BIGINT) AS exact_rank
        FROM probes p
    )
    SELECT e.o_orderstatus, e.x AS probe, e.exact_rank, s.est_rank,
           s.est_rank >= e.exact_rank AS overestimate_ok
    FROM exact e JOIN est s USING (o_orderstatus, x)
"""


@query(
    "incremental_view_quantile_sketch_grouped",
    oracle=_VIEW_DCMS_GROUPED_ORACLE,
)
def incremental_view_quantile_sketch_grouped(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The GROUPED dyadic rank sketch — one independent turnstile
    quantile sketch PER STRATUM (``maintain_dyadic_cms(group_cols=
    ...)``): the per-language length-quantile shape a curation
    pipeline's banding caps need at 100 TB, maintained through the
    CDF window's inserts, updates and deletes. State is
    O(groups × levels × depth × width) — corpus-size-free per group —
    and maintenance stays ONE signed aggregation (the group columns
    ride the same explode, no extra pass). The oracle rebuilds every
    group's cells from the post state and re-derives the same four
    rank probes per group, pinning the one-sided guarantee
    stratum-by-stratum."""
    from ..operators.ivm import dyadic_rank_probe, maintain_dyadic_cms

    store = _cdf_store(spark, sf_dir, layout="hardlink")
    val = (F.floor(F.col("price")).cast("long") % 4096).alias("_val")
    cells = maintain_dyadic_cms(
        store,
        1,
        2,
        F.floor(F.col("price")).cast("long") % 4096,
        levels=_DCMS_LEVELS,
        depth=_DCMS_DEPTH,
        width=_DCMS_WIDTH,
        group_cols=["o_orderstatus"],
    )
    post_vals = store.read(version=2).select("o_orderstatus", val)
    exact_row = post_vals.groupBy("o_orderstatus").agg(
        *[
            F.sum(F.when(F.col("_val") < p, 1).otherwise(0))
            .cast("long")
            .alias(f"_r{p}")
            for p in _DCMS_PROBES
        ]
    )
    stack_expr = ", ".join(f"{p}, _r{p}" for p in _DCMS_PROBES)
    exact = exact_row.select(
        "o_orderstatus",
        F.expr(
            f"stack({len(_DCMS_PROBES)}, {stack_expr}) AS (probe, exact_rank)"
        ),
    ).select(
        "o_orderstatus",
        F.col("probe").cast("long"),
        F.col("exact_rank").cast("long"),
    )
    # Executor-side rank serving (operators/ivm.dyadic_rank_probe —
    # r14: one shared serve for the flat/grouped/high-cardinality
    # forms; cells still broadcast at 3 strata).
    return dyadic_rank_probe(
        cells,
        exact,
        levels=_DCMS_LEVELS,
        depth=_DCMS_DEPTH,
        width=_DCMS_WIDTH,
        group_cols=["o_orderstatus"],
        probe_col="probe",
        out_col="est_rank",
        broadcast_cells=True,
    ).select(
        "o_orderstatus",
        "probe",
        "exact_rank",
        "est_rank",
        (F.col("est_rank") >= F.col("exact_rank")).alias("overestimate_ok"),
    )


# --------------------------------------------------------------------------
# High-cardinality grouped sketch: DISTRIBUTED per-stratum quantile serving
# --------------------------------------------------------------------------

_HC_STRATA = 1201  # o_custkey % 1201 — ~1,200 live strata at sf0.01
_HC_Q = 0.5
_HC_ARITY = 8  # 2^12 domain in ceil(log8(4096)) = 4 descent rounds


def _hc_rounds() -> int:
    """Same convergence recurrence as dyadic_quantile_serve: interval
    length shrinks to at most ceil(L / arity) per round."""
    rounds, length = 0, 1 << _DCMS_LEVELS
    while length > 1:
        length = -(-length // _HC_ARITY)
        rounds += 1
    return rounds


def _dcms_hc_quantile_oracle() -> str:
    """Generate the DuckDB twin of ``dyadic_quantile_serve(arity=8)``:
    the descent rounds UNROLLED as chained CTEs, each round
    re-deriving every open stratum's arity-1 probe ranks from the
    scratch-rebuilt cells via the same md5 bucket function and
    folding them with the same max-failing/min-succeeding rule — so a
    hash match proves maintained cells == rebuilt cells AND the
    distributed wide-fan descent lands on the identical per-stratum
    quantile. (The probe PATH is part of the served semantics: CMS
    rank estimates are one-sided but not monotone in x, so the twin
    must mirror the exact probes, not just 'a' binary search.)"""
    a = _HC_ARITY
    dmax = (1 << _DCMS_LEVELS) - 1
    rounds = []
    prev = "st0"
    for k in range(1, _hc_rounds() + 1):
        rounds.append(f"""
    pr{k} AS MATERIALIZED (
        SELECT stratum, t, lo, hi, m,
               greatest(least(m + 1, {dmax}), 1) AS x
        FROM (
            SELECT s.stratum, s.t, s.lo, s.hi,
                   least(s.lo - 1 +
                         ((s.hi - s.lo + 1) * ii.i + {a - 1}) // {a},
                         s.hi - 1) AS m
            FROM {prev} s, range(1, {a}) ii(i)
        )
    ),
    dc{k} AS MATERIALIZED (
        SELECT p.stratum, p.m, p.x, b.b,
               (p.x // (1 << (b.b + 1))) * 2 AS node, r.d
        FROM pr{k} p, range({_DCMS_LEVELS}) b(b), range({_DCMS_DEPTH}) r(d)
        WHERE (p.x // (1 << b.b)) % 2 = 1
    ),
    ne{k} AS MATERIALIZED (
        SELECT dc.stratum, dc.m, dc.b, dc.node, min(coalesce(c.cnt, 0)) AS nc
        FROM dc{k} dc
        LEFT JOIN cells c
          ON c.stratum = dc.stratum AND c.lvl = dc.b AND c.d = dc.d
         AND c.bucket = {_dcms_bucket_sql("dc.b", "dc.d", "dc.node")}
        GROUP BY dc.stratum, dc.m, dc.b, dc.node
    ),
    rk{k} AS MATERIALIZED (
        SELECT stratum, m, CAST(sum(nc) AS BIGINT) AS r
        FROM ne{k} GROUP BY stratum, m
    ),
    up{k} AS MATERIALIZED (
        SELECT p.stratum, p.t, p.lo, p.hi,
               max(CASE WHEN r.r < p.t THEN p.m + 1 END) AS nlo,
               min(CASE WHEN r.r >= p.t THEN p.m END) AS nhi
        FROM pr{k} p
        JOIN rk{k} r ON r.stratum = p.stratum AND r.m = p.m
        GROUP BY p.stratum, p.t, p.lo, p.hi
    ),
    st{k} AS MATERIALIZED (
        SELECT stratum, t,
               CASE WHEN lo < hi THEN greatest(lo, coalesce(nlo, lo))
                    ELSE lo END AS lo,
               CASE WHEN lo < hi THEN least(hi, coalesce(nhi, hi))
                    ELSE hi END AS hi
        FROM up{k}
    )""")
        prev = f"st{k}"
    return f"""
    WITH fbase AS (
        SELECT o_orderkey, o_custkey,
               round(o_totalprice + 1e-7, 2) AS price
        FROM orders WHERE o_orderkey % 10 <> 3
    ),
    fdelta AS (
        SELECT o_orderkey, o_custkey,
               round(o_totalprice + 1000 + 1e-7, 2) AS price
        FROM orders WHERE o_orderkey % 10 IN (3, 7)
    ),
    f2 AS (
        SELECT o_custkey, price FROM fbase
        WHERE o_orderkey % 10 NOT IN (5, 7)
        UNION ALL
        SELECT o_custkey, price FROM fdelta
    ),
    vals AS MATERIALIZED (
        SELECT o_custkey % {_HC_STRATA} AS stratum,
               CAST(floor(price) AS BIGINT) % 4096 AS val
        FROM f2
    ),
    cells AS MATERIALIZED (
        SELECT stratum, lvl, d,
               {_dcms_bucket_sql("lvl", "d", "(val // (1 << lvl))")} AS bucket,
               count(*) AS cnt
        FROM vals, range({_DCMS_LEVELS}) l(lvl), range({_DCMS_DEPTH}) r(d)
        GROUP BY 1, 2, 3, 4
    ),
    tot AS MATERIALIZED (
        SELECT stratum, CAST(count(*) AS BIGINT) AS n FROM vals GROUP BY 1
    ),
    st0 AS (
        SELECT stratum, CAST(ceil({_HC_Q} * n) AS BIGINT) AS t,
               CAST(0 AS BIGINT) AS lo,
               CAST({(1 << _DCMS_LEVELS) - 1} AS BIGINT) AS hi
        FROM tot WHERE n > 0
    ),{",".join(rounds)},
    exactq AS (
        SELECT stratum, val AS exact_q FROM (
            SELECT stratum, val,
                   row_number() OVER (PARTITION BY stratum ORDER BY val)
                       AS rn,
                   CAST(ceil({_HC_Q} * count(*)
                        OVER (PARTITION BY stratum)) AS BIGINT) AS t2
            FROM vals
        ) WHERE rn = t2
    )
    SELECT s.stratum, tot.n, s.lo AS qhat, e.exact_q,
           s.lo <= e.exact_q AS underestimate_ok
    FROM st{_hc_rounds()} s
    JOIN tot USING (stratum)
    JOIN exactq e USING (stratum)
"""


class _StratifiedFeed:
    """Thin store adapter adding a DERIVED stratum column to every
    read/changes frame — lets ``maintain_dyadic_cms(group_cols=...)``
    stratify on an expression without materializing it in the stored
    schema (the store is the shared CDF fixture; the stratum is this
    query's view concern, not the table's)."""

    def __init__(self, store, col_fn):
        self._store = store
        self._col_fn = col_fn

    def read(self, version=None):
        return self._store.read(version=version).withColumn(
            "stratum", self._col_fn()
        )

    def read_changes(self, v_from, v_to, update_images="both"):
        return self._store.read_changes(
            v_from, v_to, update_images=update_images
        ).withColumn("stratum", self._col_fn())


@query(
    "incremental_view_sketch_quantiles_hc",
    oracle=_dcms_hc_quantile_oracle(),
)
def incremental_view_sketch_quantiles_hc(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """HIGH-CARDINALITY distributed quantile serving off the grouped
    dyadic rank sketch (r13 verdict #2): ~1,200 strata
    (o_custkey % 1201) each get an independent turnstile sketch
    maintained through the CDF window's inserts/updates/deletes, and
    the per-stratum MEDIAN is served ENTIRELY EXECUTOR-SIDE —
    ``operators/ivm.dyadic_quantile_serve`` runs the binary-search
    descent as ``levels`` chained DataFrame rounds over ALL strata at
    once (each round one rank-probe join pass), collecting nothing to
    the driver (the dict-based ``dyadic_cells_dict`` serve is the
    one-sketch tool; at 10⁴+ strata the cells are a data frame, not
    driver metadata). The oracle rebuilds every stratum's cells from
    the post state and unrolls the SAME twelve descent rounds as
    chained SQL CTEs, so the hash pins maintained-cells == rebuilt
    AND the served quantile per stratum; ``underestimate_ok`` pins
    the one-sided direction (rank est >= true → quantile biased low —
    the conservative side for curation caps). 100 TB: state
    O(strata × levels × depth × width), maintenance one signed
    aggregation, serving O(strata × levels × depth) join rows per
    round × levels rounds, driver O(0)."""
    from pyspark.sql import Window

    from ..operators.ivm import dyadic_quantile_serve, maintain_dyadic_cms

    store = _cdf_store(
        spark,
        sf_dir,
        layout="manifest",
        dim_col="o_custkey",
        tag_body="orders-cdf-join|nb16",
        path_prefix="cdfjoinstore",
    )
    feed = _StratifiedFeed(
        store, lambda: (F.col("o_custkey") % _HC_STRATA).cast("long")
    )
    cells = maintain_dyadic_cms(
        feed,
        1,
        2,
        F.floor(F.col("price")).cast("long") % 4096,
        levels=_DCMS_LEVELS,
        depth=_DCMS_DEPTH,
        width=_DCMS_WIDTH,
        group_cols=["stratum"],
    )
    vals = feed.read(version=2).select(
        "stratum", (F.floor(F.col("price")).cast("long") % 4096).alias("_val")
    )
    totals = vals.groupBy("stratum").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    served = dyadic_quantile_serve(
        cells,
        totals,
        _HC_Q,
        levels=_DCMS_LEVELS,
        depth=_DCMS_DEPTH,
        width=_DCMS_WIDTH,
        group_cols=["stratum"],
        # Measured this round: the live cell frame is ~1.8M rows at
        # sf0.1 (the old comment's 0.5M/20 MB estimate was low), and
        # broadcast_cells=True rebuilt and shipped that relation once
        # PER DESCENT ROUND — the dominant CPU term of the whole
        # query. The shuffle-join serve (also the 10⁴+-strata scale
        # route) probes against the checkpointed cells without a
        # per-round broadcast build.
        broadcast_cells=True,
        # Wide-fan descent: 7 probes per open stratum per round, 4
        # rounds instead of 12 — rounds are JOBS (scheduling +
        # codegen + a checkpoint each), probe rows are only
        # O(strata). The oracle unrolls the identical probe path.
        arity=_HC_ARITY,
    )
    w = Window.partitionBy("stratum").orderBy("_val")
    exact = (
        vals.select(
            "stratum",
            "_val",
            F.row_number().over(w).alias("_rn"),
            F.ceil(F.lit(_HC_Q) * F.count(F.lit(1)).over(
                Window.partitionBy("stratum")
            ))
            .cast("long")
            .alias("_t2"),
        )
        .filter(F.col("_rn") == F.col("_t2"))
        .select("stratum", F.col("_val").alias("exact_q"))
    )
    return (
        served.join(totals, "stratum")
        .join(exact, "stratum")
        .select(
            "stratum",
            "n",
            "qhat",
            "exact_q",
            (F.col("qhat") <= F.col("exact_q")).alias("underestimate_ok"),
        )
    )


# --------------------------------------------------------------------------
# Incremental BM25: maintained postings + turnstile corpus stats
# --------------------------------------------------------------------------


def _docs_cdf_store(spark: SparkSession, sf_dir: str):
    """Documents change-window fixture (the _cdf_store shape over the
    documents table): base = docs %10 != 3 at v1; v2 merges updates
    (%10 == 7) and inserts (%10 == 3) whose text gains a query-term
    suffix (so updates genuinely move BM25 scores and document
    lengths), and removes %10 == 5. Persisted + flocked like every
    CDF fixture; replays skip to the reads."""
    import hashlib
    import os

    from ..sinks.snapshot import SnapshotStore

    fp = _dataset_fingerprint(sf_dir, "documents")
    tag = hashlib.md5(
        f"{os.path.abspath(sf_dir)}|{fp}|docs-cdf|nb16|hardlink|v1".encode()
    ).hexdigest()[:12]
    path = f"/tmp/spark-graft-docscdfstore-{tag}"
    docs = load(spark, sf_dir, "documents")
    base = docs.filter(F.col("doc_id") % 10 != 3).select(
        "doc_id", F.lit(1).alias("v"), "text"
    )
    delta = docs.filter((F.col("doc_id") % 10).isin(3, 7)).select(
        "doc_id",
        F.lit(2).alias("v"),
        F.concat(F.col("text"), F.lit(" spark join window shift")).alias(
            "text"
        ),
    )
    removed = docs.filter(F.col("doc_id") % 10 == 5).select("doc_id")
    with _store_lock(path):
        store = SnapshotStore(
            spark,
            path,
            key="doc_id",
            version_col="v",
            num_buckets=16,
            layout="hardlink",
        )
        if store.current_version() is None:
            store.overwrite(base)
        if store.current_version() == 1:
            store.merge(delta, removed=removed)
    return store


@query(
    "incremental_view_bm25_topk",
    oracle="""
    WITH dbase AS (
        SELECT doc_id, text FROM documents WHERE doc_id % 10 <> 3
    ),
    ddelta AS (
        SELECT doc_id, text || ' spark join window shift' AS text
        FROM documents WHERE doc_id % 10 IN (3, 7)
    ),
    d2 AS (
        SELECT doc_id, text FROM dbase WHERE doc_id % 10 NOT IN (5, 7)
        UNION ALL
        SELECT doc_id, text FROM ddelta
    ),
    toks AS (
        SELECT doc_id,
               list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
                           x -> x <> '') AS tk
        FROM d2
    ),
    stats AS (
        SELECT count(*) AS n_docs, CAST(sum(len(tk)) AS BIGINT) AS sum_dl
        FROM toks
    ),
    tf AS (
        SELECT doc_id, len(tk) AS dl, s.term, count(*) AS tf
        FROM toks, unnest(tk) AS u(term)
        JOIN (SELECT unnest(['spark', 'join', 'window']) AS term) s
          USING (term)
        GROUP BY doc_id, len(tk), s.term
    ),
    df AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
    scored AS (
        SELECT tf.doc_id,
               CAST(sum(
                   ln(1 + ((n_docs - df)::DOUBLE + 0.5) / (df::DOUBLE + 0.5))
                   * tf::DOUBLE * (1.2 + 1)
                   / (tf::DOUBLE + 1.2
                      * (1 - 0.75
                         + 0.75 * (dl::DOUBLE) * n_docs / sum_dl))
               ) AS DOUBLE) AS raw
        FROM tf JOIN df USING (term) CROSS JOIN stats
        GROUP BY tf.doc_id
    ),
    rounded AS (SELECT doc_id, round(raw + 1e-7, 4) AS bm25 FROM scored)
    SELECT doc_id, bm25 FROM (
        SELECT *, row_number() OVER (ORDER BY bm25 DESC, doc_id) AS rn
        FROM rounded
    ) WHERE rn <= 20
    """,
)
def incremental_view_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INCREMENTAL BM25 (r13 verdict #5 — the one LLM-pipeline family
    that had no maintained twin): the serving state — query-term
    postings (doc_id, dl, term, tf) plus the 1-row turnstile
    (n_docs, sum_dl) corpus normalizer — is MAINTAINED through the
    documents change window (inserts %10==3, updates %10==7 whose
    text gains query terms, deletes %10==5), never rebuilt: only
    changed docs are re-tokenized (one anti-join + a delta
    aggregation), and deletes subtract exactly from the stats. Top-20
    is served from the maintained state (operators/ivm.maintain_bm25
    + bm25_topk); the oracle recomputes BM25 from scratch over the
    post-state corpus, so the hash proves the maintained state equals
    the rebuild. 100 TB: maintenance cost is O(changed docs); state
    is O(docs containing query terms) + 1 row; df derives from the
    postings at serve time so it can never drift."""
    from ..operators.ivm import bm25_topk, maintain_bm25
    from .llm_pipeline2 import _BM25_TERMS

    store = _docs_cdf_store(spark, sf_dir)
    postings, stats = maintain_bm25(
        store,
        1,
        2,
        id_col="doc_id",
        text_col="text",
        terms=list(_BM25_TERMS),
    )
    return bm25_topk(postings, stats, k=20)


@query(
    "bm25_store_search_topk",
    oracle=ORACLES["incremental_view_bm25_topk"],
)
def bm25_store_search_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OPEN-VOCABULARY persisted BM25 index
    (operators/incremental_bm25.Bm25IndexStore): postings for EVERY
    term live in a term-bucketed SnapshotStore (the inverted-index
    shard layout — an arbitrary query reads only its terms' buckets),
    with a doc-keyed length sidecar for O(removal) deletion
    accounting and the (n_docs, sum_dl) normalizer riding the version
    meta as turnstile sums. This is the ES-replacement regime (the
    reference delegates relevance to Elasticsearch's inverted index);
    the maintained-view twin (incremental_view_bm25_topk) is the
    known-query regime — both serve the SAME window through the SAME
    oracle: seed = base docs, adds = the %10==3 inserts, updates =
    eager remove + re-add of the %10==7 docs (the mutation contract —
    old postings must physically leave buckets the new text won't
    hash to), deletes = the %10==5 docs via the TOMBSTONE path
    (O(removal): log + pruned sidecar lookup, stats subtract exactly,
    physical GC deferred to compaction). 100 TB: adds are
    bucket-pruned merges O(batch tokens); a query reads |terms|
    buckets; state is O(corpus tokens) — the price of serving any
    query, which is why both regimes exist."""
    import hashlib
    import os

    from ..operators.incremental_bm25 import Bm25IndexStore
    from .llm_pipeline2 import _BM25_TERMS

    docs = load(spark, sf_dir, "documents")
    fp = _dataset_fingerprint(sf_dir, "documents")
    tag = hashlib.md5(
        f"{os.path.abspath(sf_dir)}|{fp}|bm25idx|nb16|hardlink|v2".encode()
    ).hexdigest()[:12]
    path = f"/tmp/spark-graft-bm25idx-{tag}"
    base = docs.filter(
        (F.col("doc_id") % 10 != 3) & (F.col("doc_id") % 10 != 7)
    )
    upd_pre = docs.filter(F.col("doc_id") % 10 == 7)
    changed = docs.filter((F.col("doc_id") % 10).isin(3, 7)).select(
        "doc_id",
        F.concat(F.col("text"), F.lit(" spark join window shift")).alias(
            "text"
        ),
    )
    removed = docs.filter(F.col("doc_id") % 10 == 5).select("doc_id")
    with _store_lock(path):
        store = Bm25IndexStore(spark, path, num_buckets=16)
        if store.store.current_version() is None:
            # Seed INCLUDES the %10==7 docs' pre-images so the update
            # path is a genuine remove + re-add, not a fresh insert.
            store.seed(
                base.select("doc_id", "text").unionByName(
                    upd_pre.select("doc_id", "text")
                ),
                "doc_id",
                "text",
            )
            store.remove_docs(
                upd_pre.select("doc_id"), mode="eager"
            )  # mutation contract
            store.add(changed, "doc_id", "text", seq=1)
            store.remove_docs(removed, mode="tombstone")
    return store.search(list(_BM25_TERMS), k=20)
