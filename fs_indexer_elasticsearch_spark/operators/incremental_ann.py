"""Incremental IVF ANN index — the similarity-search counterpart of
the incremental MinHash band store (operators/incremental_dedup.py).

One-shot ``ivf_ann_topk`` re-assigns the whole corpus to centroid
cells on every query. At 100 TB the inverted file must be BUILT ONCE
and maintained by deltas:

- The index is a :class:`SnapshotStore` holding one row per vector
  (vec_id, cid, emb), keyed by ``vec_id`` for upsert but physically
  BUCKETED BY THE CELL ID (``bucket_key="cid"``), so a search probing
  ``nprobe`` cells reads only those cells' buckets (partition/manifest
  pruning — the on-disk analog of an inverted list) and an ``add``
  batch touches only the buckets its vectors' cells hash to.
- Centroids are fixed at :meth:`seed` and persisted beside the data
  in a VERSIONED directory committed by the same pointer swap as the
  row snapshot (see :meth:`seed`); assignment is a pure function of
  (vector, centroids) — the broadcast argmin projection shared with
  the one-shot operator (``similarity.assign_cells``) — so an index
  built as seed + N adds is ROW-IDENTICAL to one built in a single
  pass, and a search over it returns exactly what ``ivf_ann_topk``
  returns on the union corpus. The registered query
  ``ann_incremental_ivf_topk`` pins that under the oracle gate by
  REUSING similarity_ivf_topk's oracle verbatim.
- Re-adding a batch is idempotent (LWW upsert on vec_id); a vector's
  embedding update lands in its (possibly new) cell's bucket and the
  stale row is superseded only if the cell didn't change — like the
  band store, mutation that MOVES a row across buckets needs the
  explicit removal pass (:meth:`remove_vecs`, the mirror of
  ``MinHashBandStore.remove_docs``); append-mostly corpora never do.
  Should the contract be violated anyway, :meth:`search` resolves
  duplicate (query, neighbor) candidates deterministically by newest
  ``ivf_seq`` rather than arbitrarily.

Centroid drift: a production deployment re-trains centroids
periodically and re-seeds (one O(corpus) pass); between rebuilds the
fixed-centroid contract is what makes adds O(delta). That is the
standard IVF maintenance model (train once, add forever, retrain on
distribution shift).
"""

from __future__ import annotations

import os
import shutil

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from ..functions.rounding import stable_round
from ..functions.vectors import cosine
from .similarity import _ranked_topk, assign_cells
from .store_common import read_pruned, remove_by_column

# No leading underscore: Spark's file index treats "_"/"."-prefixed
# paths as hidden metadata (the read works only because the dir is
# passed as an explicit root, with an "all paths ignored" WARN).
# Cannot collide with the snapshot's own root entries (v{N}, _CURRENT,
# manifests).
_CENTROID_PREFIX = "centroids_v"


class IvfIndexStore:
    def __init__(
        self,
        spark: SparkSession,
        path: str,
        *,
        num_buckets: int = 32,
        layout: str = "hardlink",
    ):
        from ..sinks.snapshot import SnapshotStore

        self.spark = spark
        self.path = path
        self.store = SnapshotStore(
            spark,
            path,
            key="vec_id",
            version_col="ivf_seq",
            num_buckets=num_buckets,
            layout=layout,
            bucket_key="cid",
        )
        self._dim_cache: int | None = None

    # -- centroids -----------------------------------------------------------
    def _centroid_dir(self, version: int) -> str:
        return os.path.join(self.path, f"{_CENTROID_PREFIX}{version}")

    def _centroid_version(self) -> int | None:
        """Largest committed centroid set: the highest centroids_v{n}
        with n <= the snapshot pointer. seed() writes the centroid dir
        BEFORE the pointer swap, so a crash mid-seed leaves an orphan
        dir with n > pointer that this resolution ignores — the A5
        'failed write leaves the pointer untouched' guarantee holds
        for centroids exactly as it does for rows (r7 review finding).
        The n <= pointer rule alone is not enough: a LATER add()
        commit would advance the pointer past the orphan and silently
        promote it, so every mutating entry point first garbage-
        collects orphans (:meth:`_gc_orphan_centroids`) — in the
        single-writer contract an orphan can therefore never become
        resolvable."""
        cur = self.store.current_version()
        if cur is None:
            return None
        best = None
        try:
            names = os.listdir(self.path)
        except FileNotFoundError:
            return None
        for name in names:
            if not name.startswith(_CENTROID_PREFIX):
                continue
            try:
                n = int(name[len(_CENTROID_PREFIX):])
            except ValueError:
                continue
            if n <= cur and (best is None or n > best):
                best = n
        return best

    def _gc_orphan_centroids(self) -> None:
        """Delete centroid dirs above the committed pointer (crashed
        re-seed leftovers). Called before every commit so a pointer
        advanced by a later add()/remove_vecs() can never reach an
        orphan's number (second r7 review finding)."""
        cur = self.store.current_version() or 0
        try:
            names = os.listdir(self.path)
        except FileNotFoundError:
            return
        for name in names:
            if not name.startswith(_CENTROID_PREFIX):
                continue
            try:
                n = int(name[len(_CENTROID_PREFIX):])
            except ValueError:
                continue
            if n > cur:
                shutil.rmtree(os.path.join(self.path, name), ignore_errors=True)

    def centroids(self) -> DataFrame:
        v = self._centroid_version()
        if v is None:
            raise ValueError("IVF index is empty — seed() it first")
        return self.spark.read.parquet(self._centroid_dir(v))

    def _dim(self) -> int:
        """Vector width the index was seeded with (from the committed
        centroid table — k rows, one tiny scan, cached per instance)."""
        if self._dim_cache is None:
            self._dim_cache = int(
                self.centroids().select(F.size("emb").alias("d")).first().d
            )
        return self._dim_cache

    def _norm(self, df: DataFrame, id_col: str, vec_col: str, dim: int) -> DataFrame:
        """Normalize caller columns to the index's canonical
        (vec_id, emb) names — the persisted centroids always carry
        those names, so assignment must too (r7 review finding: any
        other caller column pair crashed on the centroid select) —
        and ENFORCE the vector width per row: a mismatched vector
        would zip against the centroid to a NULL cosine and silently
        land in the lowest cell with NULL search scores; raise_error
        beats durable corruption (same guard contract as
        functions/vectors.lsh_bucket). The guard wraps the VECTOR
        column itself (when size ok then vec else raise) — never
        arithmetic on the id column, which would break string ids and
        retype numeric ones (r7 review finding)."""
        guarded_vec = F.when(
            F.size(vec_col) == F.lit(dim), F.col(vec_col)
        ).otherwise(
            F.raise_error(
                F.format_string(
                    "IvfIndexStore: vector has %s dims, index expects "
                    + str(dim),
                    F.size(vec_col).cast("string"),
                )
            )
        )
        return df.select(
            F.col(id_col).alias("vec_id"),
            guarded_vec.alias("emb"),
        )

    def _assigned(
        self,
        df: DataFrame,
        id_col: str,
        vec_col: str,
        seq: int,
        cents: DataFrame,
        dim: int,
    ):
        cells = assign_cells(
            self._norm(df, id_col, vec_col, dim),
            cents, "vec_id", "emb", "vec_id", "emb", 1,
        )
        return cells.select(
            "vec_id", "cid", "emb", F.lit(seq).cast("long").alias("ivf_seq")
        )

    # -- lifecycle -----------------------------------------------------------
    def seed(
        self,
        corpus: DataFrame,
        centroids: DataFrame,
        id_col: str,
        vec_col: str,
    ) -> int:
        """One-time index build: persist the centroids, assign the
        corpus (broadcast argmin, no shuffle), write the cell-bucketed
        table.

        Commit protocol: the centroid set is written to the dir of the
        version the row snapshot is ABOUT to commit as; the pointer
        swap inside ``store.overwrite`` then publishes rows and
        centroids together. A crash between the two leaves the pointer
        on the old version and the new centroid dir orphaned (ignored
        by :meth:`_centroid_version`), so readers never see new
        centroids paired with rows assigned under old ones."""
        self._gc_orphan_centroids()
        v_next = (self.store.current_version() or 0) + 1
        norm_c = centroids.select(
            F.col(id_col).alias("vec_id"), F.col(vec_col).alias("emb")
        )
        dims = [r.d for r in norm_c.select(F.size("emb").alias("d")).distinct().collect()]
        if len(dims) != 1:
            raise ValueError(
                f"IvfIndexStore.seed: centroids have mixed dims {sorted(dims)}"
            )
        self._dim_cache = int(dims[0])
        cdir = self._centroid_dir(v_next)
        shutil.rmtree(cdir, ignore_errors=True)
        # centroid set is small by definition (k cells)
        norm_c.coalesce(1).write.mode("overwrite").parquet(cdir)
        cents = self.spark.read.parquet(cdir)
        v = self.store.overwrite(
            self._assigned(corpus, id_col, vec_col, 0, cents, self._dim_cache)
        )
        if v != v_next:
            raise RuntimeError(
                f"IvfIndexStore.seed: concurrent writer detected "
                f"(expected version {v_next}, committed {v}); the store is "
                "single-writer by contract"
            )
        return v

    def add(self, batch: DataFrame, id_col: str, vec_col: str, *, seq: int) -> int:
        """O(delta) index maintenance: assign the batch against the
        FIXED centroids and bucket-pruned-merge it in."""
        if self.store.current_version() is None:
            raise ValueError("IVF index is empty — seed() it first")
        self._gc_orphan_centroids()
        return self.store.merge(
            self._assigned(
                batch, id_col, vec_col, seq, self.centroids(), self._dim()
            )
        )

    def remove_vecs(self, vec_ids: DataFrame) -> int:
        """Drop every index row of the given vector ids (one-column
        DataFrame) — the slow path that makes embedding MUTATION safe
        when an update moves a vector across cells: remove, then add()
        the new embedding as a normal batch.

        Deliberately O(index), mirroring
        ``MinHashBandStore.remove_docs``: rows are keyed by vec_id but
        bucketed by cid, so finding them requires a full
        broadcast-anti-join pass and an overwrite commit. That is the
        documented cost of cell-bucketing for O(delta) SEARCH on an
        append-mostly corpus; batch removals to amortize. Returns the
        new store version."""
        self._gc_orphan_centroids()
        return remove_by_column(
            self.store,
            vec_ids,
            "vec_id",
            empty_msg="IVF index is empty — nothing to remove",
        )

    def search(
        self,
        queries: DataFrame,
        id_col: str,
        vec_col: str,
        *,
        k: int = 3,
        nprobe: int = 2,
    ) -> DataFrame:
        """IVF search over the PERSISTED index: queries are assigned
        their ``nprobe`` nearest cells (broadcast projection), only
        those cells' buckets are read from disk, candidates are scored
        exactly and ranked. Semantics identical to ``ivf_ann_topk`` on
        the same corpus/centroids — same assignment, same tiebreaks.
        """
        if self.store.current_version() is None:
            raise ValueError("IVF index is empty — seed() it first")
        # Lazy localCheckpoint: TWO consumers (touched-bucket collect
        # + the final scored join) would otherwise each re-run the
        # queries scan and broadcast-argmin assignment (same reasoning
        # as MinHashBandStore.match_and_merge).
        query_cells = assign_cells(
            self._norm(queries, id_col, vec_col, self._dim()),
            self.centroids(), "vec_id", "emb", "query_id", "qvec", nprobe,
        ).localCheckpoint(eager=False)
        # Bounded driver metadata: nprobe cells per query, <= num_buckets
        # distinct buckets (same justified-collect class as merge()).
        probed = query_cells.select("cid").distinct()
        stored = read_pruned(
            self.store, probed, empty_msg="IVF index is empty — seed() it first"
        )
        # Bucket pruning is hash-coarse; the cid equi-join below is the
        # exact cell filter (and the shuffle key).
        corpus_cells = stored.select(
            F.col("vec_id").alias("neighbor_id"),
            F.col("emb").alias("nvec"),
            "cid",
            "ivf_seq",
        )
        # One row per (query, neighbor): under the append-only
        # contract each neighbor has exactly one row; if a cross-cell
        # update violated it (remove_vecs not run), keep the NEWEST
        # row deterministically instead of dropDuplicates' arbitrary
        # pick (r7 review finding).
        dw = Window.partitionBy("query_id", "neighbor_id").orderBy(
            F.desc("ivf_seq"), F.asc("cid")
        )
        scored = (
            corpus_cells.join(F.broadcast(query_cells), "cid")
            .filter(F.col("neighbor_id") != F.col("query_id"))
            .withColumn("_rn", F.row_number().over(dw))
            .filter(F.col("_rn") == 1)
            .select(
                "query_id",
                "neighbor_id",
                stable_round(cosine("qvec", "nvec"), 6).alias("cos_sim"),
            )
        )
        return _ranked_topk(scored, k)
