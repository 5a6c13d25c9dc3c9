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
- Centroids are fixed at :meth:`seed` and persisted beside the data;
  assignment is a pure function of (vector, centroids) — the broadcast
  argmin projection shared with the one-shot operator
  (``similarity.assign_cells``) — so an index built as seed + N adds
  is ROW-IDENTICAL to one built in a single pass, and a search over it
  returns exactly what ``ivf_ann_topk`` returns on the union corpus.
  The registered query ``ann_incremental_ivf_topk`` pins that under
  the oracle gate by REUSING similarity_ivf_topk's oracle verbatim.
- Re-adding a batch is idempotent (LWW upsert on vec_id); a vector's
  embedding update lands in its (possibly new) cell's bucket and the
  stale row is superseded only if the cell didn't change — like the
  band store, mutation that MOVES a row across buckets needs the
  explicit removal pass; append-mostly corpora never do.

Centroid drift: a production deployment re-trains centroids
periodically and rebuilds (one O(corpus) pass); between rebuilds the
fixed-centroid contract is what makes adds O(delta). That is the
standard IVF maintenance model (train once, add forever, retrain on
distribution shift).
"""

from __future__ import annotations

import os

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..functions.rounding import stable_round
from ..functions.vectors import cosine
from .similarity import _ranked_topk, assign_cells


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
        self._centroid_dir = os.path.join(path, "_CENTROIDS")

    # -- centroids -----------------------------------------------------------
    def centroids(self) -> DataFrame:
        return self.spark.read.parquet(self._centroid_dir)

    def _assigned(self, df: DataFrame, id_col: str, vec_col: str, seq: int):
        cells = assign_cells(
            df, self.centroids(), id_col, vec_col, "vec_id", "emb", 1
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
        table."""
        (
            centroids.select(
                F.col(id_col).alias("vec_id"), F.col(vec_col).alias("emb")
            )
            .coalesce(1)  # centroid set is small by definition (k cells)
            .write.mode("overwrite")
            .parquet(self._centroid_dir)
        )
        return self.store.overwrite(self._assigned(corpus, id_col, vec_col, 0))

    def add(self, batch: DataFrame, id_col: str, vec_col: str, *, seq: int) -> int:
        """O(delta) index maintenance: assign the batch against the
        FIXED centroids and bucket-pruned-merge it in."""
        if self.store.current_version() is None:
            raise ValueError("IVF index is empty — seed() it first")
        return self.store.merge(self._assigned(batch, id_col, vec_col, seq))

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
        query_cells = assign_cells(
            queries, self.centroids(), id_col, vec_col, "query_id", "qvec", nprobe
        )
        # Bounded driver metadata: nprobe cells per query, <= num_buckets
        # distinct buckets (same justified-collect class as merge()).
        probed = query_cells.select("cid").distinct()
        touched = sorted(
            r._bucket
            for r in probed.withColumn("_bucket", self.store._bucket_col())
            .select("_bucket")
            .distinct()
            .collect()
        )
        stored = self.store.read_buckets(touched)
        if stored is None:
            raise ValueError("IVF index is empty — seed() it first")
        # Bucket pruning is hash-coarse; the cid equi-join below is the
        # exact cell filter (and the shuffle key).
        corpus_cells = stored.select(
            F.col("vec_id").alias("neighbor_id"),
            F.col("emb").alias("nvec"),
            "cid",
        )
        scored = (
            corpus_cells.join(F.broadcast(query_cells), "cid")
            .filter(F.col("neighbor_id") != F.col("query_id"))
            .dropDuplicates(["query_id", "neighbor_id"])
            .select(
                "query_id",
                "neighbor_id",
                stable_round(cosine("qvec", "nvec"), 6).alias("cos_sim"),
            )
        )
        return _ranked_topk(scored, k)
