"""Persisted, term-bucketed BM25 postings index — OPEN-VOCABULARY
retrieval over a maintained inverted index.

``operators/ivm.maintain_bm25`` keeps a compact maintained view for a
KNOWN query (its postings hold only the query's terms — the
materialized-view shape: cheap, but re-derived per query set). This
module is the other regime a 100 TB retrieval deployment needs: the
postings for EVERY term persist once in a :class:`SnapshotStore`
keyed by the unique (term, doc_id) row but physically BUCKETED BY THE
TERM (``bucket_key="term"``), so serving an ARBITRARY query reads
only the |query terms| buckets its terms hash into — the on-disk
analog of an inverted index's term-sharded posting lists, the same
design as the MinHash band store (bucketed by band hash) and the IVF
store (bucketed by cell id).

State:

- postings store: (term, doc_id, tf, dl, batch_seq) — LWW-upserted on
  the composite (term, doc_id) key, so re-merging a batch is
  idempotent in rows.
- doc-length sidecar store: (doc_id, dl, batch_seq), bucketed by
  doc_id — the O(removal) lookup that lets a DELETION adjust the
  corpus normalizer without touching the term-bucketed index (a
  doc-keyed read has no pruned path through a term-bucketed store).
- corpus stats (n_docs, sum_dl) ride the postings store's version
  META as TURNSTILE SUMS: adds add, removals subtract exactly. The
  normalizer covers ALL docs — including docs none of whose terms are
  ever queried — which per-query state could never maintain.

Contract mirrors the band store: APPEND-MOSTLY corpora take the fast
path (add = bucket-pruned merge, O(batch)); a MUTATED document goes
through :meth:`remove_docs` first (eager = deliberate O(index)
anti-join, tombstone = O(removal) log + pruned dl lookup), then
re-adds as a normal batch. ``batch_seq`` must be strictly increasing
per committed add — the stats fold is guarded by a ``stats_seq``
watermark in the meta so a REPLAYED add (at-least-once feeders)
upserts its rows idempotently and leaves the stats untouched.

Reference parity: the reference's Elasticsearch sink delegates
relevance to ES's own BM25 inverted index
(elasticsearch_integration.py bulk indexing + search_multi_match);
this store is that capability rebuilt Spark-first — sharded postings,
pruned reads, exact scores under the oracle gate.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from .store_common import TombstoneStore, read_pruned, remove_by_column


class Bm25IndexStore:
    def __init__(
        self,
        spark: SparkSession,
        path: str,
        *,
        num_buckets: int = 32,
        layout: str = "hardlink",
    ):
        import os

        from ..sinks.snapshot import SnapshotStore

        self.spark = spark
        self.path = path
        self.store = SnapshotStore(
            spark,
            path,
            key=["term", "doc_id"],
            version_col="batch_seq",
            num_buckets=num_buckets,
            layout=layout,
            bucket_key="term",
        )
        # Doc-length sidecar: doc-keyed, doc-bucketed — removals prune
        # to the removed ids' buckets.
        self.dl_store = SnapshotStore(
            spark,
            os.path.join(path, "doclen"),
            key="doc_id",
            version_col="batch_seq",
            num_buckets=num_buckets,
            layout=layout,
        )
        self.tombstones = TombstoneStore(
            spark,
            path,
            "doc_id",
            num_buckets=num_buckets,
            layout=layout,
            gen_of=lambda: (self.store.read_meta() or {}).get(
                "tombstone_gen", 0
            ),
        )

    # -- derivation -----------------------------------------------------------
    def _rows(
        self, docs: DataFrame, id_col: str, text_col: str, seq: int
    ) -> tuple[DataFrame, DataFrame]:
        """(postings, doclens) of a document frame — one tokenize pass
        feeds both (the engine tokenizer, so scores agree with the
        batch queries by construction)."""
        from ..functions.text import tokens

        toks = docs.select(
            F.col(id_col).alias("doc_id"),
            tokens(F.col(text_col)).alias("tk"),
        ).select("doc_id", "tk", F.size("tk").alias("dl"))
        toks = toks.localCheckpoint(eager=False)  # two consumers
        postings = (
            toks.select("doc_id", "dl", F.explode("tk").alias("term"))
            .groupBy("term", "doc_id", "dl")
            .agg(F.count(F.lit(1)).alias("tf"))
            .select(
                "term",
                "doc_id",
                "tf",
                "dl",
                F.lit(seq).cast("long").alias("batch_seq"),
            )
        )
        doclens = toks.select(
            "doc_id", "dl", F.lit(seq).cast("long").alias("batch_seq")
        )
        return postings, doclens

    def _stats_meta(self) -> dict:
        meta = self.store.read_meta()
        if meta is None or "n_docs" not in meta:
            raise ValueError("BM25 index is empty — seed() it first")
        return meta

    def stats(self) -> DataFrame:
        """The 1-row (n_docs, sum_dl) normalizer from the committed
        meta — no scan."""
        meta = self._stats_meta()
        return self.spark.createDataFrame(
            [(int(meta["n_docs"]), int(meta["sum_dl"]))],
            "n_docs long, sum_dl long",
        )

    # -- lifecycle -------------------------------------------------------------
    def seed(self, corpus: DataFrame, id_col: str, text_col: str) -> int:
        """One-time full-corpus build; later cycles are O(delta) adds.
        The stats and the tombstone-generation bump commit atomically
        with the rows (meta payload), same crash story as the band
        store's seed."""
        postings, doclens = self._rows(corpus, id_col, text_col, 0)
        agg = doclens.agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.coalesce(F.sum("dl"), F.lit(0)).cast("long").alias("s"),
        ).first()
        gen = (self.store.read_meta() or {}).get("tombstone_gen", 0) + 1
        v = self.store.overwrite(
            postings,
            meta={
                "n_docs": int(agg.n),
                "sum_dl": int(agg.s),
                "stats_seq": 0,
                "tombstone_gen": gen,
            },
        )
        self.dl_store.overwrite(doclens)
        self.tombstones.clear()  # pure GC; generation already moved on
        return v

    def add(
        self, batch: DataFrame, id_col: str, text_col: str, *, seq: int
    ) -> int:
        """O(delta) maintenance: the batch's postings merge into the
        buckets its terms hash to; the doc-length sidecar and the
        turnstile stats advance with it. NEW DOCS ONLY (append-mostly
        contract — a mutated doc goes through remove_docs first, or
        its old postings would strand in buckets the new text's terms
        don't hash to, exactly the band-store hazard).

        Replay-idempotent: rows LWW-upsert on (term, doc_id); the
        stats fold is guarded by the ``stats_seq`` watermark, so a
        replayed seq re-lands identical rows and leaves
        (n_docs, sum_dl) untouched."""
        meta = dict(self._stats_meta())
        postings, doclens = self._rows(batch, id_col, text_col, seq)
        if int(seq) <= int(meta.get("stats_seq", 0)):
            # Replay of an already-folded batch: rows only.
            return self.store.merge(postings)
        agg = doclens.localCheckpoint(eager=False).agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.coalesce(F.sum("dl"), F.lit(0)).cast("long").alias("s"),
        ).first()
        meta["n_docs"] = int(meta["n_docs"]) + int(agg.n)
        meta["sum_dl"] = int(meta["sum_dl"]) + int(agg.s)
        meta["stats_seq"] = int(seq)
        v = self.store.merge(postings, meta=meta)
        self.dl_store.merge(doclens)
        return v

    def remove_docs(self, doc_ids: DataFrame, *, mode: str = "eager") -> int:
        """Drop documents from the index and SUBTRACT them from the
        turnstile stats (their lengths come from the doc-keyed sidecar
        — an O(removal) pruned read; the term-bucketed index cannot
        answer a doc-keyed lookup).

        ``eager``: O(index) anti-join overwrite of the postings (the
        mutation path — old rows must physically leave buckets the new
        text won't hash to). ``tombstone``: O(removal) — ids land in
        the removal log, :meth:`search` filters against it, and
        :meth:`compact_tombstones` folds the log out physically later.
        Either way the sidecar rows are removed by a pruned merge and
        the stats adjust in the SAME postings-store commit as the
        removal's logical effect. A tombstoned id re-added later stays
        hidden until compaction (same caveat as the IVF store)."""
        ids = doc_ids.select(
            F.col(doc_ids.columns[0]).alias("doc_id")
        ).localCheckpoint(eager=False)
        meta = dict(self._stats_meta())
        # O(removal): only the removed ids' buckets of the sidecar.
        present = (
            read_pruned(
                self.dl_store, ids, empty_msg="BM25 index is empty"
            )
            .join(ids, "doc_id", "semi")
        )
        present = self.tombstones.apply(present, "doc_id")
        agg = present.agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.coalesce(F.sum("dl"), F.lit(0)).cast("long").alias("s"),
        ).first()
        meta["n_docs"] = int(meta["n_docs"]) - int(agg.n)
        meta["sum_dl"] = int(meta["sum_dl"]) - int(agg.s)
        if mode == "tombstone":
            self.tombstones.add(ids)
            # Stats adjustment still publishes through the postings
            # store's meta (rows untouched — merge of an empty batch
            # is not supported, so commit the meta via the sidecar
            # removal + a meta-only carry on the postings store).
            v = self.store.merge(
                self.store.read(version=self.store.current_version())
                .limit(0)
                .drop("_bucket"),
                meta=meta,
            )
        else:
            v = remove_by_column(
                self.store,
                ids,
                "doc_id",
                empty_msg="BM25 index is empty — nothing to remove",
                meta=meta,
            )
        self.dl_store.merge(
            self.dl_store.read().limit(0).drop("_bucket"), removed=ids
        )
        return v

    def compact_tombstones(self) -> int | None:
        """Fold the tombstone log into the postings physically (one
        amortized O(index) pass), then clear it. Stats were already
        adjusted at tombstone time — this is purely physical GC."""
        return self.tombstones.compact_into(
            self.store,
            "doc_id",
            empty_msg="BM25 index is empty — nothing to remove",
        )

    # -- serving ---------------------------------------------------------------
    def search(
        self,
        terms: list[str],
        *,
        k: int = 20,
        k1: float = 1.2,
        b: float = 0.75,
    ) -> DataFrame:
        """Top-k BM25 over the persisted index for an ARBITRARY term
        list: read ONLY the buckets the query terms hash into
        (partition/manifest pruning — the inverted-list read), filter
        to the exact terms, derive df from the pruned slice, score
        with the shared expressions. Same scores as the batch
        ``bm25_search_topk`` over the equivalent corpus, pinned by the
        oracle gate."""
        from .ivm import bm25_topk

        probe = self.spark.createDataFrame(
            [(t,) for t in terms], "term string"
        )
        stored = (
            read_pruned(
                self.store,
                probe,
                empty_msg="BM25 index is empty — seed() it first",
            )
            .filter(F.col("term").isin(*terms))
        )
        stored = self.tombstones.apply(stored, "doc_id")
        return bm25_topk(
            stored.select("doc_id", "dl", "term", "tf"),
            self.stats(),
            k=k,
            k1=k1,
            b=b,
        )
