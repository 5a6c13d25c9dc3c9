"""Elasticsearch bulk sink (S9/S10) — connector-gated with a
bulk-file fallback.

Reference parity: elasticsearch_integration.py:298-451 formats docs
(ISO timestamps 98-112, human size 390-409), joins enrichments, and
POSTs `client.bulk` with explicit `_id`; deletes go in 1000-id batches
(253-275, 526-551). The index mapping is §1.3.

Spark-first shape: the document projection is ONE select (Catalyst
fuses it with the upstream join/rollup instead of the reference's two
materialized DuckDB queries); the write is either
  - the elasticsearch-spark connector when its jar is present
    (``es.mapping.id = id``), or
  - an NDJSON "bulk file" sink: one part per partition in the exact
    _bulk wire format, so tests (and external shippers) can assert on
    byte-accurate actions. No ES server exists in this image.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

from ..functions import composite_id, format_size, iso_format

# §1.3 field set (elasticsearch_integration.py:43-96).
ES_DOC_FIELDS = [
    "id",
    "name",
    "relative_path",
    "filepath",
    "type",
    "size_bytes",
    "size",
    "extension",
    "checksum",
    "direct_link",
    "fsentry_id",
    "modified_time",
    "creation_time",
    "last_seen",
]


def format_documents(entries: DataFrame) -> DataFrame:
    """Project fs entries into ES document shape: ISO timestamps,
    human-readable ``size``, empty-string defaults (the COALESCE /
    CASE projection P10, elasticsearch_integration.py:158-170)."""
    cols: dict[str, Column] = {
        "id": F.col("id"),
        "name": F.col("name"),
        "relative_path": F.col("relative_path"),
        "filepath": F.col("filepath"),
        "type": F.col("type"),
        "size_bytes": F.col("size_bytes"),
        "size": format_size("size_bytes"),
        "extension": F.coalesce(F.col("extension"), F.lit("")),
        "checksum": F.coalesce(F.col("checksum"), F.lit("")),
        "direct_link": F.coalesce(F.col("direct_link"), F.lit(""))
        if "direct_link" in entries.columns
        else F.lit(""),
        "fsentry_id": F.col("fsentry_id")
        if "fsentry_id" in entries.columns
        else F.lit(None).cast("string"),
        "modified_time": iso_format("modified_time"),
        "creation_time": iso_format("creation_time"),
        "last_seen": iso_format("last_seen"),
    }
    return entries.select(*[c.alias(n) for n, c in cols.items()])


def bulk_actions(docs: DataFrame, index: str) -> DataFrame:
    """NDJSON `_bulk` action pairs: one row per line, alternating
    action and source — `{"index":{"_index":...,"_id":...}}\\n{doc}`."""
    action = F.to_json(
        F.struct(
            F.struct(
                F.lit(index).alias("_index"), F.col("id").alias("_id")
            ).alias("index")
        )
    )
    source = F.to_json(F.struct(*[F.col(c) for c in docs.columns]))
    paired = docs.select(
        F.concat(action, F.lit("\n"), source).alias("value")
    )
    return paired


def delete_actions(ids: DataFrame, index: str, id_col: str = "id") -> DataFrame:
    """Bulk delete actions from an id DataFrame (the anti-join result)
    — replaces the reference's driver-side 1000-id batching and its
    10k-scroll cap (S10, elasticsearch_integration.py:526-551)."""
    return ids.select(
        F.to_json(
            F.struct(
                F.struct(
                    F.lit(index).alias("_index"), F.col(id_col).alias("_id")
                ).alias("delete")
            )
        ).alias("value")
    )


def sync_actions_from_changes(
    store,
    index: str,
    v_from: int,
    v_to: int | None = None,
    *,
    format_docs=None,
) -> DataFrame:
    """Incremental ES sync driven by the snapshot store's change feed:
    one `_bulk` NDJSON DataFrame holding index actions for every
    inserted/updated key (post-image source) and delete actions for
    every removed key — nothing for untouched keys.

    This closes the reference's main loop (scan → diff vs DB → update
    DB → sync ES, main.py:339-362 + elasticsearch_integration bulk /
    delete batches) from COMMIT METADATA instead of a rescan: the feed
    reads only the buckets the merge touched (sinks/snapshot.py
    read_changes), so a nightly sync of a 100 TB index ships O(changed)
    documents, and the delete side replaces the reference's
    10k-capped scroll with the feed's exact removed-key set.

    ``format_docs`` optionally projects post-image rows into document
    shape (e.g. ``format_documents``) BEFORE action encoding; it must
    preserve the store's key column(s). The store key becomes ``_id``
    (keys are unique per feed, so action order within the bulk body is
    irrelevant).

    A COMPOSITE store key — e.g. (relative_path, snapshot_domain) —
    serializes to a deterministic ``_id`` by colon-joining the key
    columns cast to string, THE SAME encoding the streaming change
    feed's keyed store uses (streaming/pipeline.py feed-store cadence),
    so a document keeps one stable ES identity across both the batch
    and streaming publish paths; the delete side mirrors it exactly
    (reference ``_id`` semantics: elasticsearch_integration.py:424-429,
    one explicit _id per action).

    MIGRATION (one-time, composite-key indexes published before the
    escaped encoding): the r10 switch from plain ``concat_ws(':')``
    to the injective ``composite_id`` changes the ``_id`` of every
    key containing ':', a backslash, or a NULL component. Documents
    already published under the OLD ids will never be matched by
    future updates/deletes of the same logical key — they linger as
    orphans while the new id accumulates the live state. Before the
    first sync with this encoding against a pre-existing index,
    either (a) reindex/recreate the target index and republish from a
    full sync (the snapshot store is the source of truth — nothing is
    lost), or (b) run a one-time cleanup deleting the legacy id form:
    for each composite-key doc in the store, emit a delete action for
    ``concat_ws(':', *keys)`` where that string differs from
    ``composite_id(keys)`` (keys free of ':'/backslash/NULL encode
    identically in both schemes, so the affected set is exactly the
    keys the old encoding aliased). Indexes first published after r10
    need nothing."""
    # The feed is consumed twice (upsert filter + delete filter); a
    # lazy localCheckpoint materializes the changed-bucket
    # classification join once instead of per consumer.
    changes = store.read_changes(v_from, v_to).localCheckpoint(eager=False)
    key = store.key
    keys = [key] if isinstance(key, str) else list(key)
    composite = len(keys) > 1
    upserts = changes.filter(F.col("_change") != "delete").drop("_change")
    if composite:
        # Deterministic composite _id BEFORE format_docs runs, so the
        # projection can keep / drop the raw key columns freely as long
        # as it preserves 'id'. composite_id escapes the separator and
        # encodes NULL explicitly — ('a:b','c') vs ('a','b:c') and
        # ('a', NULL) vs ('a',) stay distinct documents in ES.
        id_expr = composite_id(keys)
        if "id" in upserts.columns:
            raise ValueError(
                f"composite store key {keys!r} must serialize into the "
                "ES _id column 'id', but the row shape already has an "
                "'id' column; drop or rename it upstream"
            )
        upserts = upserts.withColumn("id", id_expr)
        if format_docs is not None:
            upserts = format_docs(upserts)
        if "id" not in upserts.columns:
            raise ValueError(
                "format_docs dropped the composite 'id' column the ES "
                "_id is derived from; preserve it"
            )
        deletes = changes.filter(F.col("_change") == "delete").select(
            id_expr.alias("id")
        )
        return bulk_actions(upserts, index).unionByName(
            delete_actions(deletes, index)
        )
    if format_docs is not None:
        upserts = format_docs(upserts)
    if key != "id" and key in upserts.columns:
        if "id" in upserts.columns:
            # BOTH the key and a distinct 'id' column exist: renaming
            # would make every downstream F.col("id") ambiguous (and
            # silently re-key the index if it resolved) — demand an
            # explicit decision. A format_docs that already emitted the
            # key AS 'id' (key column gone) falls through cleanly.
            raise ValueError(
                f"document shape has BOTH an 'id' column and the store "
                f"key {key!r}; make format_docs emit the key AS 'id' "
                "(dropping the original) or drop the conflicting column "
                "so the ES _id is unambiguous"
            )
        upserts = upserts.withColumnRenamed(key, "id")
    deletes = changes.filter(F.col("_change") == "delete").select(
        F.col(key).alias("id")
    )
    return bulk_actions(upserts, index).unionByName(
        delete_actions(deletes, index)
    )


def write_bulk_file(actions: DataFrame, out_dir: str) -> None:
    """Partitioned NDJSON bulk files — one part per partition; each
    part is a valid `_bulk` request body."""
    actions.write.mode("overwrite").text(out_dir)


def write_elasticsearch(docs: DataFrame, index: str, es_conf: dict[str, str]) -> bool:
    """Write through the elasticsearch-spark connector when present.
    Returns False (caller falls back to the bulk file) when the jar
    is not on the classpath."""
    try:
        (
            docs.write.format("org.elasticsearch.spark.sql")
            .option("es.mapping.id", "id")
            .option("es.resource", index)
            .options(**es_conf)
            .mode("append")
            .save()
        )
        return True
    except Exception:  # noqa: BLE001 - connector jar absent in this image
        return False
