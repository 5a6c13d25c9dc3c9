"""Streaming shape of the pipeline (SURVEY §2.10).

The reference is batch with streaming bones: a bounded
producer/consumer queue (scanner.py:364-403), size-thresholded
micro-batches (main.py:273-295), and snapshot-diff change detection.
Structured Streaming gives each one natively:

 - queue/back-pressure  → source back-pressure + maxFilesPerTrigger
 - micro-batches        → foreachBatch
 - snapshot-diff        → the same merge operator, applied per batch
 - counters             → observe() / StreamingQueryListener

``run_incremental_pipeline`` watches a directory of fs-entry parquet
drops and merges each micro-batch into a SnapshotStore — the
streaming twin of the batch ingest, sharing the identical merge
operator (one code path to test at both cadences).

``windowed_event_counts`` is the watermarked tumbling aggregation
over an events stream (late data dropped past the watermark).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQuery
from pyspark.sql.types import StructType

from ..functions import composite_id
from ..sinks.snapshot import SnapshotStore
from ..tables import ckpt_shared


def _dedup_newest(batch: DataFrame, store: SnapshotStore) -> DataFrame:
    """One row per store key from a micro-batch: the newest by the
    store's version column, with a DETERMINISTIC tiebreak — ordering
    by the version alone leaves equal-version duplicates to an
    arbitrary row_number winner, making the merged base (and any view
    maintained from it) nondeterministic across replays of the same
    input (r11 advice). Every remaining column joins the sort (name
    order), so identical inputs always elect the identical row."""
    from pyspark.sql import Window

    keys = [store.key] if isinstance(store.key, str) else list(store.key)
    tiebreak = [
        F.desc(c)
        for c in sorted(batch.columns)
        if c not in keys and c != store.version_col
    ]
    w = Window.partitionBy(*keys).orderBy(
        F.desc(store.version_col), *tiebreak
    )
    return (
        batch.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def run_incremental_pipeline(
    spark: SparkSession,
    input_dir: str,
    schema: StructType,
    store: SnapshotStore,
    checkpoint_dir: str,
    *,
    max_files_per_trigger: int = 10,
) -> StreamingQuery:
    """Merge every micro-batch of entry files into the snapshot store
    (exactly-once per epoch via the checkpointed foreachBatch)."""
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(input_dir)
    )

    def merge_batch(batch: DataFrame, epoch_id: int) -> None:
        if batch.isEmpty():
            return
        # Within one micro-batch the same key may appear twice; keep
        # the newest (same rule the merge applies across batches),
        # with a deterministic tiebreak for equal versions.
        store.merge(_dedup_newest(batch, store))

    return (
        stream.writeStream.foreachBatch(merge_batch)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
        .start()
    )


def _maintained_view_on_batch(store, view_store, derive, maintain):
    """The crash-safe maintained-view foreachBatch skeleton, shared by
    every streaming maintainer (min/max view, histogram view):

    - merge the deduped batch into the base store;
    - maintain over the window (reflected -> current base), where
      ``reflected`` is the base version recorded in the view's own
      commit meta — a crash between merge and publish is caught up in
      one spanning pass on the next epoch (foreachBatch is
      at-least-once);
    - epoch guard: an empty spanning feed (replayed or no-change
      epoch) skips the commit — the view over an empty window is the
      same view;
    - publish with ``expected_base`` pinned to the view version the
      feedback was read from (a concurrent publisher raises instead
      of silently folding over the loop);
    - SELF-HEAL (r11 advice): a vacuum deeper than the view's lag
      makes the window unreadable ("not retained") — degrade once to
      ``derive(v_after)``, the from-scratch derivation, which
      re-stamps ``base_version`` and restores the incremental steady
      state from the next cycle on.

    ``derive(v_after)`` returns the full view at a base version;
    ``maintain(reflected, v_after, old_view)`` advances the fed-back
    view across the window."""

    def on_batch(batch: DataFrame, epoch_id: int) -> None:
        if batch.isEmpty():
            return
        store.merge(_dedup_newest(batch, store))
        v_after = store.current_version()
        view_base = view_store.current_version()
        reflected = (view_store.read_meta(view_base) or {}).get(
            "base_version"
        ) if view_base is not None else None
        if reflected == v_after:
            return  # replay after a completed publish: nothing to do

        def publish(view: DataFrame) -> None:
            view_store.overwrite(
                view.localCheckpoint(eager=False),
                meta={"base_version": v_after},
                expected_base=view_base,
            )

        if reflected is None:
            publish(derive(v_after))
            return
        try:
            if store.read_changes(
                reflected, v_after, update_images="both"
            ).isEmpty():
                return
            old_view = view_store.read(version=view_base).drop("_bucket")
            view = maintain(reflected, v_after, old_view)
        except ValueError as e:
            if "not retained" not in str(e):
                raise
            publish(derive(v_after))
            return
        publish(view)

    return on_batch


def streaming_maintained_view_pipeline(
    spark: SparkSession,
    input_dir: str,
    schema: StructType,
    store: SnapshotStore,
    view_store: SnapshotStore,
    checkpoint_dir: str,
    *,
    group_cols: list[str],
    value_col: str,
    max_files_per_trigger: int = 10,
) -> StreamingQuery:
    """A DECLARED VIEW maintained incrementally inside the streaming
    loop (r10 verdict #6): each micro-batch merges into the base
    snapshot store, then the per-group ``(n, min_v, max_v, s)`` view
    is advanced across exactly that merge's CDC window with
    ``operators/ivm.maintain_min_max(with_sum=True)`` and published
    to ``view_store`` — the foreachBatch twin of the
    ``incremental_view_*`` registered queries, closing the gap where
    the streaming layer still republished views by recompute.

    Steady state: the PREVIOUS cycle's published view feeds back in
    as ``old_view``, so after the first derivation (one base
    aggregate when the view store seeds) every cycle costs O(feed)
    plus the affected-group recompute — the base is NEVER rescanned
    on insert-only or interior-delete cycles (adds can only improve
    an extremum; the view store read is O(groups)).

    CRASH SAFETY (r11 review): foreachBatch is at-least-once, and a
    crash can land BETWEEN the base merge and the view publish. The
    view therefore records the base version it REFLECTS in its own
    version meta (``base_version``) and every cycle maintains over
    the window (reflected -> current base) — never (v_before ->
    v_after) of this epoch's merge alone, which would skip the
    crashed epoch's window forever (its replay classifies stale and
    produces an empty feed). A multi-version window is exactly what
    the feed API serves, so catch-up is one maintenance pass, not a
    rescan. Corollary: the base store must retain versions back to
    the view's reflected one (vacuum no deeper than the view lags).

    Epoch guard: when the reflected->current feed is EMPTY (replayed
    or no-change epoch) the view commit is skipped entirely — the
    recorded base_version intentionally stays put, because a view
    over an empty window is the same view (same no-op-version rule
    as the changefeed pipeline). Publication is ``overwrite`` (the
    view is O(groups), tiny next to the base; a keyed merge would
    need removals for vanished groups) with ``expected_base`` pinned
    to the view version the old_view was read from — a concurrent
    publisher raises instead of silently folding over the feedback
    loop."""
    from ..operators.ivm import maintain_min_max

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(input_dir)
    )

    def derive(v_after: int) -> DataFrame:
        return (
            store.read(version=v_after)
            .groupBy(*group_cols)
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.min(value_col).alias("min_v"),
                F.max(value_col).alias("max_v"),
                F.sum(value_col).alias("s"),
            )
        )

    def maintain(reflected: int, v_after: int, old_view: DataFrame) -> DataFrame:
        return maintain_min_max(
            store,
            reflected,
            v_after,
            group_cols,
            value_col,
            old_view=old_view,
            with_sum=True,
        )

    on_batch = _maintained_view_on_batch(store, view_store, derive, maintain)
    return (
        stream.writeStream.foreachBatch(on_batch)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
        .start()
    )


def streaming_maintained_histogram_pipeline(
    spark: SparkSession,
    input_dir: str,
    schema: StructType,
    store: SnapshotStore,
    hist_store: SnapshotStore,
    checkpoint_dir: str,
    *,
    group_cols: list[str],
    value_col: str,
    max_files_per_trigger: int = 10,
) -> StreamingQuery:
    """The HISTOGRAM twin of ``streaming_maintained_view_pipeline``:
    each micro-batch merges into the base store, then the
    per-(group, value) multiplicity view advances across exactly that
    merge's CDC window (``operators/ivm.maintain_value_counts`` with
    the previous cycle's published bins fed back as ``old_hist``) and
    publishes to ``hist_store``. Downstream consumers serve the exact
    holistic aggregates — COUNT(DISTINCT), MEDIAN/quantiles, MODE —
    from the published bins with ``histogram_stats``, O(bins), no
    base access.

    Unlike the min/max maintainer, the histogram algebra is CLOSED
    under deletes: there is NO recompute branch, so after the first
    derivation the base store is never read again — not even on
    delete-heavy cycles that retire bins (the scan-count test pins
    this). Crash safety, epoch guard, expected_base pinning, and the
    deep-vacuum self-heal all ride the shared skeleton
    (``_maintained_view_on_batch``)."""
    from ..operators.ivm import maintain_value_counts

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(input_dir)
    )

    def derive(v_after: int) -> DataFrame:
        return (
            store.read(version=v_after)
            .groupBy(*group_cols, value_col)
            .agg(F.count(F.lit(1)).alias("c"))
        )

    def maintain(reflected: int, v_after: int, old_hist: DataFrame) -> DataFrame:
        return maintain_value_counts(
            store,
            reflected,
            v_after,
            group_cols,
            value_col,
            old_hist=old_hist,
        )

    on_batch = _maintained_view_on_batch(store, hist_store, derive, maintain)
    return (
        stream.writeStream.foreachBatch(on_batch)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
        .start()
    )


def streaming_maintained_pipeline(
    spark: SparkSession,
    input_dir: str,
    schema: StructType,
    store: SnapshotStore,
    view_store: SnapshotStore,
    checkpoint_dir: str,
    *,
    derive,
    maintain,
    max_files_per_trigger: int = 10,
) -> StreamingQuery:
    """The GENERAL maintained-view stream: plug ANY view algebra into
    the crash-safe foreachBatch skeleton (`_maintained_view_on_batch`
    — reflected-window catch-up, epoch guard, expected_base pinning,
    deep-vacuum self-heal). ``derive(v_after) -> DataFrame`` returns
    the full view at a base version; ``maintain(reflected, v_after,
    old_view) -> DataFrame`` advances the fed-back view across the
    window. The min/max (`streaming_maintained_view_pipeline`) and
    histogram (`streaming_maintained_histogram_pipeline`) streams are
    canned instances; pair this with `operators/ivm.maintain_top_k`
    or `maintain_moments` (or any caller-defined algebra with the
    same old-view contract) for the rest of the family."""
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(input_dir)
    )
    on_batch = _maintained_view_on_batch(store, view_store, derive, maintain)
    return (
        stream.writeStream.foreachBatch(on_batch)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
        .start()
    )


def streaming_maintained_joined_histogram_pipeline(
    spark: SparkSession,
    input_dir: str,
    schema: StructType,
    fact_store: SnapshotStore,
    dim_store: SnapshotStore,
    hist_store: SnapshotStore,
    checkpoint_dir: str,
    *,
    fact_key_col: str,
    dim_key_col: str,
    group_col: str,
    value_col: str,
    max_files_per_trigger: int = 10,
) -> StreamingQuery:
    """The JOINED maintained view at streaming cadence, with the dim
    evolving OUT OF BAND: fact micro-batches merge into
    ``fact_store`` while any other writer commits to ``dim_store`` on
    its own schedule, and every epoch advances the fact ⋈ dim
    per-(group, value) bins across BOTH stores' windows —
    ``maintain_joined_value_counts`` with one reflected version PER
    STORE recorded in the view's commit meta (``fact_version`` /
    ``dim_version``; the two-term identity never required the
    counters to align). Downstream consumers serve exact per-group
    COUNT(DISTINCT)/MEDIAN/MODE from the published bins with
    ``histogram_stats``.

    Same crash contract as the single-store skeleton, per store: a
    crash between the fact merge and the publish is caught up by the
    next epoch's spanning windows; an epoch whose BOTH feeds are
    empty skips the commit; the publish pins ``expected_base``; a
    vacuum (of either store) deeper than the view's lag self-heals
    with one from-scratch rejoin. Dim-only changes are reflected on
    the NEXT fact epoch — a quiet fact stream defers dim catch-up,
    which is the honest batch-driven trade (a caller needing tighter
    dim freshness drops a zero-row marker file to tick the stream)."""
    from ..operators.ivm import maintain_joined_value_counts

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(input_dir)
    )

    def on_batch(batch: DataFrame, epoch_id: int) -> None:
        if batch.isEmpty():
            return
        fact_store.merge(_dedup_newest(batch, fact_store))
        f_now = fact_store.current_version()
        d_now = dim_store.current_version()
        view_base = hist_store.current_version()
        meta = (
            hist_store.read_meta(view_base) or {}
        ) if view_base is not None else {}
        f_ref, d_ref = meta.get("fact_version"), meta.get("dim_version")
        if f_ref == f_now and d_ref == d_now:
            return  # replay after a completed publish

        def publish(view: DataFrame) -> None:
            hist_store.overwrite(
                view.localCheckpoint(eager=False),
                meta={"fact_version": f_now, "dim_version": d_now},
                expected_base=view_base,
            )

        def derive() -> DataFrame:
            return (
                fact_store.read(version=f_now)
                .join(
                    dim_store.read(version=d_now).select(
                        dim_key_col, group_col
                    ),
                    F.col(fact_key_col) == F.col(dim_key_col),
                )
                .groupBy(group_col, value_col)
                .agg(F.count(F.lit(1)).alias("c"))
            )

        if f_ref is None or d_ref is None:
            publish(derive())
            return
        try:
            if (
                fact_store.read_changes(
                    f_ref, f_now, update_images="both"
                ).isEmpty()
                and dim_store.read_changes(
                    d_ref, d_now, update_images="both"
                ).isEmpty()
            ):
                return
            old = hist_store.read(version=view_base).drop("_bucket")
            view = maintain_joined_value_counts(
                fact_store,
                dim_store,
                f_ref,
                f_now,
                fact_key_col=fact_key_col,
                dim_key_col=dim_key_col,
                group_col=group_col,
                value_col=value_col,
                old_hist=old,
                dim_v_from=d_ref,
                dim_v_to=d_now,
            )
        except ValueError as e:
            if "not retained" not in str(e):
                raise
            publish(derive())
            return
        publish(view)

    return (
        stream.writeStream.foreachBatch(on_batch)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
        .start()
    )


def streaming_maintained_nstore_pipeline(
    spark: SparkSession,
    input_dir: str,
    schema: StructType,
    fact_store: SnapshotStore,
    dim_stores: list,
    view_store: SnapshotStore,
    checkpoint_dir: str,
    *,
    derive,
    maintain,
    max_files_per_trigger: int = 10,
) -> StreamingQuery:
    """The N-STORE generalization of the joined maintained-view stream
    (r12 verdict #6): fact micro-batches merge into ``fact_store``
    while ANY NUMBER of dim stores evolve out of band on their own
    version counters, and every epoch advances the joined view across
    ALL stores' windows. The view's commit meta records one reflected
    version PER STORE (``store_versions`` — index 0 the fact, then
    the dims in order), so the telescoping decompositions (joined,
    joined3, joined top-k, ...) never require the counters to align.

    ``derive(versions) -> DataFrame`` rebuilds the view from scratch
    at the given per-store versions; ``maintain(windows, old_view) ->
    DataFrame`` advances the fed-back view across one ``(reflected,
    current)`` window per store, same order.

    Crash contract identical to the 2-store joined-histogram stream,
    per store: a crash between the fact merge and the publish is
    caught up by the next epoch's spanning windows; an epoch in which
    EVERY store's window is empty skips the commit; the publish pins
    ``expected_base``; a vacuum of ANY store deeper than the view's
    lag self-heals with one from-scratch ``derive``. Dim-only changes
    are reflected on the NEXT fact epoch — the batch-driven trade
    (a caller needing tighter dim freshness drops a zero-row marker
    file to tick the stream)."""
    stores = [fact_store, *dim_stores]
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(input_dir)
    )

    def on_batch(batch: DataFrame, epoch_id: int) -> None:
        if batch.isEmpty():
            return
        fact_store.merge(_dedup_newest(batch, fact_store))
        nows = [s.current_version() for s in stores]
        view_base = view_store.current_version()
        meta = (
            view_store.read_meta(view_base) or {}
        ) if view_base is not None else {}
        refs = meta.get("store_versions")
        if refs is not None and list(refs) == nows:
            return  # replay after a completed publish

        def publish(view: DataFrame) -> None:
            view_store.overwrite(
                view.localCheckpoint(eager=False),
                meta={"store_versions": nows},
                expected_base=view_base,
            )

        if refs is None:
            publish(derive(nows))
            return
        windows = list(zip(refs, nows))
        try:
            if all(
                s.read_changes(vf, vt, update_images="both").isEmpty()
                for s, (vf, vt) in zip(stores, windows)
            ):
                return
            old = view_store.read(version=view_base).drop("_bucket")
            view = maintain(windows, old)
        except ValueError as e:
            if "not retained" not in str(e):
                raise
            publish(derive(nows))
            return
        publish(view)

    return (
        stream.writeStream.foreachBatch(on_batch)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
        .start()
    )


def streaming_maintained_joined3_pipeline(
    spark: SparkSession,
    input_dir: str,
    schema: StructType,
    fact_store: SnapshotStore,
    dim1_store: SnapshotStore,
    dim2_store: SnapshotStore,
    view_store: SnapshotStore,
    checkpoint_dir: str,
    *,
    fact_key_col: str,
    dim1_key_col: str,
    dim1_attr_col: str,
    dim2_key_col: str,
    group_col: str,
    cents_col: str = "price",
    max_files_per_trigger: int = 10,
) -> StreamingQuery:
    """The THREE-TABLE joined view (fact ⋈ dim1 ⋈ dim2 per-group
    count/cents-sum — ``maintain_joined3_agg``'s telescoping
    three-term decomposition) at streaming cadence on the N-store
    skeleton: both dims evolve out of band, every term stays
    delta-bound, and the fact is never rescanned outside the shared
    changed-key slice."""
    from ..operators.ivm import maintain_joined3_agg

    def derive(versions):
        fv, d1v, d2v = versions
        cents = F.round(F.col(cents_col) * 100).cast("long")
        return (
            fact_store.read(version=fv)
            .join(
                dim1_store.read(version=d1v).select(
                    dim1_key_col, dim1_attr_col
                ),
                F.col(fact_key_col) == F.col(dim1_key_col),
            )
            .join(
                dim2_store.read(version=d2v).select(dim2_key_col, group_col),
                F.col(dim1_attr_col) == F.col(dim2_key_col),
            )
            .groupBy(group_col)
            .agg(
                F.count(F.lit(1)).cast("long").alias("n"),
                F.sum(cents).cast("long").alias("s"),
            )
        )

    def maintain(windows, old_view):
        (fvf, fvt), d1w, d2w = windows
        return maintain_joined3_agg(
            fact_store,
            dim1_store,
            dim2_store,
            fvf,
            fvt,
            fact_key_col=fact_key_col,
            dim1_key_col=dim1_key_col,
            dim1_attr_col=dim1_attr_col,
            dim2_key_col=dim2_key_col,
            group_col=group_col,
            cents_col=cents_col,
            old_view=old_view,
            dim1_window=d1w,
            dim2_window=d2w,
        )

    return streaming_maintained_nstore_pipeline(
        spark,
        input_dir,
        schema,
        fact_store,
        [dim1_store, dim2_store],
        view_store,
        checkpoint_dir,
        derive=derive,
        maintain=maintain,
        max_files_per_trigger=max_files_per_trigger,
    )


def streaming_maintained_joined_topk_pipeline(
    spark: SparkSession,
    input_dir: str,
    schema: StructType,
    fact_store: SnapshotStore,
    dim_store: SnapshotStore,
    view_store: SnapshotStore,
    checkpoint_dir: str,
    *,
    fact_key_col: str,
    dim_key_col: str,
    group_col: str,
    k: int,
    cents_col: str = "price",
    max_files_per_trigger: int = 10,
) -> StreamingQuery:
    """The JOINED TOP-K view (per-group count/sum + k largest cents
    over fact ⋈ dim — ``maintain_joined_top_k``: two-term n/s algebra,
    horizon-ruled candidate arrays, dim-departure threats) at
    streaming cadence: the dim evolves out of band via its own
    reflected version, insert-only cycles stay O(feed) array merges,
    and only horizon-threatened groups pay the group-pruned rejoin."""
    from pyspark.sql import Window

    from ..operators.ivm import maintain_joined_top_k

    def derive(versions):
        fv, dv = versions
        cents = F.round(F.col(cents_col) * 100).cast("long")
        w = Window.partitionBy(group_col).orderBy(F.desc("_c"))
        return (
            fact_store.read(version=fv)
            .join(
                dim_store.read(version=dv).select(dim_key_col, group_col),
                F.col(fact_key_col) == F.col(dim_key_col),
            )
            .select(group_col, cents.alias("_c"))
            .withColumn("_rk", F.row_number().over(w))
            .groupBy(group_col)
            .agg(
                F.count(F.lit(1)).cast("long").alias("n"),
                F.sum("_c").cast("long").alias("s"),
                F.reverse(
                    F.array_sort(
                        F.collect_list(
                            F.when(F.col("_rk") <= k, F.col("_c"))
                        )
                    )
                ).alias("topk"),
            )
        )

    def maintain(windows, old_view):
        (fvf, fvt), dw = windows
        return maintain_joined_top_k(
            fact_store,
            dim_store,
            fvf,
            fvt,
            fact_key_col=fact_key_col,
            dim_key_col=dim_key_col,
            group_col=group_col,
            k=k,
            cents_col=cents_col,
            old_view=old_view,
            dim_window=dw,
        )

    return streaming_maintained_nstore_pipeline(
        spark,
        input_dir,
        schema,
        fact_store,
        [dim_store],
        view_store,
        checkpoint_dir,
        derive=derive,
        maintain=maintain,
        max_files_per_trigger=max_files_per_trigger,
    )


def windowed_event_counts(
    events: DataFrame,
    *,
    window: str = "10 minutes",
    watermark: str = "30 minutes",
) -> DataFrame:
    """Watermarked tumbling counts per event type over a STREAMING
    events DataFrame; append-mode emits each window once it's final.

    Watermarks require TimestampType (not NTZ) — cast up front; with
    the session pinned to UTC the instant is unchanged."""
    events = events.withColumn("ts", F.col("ts").cast("timestamp"))
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("total_value"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n", "total_value")
    )


def streaming_dedup(
    records: DataFrame,
    key_cols: list[str] | tuple[str, ...] = ("content_hash",),
    *,
    ts_col: str = "ts",
    watermark: str = "60 minutes",
) -> DataFrame:
    """Streaming exact dedup: emit the FIRST record per key, suppress
    replays that arrive within the watermark horizon.

    ``dropDuplicatesWithinWatermark`` keys the state store on
    ``key_cols`` and — unlike plain streaming ``dropDuplicates``, whose
    state grows forever — evicts each key once the watermark passes its
    first-seen event time. At 100 TB-scale ingest the state is bounded
    by (keys seen per watermark horizon), not by stream history: the
    content-hash dedup twin of the batch ``exact_duplicates`` operator
    (operators/dedup.py) for the append-only ingest path, e.g.
    suppressing re-scanned unchanged files before the ES sink.
    """
    records = records.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    return records.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        list(key_cols)
    )


def streaming_neardup_pipeline(
    spark: SparkSession,
    input_dir: str,
    schema: StructType,
    band_store,
    matches_dir: str,
    checkpoint_dir: str,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.5,
    max_files_per_trigger: int = 10,
    matches_store=None,
) -> StreamingQuery:
    """Streaming NEAR-dup detection: every micro-batch of documents is
    probed against (then merged into) the persisted MinHash band index
    — the streaming cadence of operators/incremental_dedup.py, sharing
    the identical match_and_merge operator with the batch path (one
    code path, two cadences — the same rule run_incremental_pipeline
    follows for the snapshot merge).

    Each epoch costs O(batch): band derivation, a bucket-pruned index
    probe, and a bucket-pruned merge; state lives in the band store
    (disk, versioned), not the streaming state store, so the stream
    restarts cold with zero state rebuild. Failure semantics: the
    INDEX merge is idempotent under epoch replay (LWW upsert on the
    unique doc:band row key). The matches sink is chosen by the
    caller:

    - default (``matches_dir``): append-parquet — at-least-once; a
      replayed epoch can append duplicate match rows, readers dedup
      on (batch_id, corpus_id).
    - ``matches_store`` (a SnapshotStore keyed on the pair id with
      ``epoch`` as its version column): effectively-once — a replayed
      epoch's upsert collapses onto the same keys.
    """
    return _streaming_match_pipeline(
        spark,
        input_dir,
        schema,
        matches_dir,
        checkpoint_dir,
        max_files_per_trigger=max_files_per_trigger,
        match_fn=lambda batch, epoch_id: band_store.match_and_merge(
            batch,
            id_col,
            text_col,
            batch_seq=epoch_id + 1,  # seed() owns batch_seq 0
            threshold=threshold,
        ),
        key_cols=("batch_id", "corpus_id"),
        matches_store=matches_store,
    )


def streaming_substring_pipeline(
    spark: SparkSession,
    input_dir: str,
    schema: StructType,
    shingle_store,
    matches_dir: str,
    checkpoint_dir: str,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_files_per_trigger: int = 10,
    matches_store=None,
) -> StreamingQuery:
    """Streaming EXACT-SUBSTRING dedup: every micro-batch of documents
    is probed against (then merged into) the persisted positional
    shingle index — the streaming cadence of
    operators/incremental_substring.py, sharing the identical
    match_and_merge operator with the batch path. Same state, failure,
    and sink semantics as :func:`streaming_neardup_pipeline` (state in
    the versioned store, idempotent index merge under epoch replay via
    the LWW sid:pos key, at-least-once parquet matches or
    effectively-once via a keyed ``matches_store`` — here keyed on
    batch_id alone, since the span rollup emits one row per batch
    doc)."""
    return _streaming_match_pipeline(
        spark,
        input_dir,
        schema,
        matches_dir,
        checkpoint_dir,
        max_files_per_trigger=max_files_per_trigger,
        match_fn=lambda batch, epoch_id: shingle_store.match_and_merge(
            batch,
            id_col,
            text_col,
            batch_seq=epoch_id + 1,  # seed() owns batch_seq 0
        ),
        key_cols=("batch_id",),
        matches_store=matches_store,
    )


def streaming_changefeed_pipeline(
    spark: SparkSession,
    input_dir: str,
    schema: StructType,
    store: SnapshotStore,
    feed_dir: str,
    checkpoint_dir: str,
    *,
    max_files_per_trigger: int = 10,
    feed_store: SnapshotStore | None = None,
) -> StreamingQuery:
    """The change data feed at streaming cadence: each micro-batch is
    merged into the snapshot store AND the feed of what that merge
    actually did (insert/update rows; classification per
    sinks/snapshot.classify_changes) is published downstream.

    The feed is derived PRE-commit — the batch classified against the
    CURRENT bucket-pruned slice, i.e. exactly the rows the following
    merge will change — which makes it deterministic under epoch
    replay: a replayed epoch whose merge already committed re-derives
    against the post-merge state, classifies everything identical, and
    emits ZERO rows. With a keyed ``feed_store`` (key =
    key:change:epoch, LWW on epoch) the feed is therefore
    effectively-once across the whole crash window — crash before the
    merge collapses onto the same keys, crash after it emits nothing;
    the parquet-append path is at-least-once, matching the other
    streaming sinks' documented semantics.

    COST: the touched slice is read and upserted twice per batch —
    once for the feed derivation, once inside ``store.merge`` — a
    deliberate trade: deriving pre-commit is what buys replay
    determinism, and both passes are O(touched buckets), so the
    cadence stays delta-bound (2x a small number, never O(table))."""
    from ..operators.merge import upsert_newer_wins
    from ..sinks.snapshot import classify_changes

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(input_dir)
    )

    def on_batch(batch: DataFrame, epoch_id: int) -> None:
        if batch.isEmpty():
            return
        # _dedup_newest, NOT an inline version-only window: this is
        # the one pipeline whose contract is replay-deterministic
        # delta publication, so an equal-version duplicate key must
        # elect the same winner on the original run and its replay.
        deduped = _dedup_newest(batch, store)
        keys = [store.key] if isinstance(store.key, str) else list(store.key)
        if store.current_version() is None:
            feed = deduped.withColumn("_change", F.lit("insert"))
        else:
            tagged = deduped.withColumn("_bucket", store._bucket_col())
            touched = sorted(
                r._bucket for r in tagged.select("_bucket").distinct().collect()
            )
            # EAGER (r15): the slice feeds both the would-be merge
            # result and the classification join's old side — two
            # branches of the ONE plan the feed probe executes, so a
            # lazy checkpoint's blocks were race-computed inside that
            # action and the pruned read ran twice per epoch (the r14
            # measured failure mode). ckpt_shared = size-gated policy.
            old = ckpt_shared(store.read_buckets(touched).drop("_bucket"))
            new = upsert_newer_wins(old, deduped, store.key, store.version_col)
            feed = classify_changes(old, new, keys)
        feed = feed.withColumn("epoch", F.lit(epoch_id).cast("long"))
        # Materialize the feed BEFORE the merge commits (the plan
        # lazily reads the store's CURRENT version, so it must resolve
        # while that is still the pre-merge state); the checkpoint also
        # serves the isEmpty probe and the publish from one execution.
        feed = feed.localCheckpoint(eager=False)
        if feed.isEmpty():
            # Replayed or no-change epoch: the classification proved
            # the merge would be a no-op, so skip BOTH sinks AND the
            # store merge — otherwise every such epoch commits a no-op
            # version (hardlink layout: a full link-forward of every
            # bucket), the exact version churn the match pipeline's
            # isEmpty guard exists to prevent.
            return
        if feed_store is not None:
            # composite_id keeps the feed-store key id-compatible with
            # the batch CDC sync's composite ES _id (same escaping /
            # NULL encoding — sinks/es_bulk.py sync_actions_from_changes).
            feed_store.merge(
                feed.withColumn(
                    feed_store.key,
                    composite_id(
                        [*keys, F.col("_change"), F.col("epoch")]
                    ),
                )
            )
        else:
            feed.write.mode("append").parquet(feed_dir)
        store.merge(deduped)

    return (
        stream.writeStream.foreachBatch(on_batch)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
        .start()
    )


def streaming_curation_pipeline(
    spark: SparkSession,
    input_dir: str,
    schema: StructType,
    band_store,
    matches_dir: str,
    checkpoint_dir: str,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    quality_threshold: float = 0.5,
    neardup_threshold: float = 0.5,
    max_files_per_trigger: int = 10,
    matches_store=None,
) -> StreamingQuery:
    """The COMPOSED curation cycle at streaming cadence — the
    foreachBatch twin of plans/scale_queries.incremental_curation_cycle:
    per micro-batch, documents are quality-gated (the shared
    hashed-linear score, llm_pipeline5.quality_score_expr), quality
    survivors are probed against the persisted MinHash band index, and
    the emitted rows carry each survivor's kept/dropped verdict.
    Quality runs FIRST so the probe pays only for survivors; only
    survivors MERGE into the index (rejected docs never become corpus
    — the standard curation invariant that garbage must not poison the
    dedup index).

    Emitted rows: (batch_id, n_tokens, score, kept) — kept=false means
    a near-dup of the corpus-so-far at ``neardup_threshold``. Replay
    purity and sink semantics follow :func:`streaming_neardup_pipeline`
    (the probe matches strictly-earlier batch_seq only; the merge is
    an idempotent LWW upsert; a keyed ``matches_store`` gives
    effectively-once)."""
    import pyspark.sql.functions as F2

    from ..functions.text import tokens
    from ..plans.llm_pipeline5 import quality_score_expr

    def match_fn(batch: DataFrame, epoch_id: int) -> DataFrame:
        scored = (
            batch.select(
                F2.col(id_col).alias("batch_id"),
                F2.col(text_col).alias("_text"),
                tokens(text_col).alias("toks"),
            )
            .filter(F2.size("toks") > 0)
            .withColumn("score", quality_score_expr())
            .filter(F2.col("score") >= quality_threshold)
            .select(
                "batch_id", "_text", F2.size("toks").alias("n_tokens"), "score"
            )
            # Three consumers (probe, verdict join, merge) share one
            # computation of the tokenize+score chain.
            .localCheckpoint(eager=False)
        )
        if scored.isEmpty():
            # Every doc failed the quality gate: emit nothing and —
            # critically — skip the merge, which would otherwise commit
            # a no-op store version per rejected micro-batch (hardlink
            # layout: a full link-forward of every bucket, each epoch).
            return scored.select(
                "batch_id",
                "n_tokens",
                "score",
                F2.lit(True).alias("kept"),
            )
        matches = band_store.match_and_merge(
            scored.select(F2.col("batch_id").alias(id_col), F2.col("_text").alias(text_col)),
            id_col,
            text_col,
            batch_seq=epoch_id + 1,  # seed() owns batch_seq 0
            threshold=neardup_threshold,
        )
        matched = matches.select("batch_id").distinct().withColumn(
            "_dup", F2.lit(True)
        )
        return (
            scored.join(matched, "batch_id", "left")
            .select(
                "batch_id",
                "n_tokens",
                "score",
                F2.coalesce(~F2.col("_dup"), F2.lit(True)).alias("kept"),
            )
        )

    return _streaming_match_pipeline(
        spark,
        input_dir,
        schema,
        matches_dir,
        checkpoint_dir,
        max_files_per_trigger=max_files_per_trigger,
        match_fn=match_fn,
        key_cols=("batch_id",),
        matches_store=matches_store,
    )


# Per-epoch seq block width for the streaming IVF pipeline: the add
# takes slot 0 of the epoch's block, maintenance commits take slots
# 1.. — the domains are separated by construction (r12 verdict #2).
# The canonical value lives on the store side (incremental_ann) so
# seed() can STAMP it into the index meta and this pipeline can
# REFUSE a store stamped under a different scheme (r13 advice: a
# stride change silently breaks replay purity across an upgrade —
# a replayed pre-upgrade epoch N would search with the new scheme's
# max_seq and admit rows old epochs stamped under the old one).
from ..operators.incremental_ann import IVF_SEQ_STRIDE as _IVF_SEQ_STRIDE  # noqa: E402


def streaming_ivf_pipeline(
    spark: SparkSession,
    input_dir: str,
    schema: StructType,
    ivf_store,
    matches_dir: str,
    checkpoint_dir: str,
    *,
    id_col: str = "vec_id",
    vec_col: str = "emb",
    k: int = 3,
    nprobe: int = 2,
    max_files_per_trigger: int = 10,
    matches_store=None,
    split_threshold: int | None = None,
    merge_threshold: int = 0,
    maintain_every: int = 4,
    maintenance_rounds: int = 8,
) -> StreamingQuery:
    """Streaming ANN maintenance: every micro-batch of embeddings is
    SEARCHED against the persisted IVF index, then ADDED to it — the
    streaming cadence of operators/incremental_ann.py, completing the
    one-operator-two-cadences story for the whole incremental triad
    (bands, shingles, and now cells; r7 verdict #5). This is how ANN
    indexes are actually fed: an embedding stream arrives, each batch
    is first answered against the corpus-so-far, then becomes corpus.

    CELL MAINTENANCE (r12 verdict #2): a skewed stream degrades probe
    cost monotonically — 50% of adds landing in one cell makes every
    probe touching it O(hot cell) — so the epoch loop invokes the
    store's split/merge policy (``IvfIndexStore.maintain_cells``,
    enforced anti-oscillation hysteresis) when ``split_threshold`` is
    set, on EITHER trigger:

    - the ``maintain_every``-th epoch (the unconditional cadence
      fallback — it amortizes the policy's per-invocation O(live
      cells) count pass; the policy itself is O(hot/cold rows)); or
    - the O(delta) GROWTH HINT: the add path reports its per-cell
      batch counts (one bounded collect off the assignment it
      computes anyway), accumulated driver-side since the last
      maintenance invocation — when any cell's accumulated adds
      reach ``split_threshold // 2``, maintenance fires EARLY. Every
      cell is at or below the split threshold right after
      maintenance, so a cell stays below ~1.5x the threshold between
      hint firings: fast-building skew is repaired within epochs,
      not cadences, while cold stretches skip even the count pass.
      The hint is an upper bound (LWW re-adds/deletes not netted;
      replays re-count; a restart resets it to the cadence fallback)
      — it can fire early, never suppresses the cadence.

    Maintenance is replay-idempotent: a re-run epoch finds every cell
    already within both bands and commits nothing.

    SEQ DOMAINS: each epoch owns the block
    ``[(epoch+1)*_IVF_SEQ_STRIDE, (epoch+2)*_IVF_SEQ_STRIDE)`` — the
    add takes slot 0, maintenance commits take slots 1.. (one per
    committed split round / merge), so the two sequences can never
    collide and maintenance seqs always exceed every row they
    re-stamp. Seed() owns block 0.

    Replay purity: the search passes ``max_seq =`` the epoch's add
    seq, and the store cuts on the VISIBILITY seq (``ivf_vis``, which
    maintenance carries through unchanged), so a replayed epoch
    (index add committed, matches sink did not) never matches its own
    already-committed rows and sees exactly the pre-epoch corpus even
    after rebalances. The add is idempotent under replay (LWW upsert
    on the vector id). One documented approximation: a split/merge
    that committed before the crash refines the CELL LAYOUT, so a
    replayed probe may explore slightly different cells than the
    original run did — the answer is a valid IVF answer over the
    identical visible corpus (IVF is approximate by contract); the
    keyed ``matches_store`` keeps the sink effectively-once either
    way. Matches sink semantics as in
    :func:`streaming_neardup_pipeline` (at-least-once parquet, or
    effectively-once via a ``matches_store`` keyed on the
    (query_id, neighbor_id) pair)."""
    if split_threshold is not None:
        if maintenance_rounds + 2 > _IVF_SEQ_STRIDE:
            raise ValueError(
                f"streaming_ivf_pipeline: maintenance_rounds="
                f"{maintenance_rounds} needs {maintenance_rounds + 2} seq "
                f"slots per epoch but the stride is {_IVF_SEQ_STRIDE}"
            )
        if maintain_every < 1:
            raise ValueError("maintain_every must be >= 1")
    # Seq-scheme guard (r13 advice): the store's seed meta stamps the
    # stride its rows' epoch seqs were computed under; a code-side
    # stride change with an existing checkpoint would replay old
    # epochs with the NEW scheme's max_seq and admit rows the original
    # epoch never saw. Refuse up front — rebuilding the index (reseed)
    # or the checkpoint is the migration. Stores seeded before the
    # stamp existed default to the current value (the only scheme any
    # persisted store in this codebase streamed under).
    _meta = ivf_store.store.read_meta() or {}
    _stamped = int(_meta.get("ivf_seq_stride", _IVF_SEQ_STRIDE))
    if _stamped != _IVF_SEQ_STRIDE:
        raise ValueError(
            f"streaming_ivf_pipeline: index at {ivf_store.path} was "
            f"seeded under seq stride {_stamped}, but this build stamps "
            f"{_IVF_SEQ_STRIDE} — replaying its checkpoints would break "
            "replay purity (old epochs' rows would leak into bounded "
            "searches). Re-seed the index and rebuild the stream "
            "checkpoint to migrate."
        )

    # Growth since the last maintenance invocation, per cell — the
    # O(delta) early trigger (driver-side, bounded by the cell count;
    # a restart falls back to the cadence until it re-accumulates).
    growth: dict = {}

    def match_fn(batch: DataFrame, epoch_id: int) -> DataFrame:
        seq = (epoch_id + 1) * _IVF_SEQ_STRIDE  # seed() owns block 0
        matches = ivf_store.search(
            batch, id_col, vec_col, k=k, nprobe=nprobe, max_seq=seq
        )
        # Lazy matches stay valid across the add AND the maintenance
        # below: versions are immutable and retained until vacuum
        # (store contract), and the max_seq cut is on ivf_vis, which
        # maintenance never changes.
        ivf_store.add(
            batch,
            id_col,
            vec_col,
            seq=seq,
            cell_counts=growth if split_threshold is not None else None,
        )
        if split_threshold is not None:
            due = (epoch_id + 1) % maintain_every == 0
            hot_hint = growth and max(growth.values()) >= max(
                1, split_threshold // 2
            )
            if due or hot_hint:
                # max_retries > 0: a concurrent writer funnels into
                # the retryable expected_base channel; the policy
                # re-derives against the moved base instead of
                # failing the epoch.
                ivf_store.maintain_cells(
                    split_threshold=split_threshold,
                    merge_threshold=merge_threshold,
                    seq=seq + 1,
                    max_rounds=maintenance_rounds,
                    max_retries=2,
                )
                growth.clear()
        return matches

    return _streaming_match_pipeline(
        spark,
        input_dir,
        schema,
        matches_dir,
        checkpoint_dir,
        max_files_per_trigger=max_files_per_trigger,
        match_fn=match_fn,
        key_cols=("query_id", "neighbor_id"),
        matches_store=matches_store,
    )


def _streaming_match_pipeline(
    spark: SparkSession,
    input_dir: str,
    schema: StructType,
    matches_dir: str,
    checkpoint_dir: str,
    *,
    max_files_per_trigger: int,
    match_fn,
    key_cols: tuple[str, ...],
    matches_store,
) -> StreamingQuery:
    """Shared probe-then-merge micro-batch loop for the incremental
    index stores (one definition, N cadences — the store_common.py
    rule applied to the streaming layer): read files as a stream, call
    the store's match_and_merge per epoch, land matches in
    append-parquet (at-least-once) or a SnapshotStore keyed on
    ``key_cols`` (effectively-once under epoch replay)."""
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(input_dir)
    )

    def on_batch(batch: DataFrame, epoch_id: int) -> None:
        if batch.isEmpty():
            return
        matches = match_fn(batch, epoch_id).withColumn(
            "epoch", F.lit(epoch_id).cast("long")
        )
        if matches.isEmpty():
            # Nothing to record: skip the sink entirely — a keyed
            # matches_store merge of zero rows would still commit a
            # fresh no-op store version per epoch (hardlink layout:
            # a full link-forward of every bucket), and a stream of
            # match-free batches would grow the version chain
            # unboundedly. match_fn's own side effects (the index
            # merge) have already run.
            return
        if matches_store is not None:
            matches_store.merge(
                matches.withColumn(
                    matches_store.key,
                    composite_id(list(key_cols)),
                )
            )
            return
        matches.write.mode("append").parquet(matches_dir)

    return (
        stream.writeStream.foreachBatch(on_batch)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .start()
    )


def stream_stream_error_after_purchase(
    events: DataFrame,
    *,
    horizon_seconds: int = 600,
    watermark: str = "30 minutes",
) -> DataFrame:
    """Watermarked stream-stream interval join — the streaming twin of
    plans.range_join_error_after_purchase: every error by the same
    user within ``horizon_seconds`` AFTER a purchase.

    Both sides carry watermarks and the join condition bounds the
    event-time gap, so Spark derives a state-eviction horizon: each
    side buffers only rows younger than watermark + horizon — state is
    O(recent traffic), never O(stream history). This is the shape for
    cross-stream correlation at scale (click↔conversion, scan↔index
    confirmation); an unbounded-condition stream-stream join would be
    rejected by the engine outright in append mode.
    """
    ev = events.withColumn("ts", F.col("ts").cast("timestamp"))
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("p_event"),
            F.col("user_id").alias("p_user"),
            F.col("ts").alias("p_ts"),
        )
        .withWatermark("p_ts", watermark)
    )
    e = (
        ev.filter(F.col("event_type") == "error")
        .select(
            F.col("event_id").alias("e_event"),
            F.col("user_id").alias("e_user"),
            F.col("ts").alias("e_ts"),
        )
        .withWatermark("e_ts", watermark)
    )
    return p.join(
        e,
        (F.col("p_user") == F.col("e_user"))
        & (F.col("e_ts") > F.col("p_ts"))
        & (
            F.col("e_ts")
            <= F.col("p_ts") + F.expr(f"INTERVAL {horizon_seconds} SECOND")
        ),
        "inner",
    ).select(
        "p_event",
        "e_event",
        F.col("p_user").alias("user_id"),
        F.expr("timestampdiff(MICROSECOND, p_ts, e_ts)").alias("gap_us"),
    )


def sessionized_event_stats(
    events: DataFrame,
    *,
    gap: str = "30 minutes",
    watermark: str = "60 minutes",
) -> DataFrame:
    """Streaming session windows per user (state cleaned up past the
    watermark) — the streaming twin of plans.window_session_30m."""
    events = events.withColumn("ts", F.col("ts").cast("timestamp"))
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"), F.sum("value").alias("total_value"))
        .select(
            "user_id", F.col("w.start").alias("session_start"), "n_events", "total_value"
        )
    )


def streaming_maintained_partition_pipeline(
    spark: SparkSession,
    input_dir: str,
    schema: StructType,
    fact_store: SnapshotStore,
    dim_store: SnapshotStore,
    view_store: SnapshotStore,
    checkpoint_dir: str,
    *,
    fact_key_col: str,
    dim_key_col: str,
    max_files_per_trigger: int = 10,
) -> StreamingQuery:
    """The join-membership (semi/anti) partition at streaming cadence
    with DELTA PUBLICATION: fact micro-batches merge into
    ``fact_store`` while a dim writer commits out of band, and every
    epoch advances the membership-tagged fact view by MERGING only
    what changed into ``view_store`` (``operators/ivm.
    join_membership_delta``) — the view is O(|fact|), so overwriting
    it per epoch would pay a fact-sized write for a feed-sized
    change; here the store IS the feedback loop (no old-view frame is
    ever rebuilt) and publication costs O(feed + flips). The rows are
    stamped with a maintenance version column ``_vm`` = the fact
    version they reflect, so replayed merges resolve newer-wins.

    Crash contract (per store, like the joined-histogram stream): the
    view's commit meta records the fact and dim versions it reflects;
    a crash between the fact merge and the publish is caught up by
    the next epoch's spanning windows; an epoch with both feeds empty
    skips; a vacuum deeper than the lag self-heals with one
    from-scratch classify (overwrite). Dim-only changes ride the next
    fact epoch (drop a zero-row marker file for tighter dim
    freshness). Reference parity: this is the standing form of the
    reference's per-scan orphan NOT-IN rescan (scanner.py:447-454)."""
    from ..operators.ivm import classify_membership, join_membership_delta

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(input_dir)
    )

    def on_batch(batch: DataFrame, epoch_id: int) -> None:
        if batch.isEmpty():
            return
        fact_store.merge(_dedup_newest(batch, fact_store))
        f_now = fact_store.current_version()
        d_now = dim_store.current_version()
        view_base = view_store.current_version()
        meta = (
            view_store.read_meta(view_base) or {}
        ) if view_base is not None else {}
        f_ref, d_ref = meta.get("fact_version"), meta.get("dim_version")
        if f_ref == f_now and d_ref == d_now:
            return  # replay after a completed publish

        vmeta = {"fact_version": f_now, "dim_version": d_now}

        def derive() -> DataFrame:
            return classify_membership(
                fact_store.read(version=f_now).drop("_bucket"),
                dim_store,
                d_now,
                fact_key_col=fact_key_col,
                dim_key_col=dim_key_col,
            ).withColumn("_vm", F.lit(f_now))

        if f_ref is None or d_ref is None:
            view_store.overwrite(
                derive(), meta=vmeta, expected_base=view_base
            )
            return
        try:
            if (
                fact_store.read_changes(
                    f_ref, f_now, update_images="both"
                ).isEmpty()
                and dim_store.read_changes(
                    d_ref, d_now, update_images="both"
                ).isEmpty()
            ):
                return
            upserts, removed = join_membership_delta(
                fact_store,
                dim_store,
                f_ref,
                f_now,
                fact_key_col=fact_key_col,
                dim_key_col=dim_key_col,
                view_df=view_store.read(version=view_base).drop("_vm"),
                dim_v_from=d_ref,
                dim_v_to=d_now,
            )
        except ValueError as e:
            if "not retained" not in str(e):
                raise
            view_store.overwrite(
                derive(), meta=vmeta, expected_base=view_base
            )
            return
        view_store.merge(
            upserts.withColumn("_vm", F.lit(f_now)).localCheckpoint(
                eager=False
            ),
            removed=removed,
            meta=vmeta,
            expected_base=view_base,
        )

    return (
        stream.writeStream.foreachBatch(on_batch)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
        .start()
    )


def streaming_bm25_pipeline(
    spark: SparkSession,
    input_dir: str,
    schema: StructType,
    bm25_store,
    matches_dir: str,
    checkpoint_dir: str,
    *,
    standing_queries: list[tuple[str, list[str]]],
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 5,
    max_files_per_trigger: int = 10,
    matches_store=None,
) -> StreamingQuery:
    """Streaming retrieval maintenance — the BM25 index's cadence in
    the one-operator-two-cadences family (bands, shingles, cells, and
    now postings): every micro-batch of documents is ADDED to the
    persisted term-bucketed index (bucket-pruned merge, O(batch
    tokens); the doc-length sidecar and turnstile stats advance with
    it), then every STANDING QUERY is re-served top-k from the
    post-epoch index — the continuous-monitoring shape ("alert when a
    new document enters my query's top-k"), which is an ADD-THEN-SERVE
    loop where the IVF stream is search-then-add (a query stream vs a
    standing-query set).

    Replay: adds are row-idempotent (LWW on (term, doc_id)) and the
    stats fold is seq-watermarked (Bm25IndexStore.add), so a replayed
    epoch re-lands identical content and re-serves identical scores;
    with a ``matches_store`` the sink is effectively-once on
    (query_id, doc_id, epoch). New docs only (the store's
    append-mostly contract) — a mutating feed routes through
    remove_docs out of band, exactly like the band store's stream."""
    if not standing_queries:
        raise ValueError(
            "streaming_bm25_pipeline: standing_queries must be non-empty"
        )

    def match_fn(batch: DataFrame, epoch_id: int) -> DataFrame:
        bm25_store.add(batch, id_col, text_col, seq=epoch_id + 1)
        out = None
        for qid, terms in standing_queries:
            served = bm25_store.search(list(terms), k=k).select(
                F.lit(qid).alias("query_id"), "doc_id", "bm25"
            )
            out = served if out is None else out.unionByName(served)
        return out

    return _streaming_match_pipeline(
        spark,
        input_dir,
        schema,
        matches_dir,
        checkpoint_dir,
        max_files_per_trigger=max_files_per_trigger,
        match_fn=match_fn,
        key_cols=("query_id", "doc_id", "epoch"),
        matches_store=matches_store,
    )


def streaming_zorder_pipeline(
    spark: SparkSession,
    input_dir: str,
    schema: StructType,
    layout_dir: str,
    checkpoint_dir: str,
    *,
    dims_factory,
    bits: int = 10,
    cells: int = 64,
    max_files_per_trigger: int = 10,
) -> StreamingQuery:
    """Streaming ingestion INTO the Z-ordered layout: every micro-batch
    places on the curve and appends O(batch) files with
    ``sinks/zorder.append_zordered`` (first batch seeds via
    ``write_zordered``), keeping the zone map current so downstream
    rectangle scans prune against data that is seconds old — the
    streaming half of the write/append/OPTIMIZE lifecycle, with
    OPTIMIZE still a batch-cadence compaction.

    Replay purity rides the layout's OWN epoch ledger: the append is
    stamped ``epoch=<foreachBatch epoch_id>``, so an at-least-once
    replay of a committed epoch is a no-op inside append_zordered (the
    same id-based idempotence contract as the index stores' LWW
    merges). ``dims_factory()`` returns the dims mapping — a factory
    because Column expressions are cheap to rebuild per batch and a
    shared instance would be closure-captured across restarts."""
    import os

    from ..sinks.zorder import append_zordered, write_zordered

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(input_dir)
    )

    def on_batch(batch: DataFrame, epoch_id: int) -> None:
        if batch.isEmpty():
            return
        if not os.path.exists(os.path.join(layout_dir, "_ZONES.json")):
            # Seed records its own epoch: a replay of the seeding batch
            # after the manifest committed must take the append path's
            # no-op branch, not double-append. A crash BEFORE the
            # manifest commit replays the seed itself (mode=overwrite,
            # idempotent).
            write_zordered(
                batch,
                layout_dir,
                dims_factory(),
                bits=bits,
                cells=cells,
                epoch=f"stream-{epoch_id}",
            )
            return
        append_zordered(
            batch,
            layout_dir,
            dims_factory(),
            bits=bits,
            cells=cells,
            epoch=f"stream-{epoch_id}",
        )

    return (
        stream.writeStream.foreachBatch(on_batch)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
        .start()
    )
