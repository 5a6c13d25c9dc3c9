"""Z-order clustered layout with zone-map pruned reads.

Hash-bucketed stores (sinks/snapshot.py) serve KEY lookups; this module
serves the other physical-design axis: MULTI-DIMENSIONAL RANGE scans
("events between Jan 10 and Jan 15 with value in [100, 150]"). A table
sorted on one column prunes only that column's predicates; interleaving
the bits of two columns' cell coordinates (the Z-order / Morton curve —
the same layout Delta Lake's OPTIMIZE ZORDER BY and many warehouse
CLUSTER BY implementations use) keeps rows close in BOTH dimensions, so
a rectangle predicate touches a small set of contiguous curve cells
instead of every file.

Layout contract:

- ``write_zordered(df, path, dims)`` computes a Morton code from each
  dimension's integer cell coordinate, derives a coarse cell id from
  its top bits (``_zb``), writes ``partitionBy("_zb")``, and records a
  ZONE MAP — per-cell min/max of each RAW dimension column, measured
  from the data — in ``_ZONES.json`` next to the data.
- ``read_zordered(spark, path, ranges)`` prunes cells whose recorded
  [min, max] cannot intersect every range predicate, reads only the
  surviving cell directories, and applies the exact residual filter.

Soundness is UNCONDITIONAL on the placement function: pruning decisions
use only the measured per-cell min/max of the raw columns, so a bad
coordinate mapping (skew, clamping, even a constant) can only degrade
pruning RATIO, never correctness — the same contract parquet row-group
stats give inside each file. The Morton interleave is what makes the
ratio good: at 100 TB with 4096 cells, a 1%-selectivity rectangle
touches O(sqrt) of the curve instead of every file a 1-D sort would
leave it smeared across.

Scale notes: the zone map is O(cells) driver-side JSON (bounded by
construction, like the snapshot store's version meta); the clustered
write is one repartition-by-cell shuffle; stats ride the same job as
an O(cells) aggregate. Readers never list non-surviving directories.
"""

from __future__ import annotations

import json
import os
import shutil

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, SparkSession

_ZONES = "_ZONES.json"


def morton_interleave(x: Column, y: Column, bits: int) -> Column:
    """Bit-interleave two non-negative integer cell coordinates into a
    Morton (Z-curve) code: x's bit i lands at 2i, y's at 2i+1. Pure
    column expression (stays inside whole-stage codegen — no UDF).
    Coordinates are clamped to [0, 2^bits) first; clamping affects
    only placement, never pruning soundness (see module docstring)."""
    cap = F.lit((1 << bits) - 1).cast("long")
    one = F.lit(1).cast("long")
    cx = F.least(F.greatest(x.cast("long"), F.lit(0).cast("long")), cap)
    cy = F.least(F.greatest(y.cast("long"), F.lit(0).cast("long")), cap)
    z = F.lit(0).cast("long")
    for i in range(bits):
        z = z.bitwiseOR(
            F.shiftleft(F.shiftright(cx, i).bitwiseAND(one), 2 * i)
        ).bitwiseOR(F.shiftleft(F.shiftright(cy, i).bitwiseAND(one), 2 * i + 1))
    return z


def _curve_cluster(df: DataFrame, ex: Column, ey: Column, bits: int, cells: int):
    """Shared writer shape: Morton code -> coarse cell id, ONE shuffle
    that co-locates each cell's rows (so a cell writes one file, not
    one per upstream task — the compaction property OPTIMIZE relies
    on), and an intra-partition sort on the full code so parquet
    row-group min/max stats skip WITHIN a cell too. ``cells`` caps the
    write parallelism — size it to the cluster (the same knob as the
    snapshot store's bucket count)."""
    z = morton_interleave(F.coalesce(ex, F.lit(0)), F.coalesce(ey, F.lit(0)), bits)
    shift = 2 * bits - (cells.bit_length() - 1)
    return (
        df.withColumn("_z", z)
        .withColumn("_zb", F.shiftright(F.col("_z"), shift).cast("int"))
        .repartition(cells, "_zb")
        .sortWithinPartitions("_zb", "_z")
        .drop("_z")
    )


def write_zordered(
    df: DataFrame,
    path: str,
    dims: dict[str, Column],
    *,
    bits: int = 10,
    cells: int = 64,
    epoch: str | None = None,
) -> dict:
    """Cluster ``df`` on the Z-curve of two dimensions and write it
    with a zone map.

    ``dims`` maps exactly two RAW column names to integer cell-
    coordinate expressions (e.g. ``{"ts": hours_since_base, "value":
    floor(value)}``). Rows are placed by the top ``log2(cells)`` bits
    of the Morton code of those coordinates (null coordinates place in
    cell 0 — their rows match no range predicate, so placement is
    arbitrary); the zone map records per-cell min/max of the raw
    columns. ``epoch`` seeds the idempotency ledger — a streaming
    writer whose FIRST batch seeds the layout records it so a replay
    of that batch takes append_zordered's no-op path instead of
    double-appending (the overwrite itself is replay-idempotent).
    Returns the manifest dict."""
    if len(dims) != 2:
        raise ValueError("z-order layout takes exactly two dimensions")
    if cells & (cells - 1):
        raise ValueError("cells must be a power of two")
    (cx, ex), (cy, ey) = dims.items()
    clustered = _curve_cluster(df, ex, ey, bits, cells)
    clustered.write.mode("overwrite").partitionBy("_zb").parquet(path)
    # Zone map measured from what was WRITTEN (one O(cells) aggregate):
    # re-read the committed files so the stats can never drift from the
    # data under a speculative re-execution of the write job.
    stats = (
        df.sparkSession.read.parquet(path)
        .groupBy("_zb")
        .agg(
            F.min(cx).alias("minx"),
            F.max(cx).alias("maxx"),
            F.min(cy).alias("miny"),
            F.max(cy).alias("maxy"),
        )
        .collect()
    )

    def _js(v):
        # Timestamps serialize with a SPACE separator so the zone map's
        # lexical comparison lines up with "YYYY-MM-DD HH:MM:SS"
        # predicate literals (isoformat's default 'T' would not).
        return v.isoformat(sep=" ") if hasattr(v, "isoformat") else v

    manifest = {
        "dims": [cx, cy],
        "bits": bits,
        "cells_cfg": cells,
        "epochs": [] if epoch is None else [epoch],
        "cells": {
            str(r["_zb"]): {
                cx: [_js(r["minx"]), _js(r["maxx"])],
                cy: [_js(r["miny"]), _js(r["maxy"])],
            }
            for r in stats
        },
    }
    tmp = os.path.join(path, _ZONES + ".tmp")
    with open(tmp, "w") as f:
        json.dump(manifest, f)
    os.replace(tmp, os.path.join(path, _ZONES))
    return manifest


def optimize_zordered(
    spark: SparkSession,
    path: str,
    dims: dict[str, Column],
    *,
    bits: int | None = None,
    cells: int | None = None,
) -> dict:
    """Re-cluster the layout — the OPTIMIZE half of the
    append/OPTIMIZE lifecycle. Because placement is curve-stable and
    the zone map is cell-granular, in-range appends do NOT widen
    bounds (only clamped outliers and null coordinates can, landing in
    edge cells); what appends DO degrade is the physical file layout —
    each batch leaves one more small file per touched cell, and the
    cell count chosen for last year's table under-partitions this
    year's. OPTIMIZE rewrites once to (a) compact each cell's file
    pile and (b) optionally re-grid at a finer ``cells`` granularity
    (the rebucket analog — finer cells = tighter bounds = better
    pruning ratio), then resets the epoch ledger (appended batches are
    now base). Layout config is read from the manifest unless
    overridden.

    O(table) rewrite by construction — run it at compaction cadence,
    not per batch. The rewrite stages into ``<path>.compact`` and
    atomically renames over the old directory, so readers holding the
    old manifest keep a consistent (stale) view and a crash leaves
    the original layout untouched."""
    mpath = os.path.join(path, _ZONES)
    with open(mpath) as f:
        manifest = json.load(f)
    if list(manifest["dims"]) != list(dims):
        raise ValueError(
            f"dimension mismatch: store has {manifest['dims']}, "
            f"optimize has {list(dims)}"
        )
    bits = manifest["bits"] if bits is None else bits
    cells = manifest["cells_cfg"] if cells is None else cells
    # Bloom sidecars are layout-granular (per-cell bitmaps), so a
    # re-cluster invalidates them wholesale. Collect their specs now
    # and rebuild them against the NEW layout after the swap — without
    # this, the first post-OPTIMIZE lookup dies on a missing sidecar
    # the caller built in good faith.
    bloom_specs = []
    for fn in os.listdir(path):
        if fn.startswith("_BLOOM_") and fn.endswith(".json"):
            with open(os.path.join(path, fn)) as bf:
                bm = json.load(bf)
            bloom_specs.append(
                (bm["col"], bm["k"], bm.get("bits_per_row", 10))
            )
    df = spark.read.parquet(path).drop("_zb")
    staging = path.rstrip("/") + ".compact"
    new_manifest = write_zordered(df, staging, dims, bits=bits, cells=cells)
    old = path.rstrip("/") + ".old"
    if os.path.exists(old):
        shutil.rmtree(old)
    os.rename(path, old)
    os.rename(staging, path)
    shutil.rmtree(old)
    for col, k, bpr in bloom_specs:
        build_zorder_bloom(spark, path, col, k=k, bits_per_row=bpr)
    return new_manifest


def _lt(a, b) -> bool:
    """Type-aware less-than for zone bounds: numeric when both sides
    are numbers, lexical otherwise (timestamps are space-separated
    zero-padded ISO strings, where lexical == chronological)."""
    if isinstance(a, (int, float)) and isinstance(b, (int, float)):
        return a < b
    return str(a) < str(b)


def append_zordered(
    df: DataFrame,
    path: str,
    dims: dict[str, Column],
    *,
    bits: int = 10,
    cells: int = 64,
    epoch: str | None = None,
) -> dict:
    """Incremental maintenance of a Z-ordered layout: place a DELTA
    batch on the same curve, append its files to the touched cell
    directories, and WIDEN the zone map (min-of-mins / max-of-maxs per
    cell) — the append-then-OPTIMIZE half of the Delta/Iceberg
    lifecycle, O(batch) work with no rewrite of existing files.
    Appending can only widen cell bounds, so every previously-sound
    prune stays sound; the ratio degrades gradually as cells widen and
    a periodic re-cluster (write_zordered over the union) restores it.

    ``dims``/``bits``/``cells`` must match the layout the store was
    written with (validated against the manifest). ``epoch`` makes the
    append IDEMPOTENT for at-least-once callers: a batch id already
    recorded in the manifest is skipped (same contract as the snapshot
    store's replay-safe merges). Returns the updated manifest.

    Durability contract (documented, not hidden): data files append
    BEFORE the manifest swap, so a crash in between leaves a torn
    batch readable in already-known cells and its epoch unrecorded —
    a retry then duplicates those rows. Single-writer-under-flock
    callers (the registered queries) never hit this; a multi-writer
    deployment should wrap this layer in the snapshot store's
    versioned-pointer commit (sinks/snapshot.py) instead of raw
    directories."""
    mpath = os.path.join(path, _ZONES)
    with open(mpath) as f:
        manifest = json.load(f)
    if manifest.get("bits") != bits or manifest.get("cells_cfg") != cells:
        raise ValueError(
            f"layout mismatch: store written at bits={manifest.get('bits')} "
            f"cells={manifest.get('cells_cfg')}, append asked for "
            f"bits={bits} cells={cells}"
        )
    if list(manifest["dims"]) != list(dims):
        raise ValueError(
            f"dimension mismatch: store has {manifest['dims']}, "
            f"append has {list(dims)}"
        )
    if epoch is not None and epoch in manifest.get("epochs", []):
        return manifest
    (cx, ex), (cy, ey) = dims.items()
    batch = _curve_cluster(df, ex, ey, bits, cells)
    stats = (
        batch.groupBy("_zb")
        .agg(
            F.min(cx).alias("minx"),
            F.max(cx).alias("maxx"),
            F.min(cy).alias("miny"),
            F.max(cy).alias("maxy"),
        )
        .collect()
    )
    batch.write.mode("append").partitionBy("_zb").parquet(path)

    def _js(v):
        return v.isoformat(sep=" ") if hasattr(v, "isoformat") else v

    def _widen(old, new):
        if old is None:
            return new
        if new is None:
            return old
        lo = new[0] if old[0] is None or (new[0] is not None and _lt(new[0], old[0])) else old[0]
        hi = new[1] if old[1] is None or (new[1] is not None and _lt(old[1], new[1])) else old[1]
        return [lo, hi]

    for r in stats:
        cell = str(r["_zb"])
        fresh = {
            manifest["dims"][0]: [_js(r["minx"]), _js(r["maxx"])],
            manifest["dims"][1]: [_js(r["miny"]), _js(r["maxy"])],
        }
        if cell in manifest["cells"]:
            for col in manifest["dims"]:
                manifest["cells"][cell][col] = _widen(
                    manifest["cells"][cell][col], fresh[col]
                )
        else:
            manifest["cells"][cell] = fresh
    if epoch is not None:
        manifest.setdefault("epochs", []).append(epoch)
    tmp = mpath + ".tmp"
    with open(tmp, "w") as f:
        json.dump(manifest, f)
    os.replace(tmp, mpath)
    return manifest


def zone_prune(manifest: dict, ranges: dict[str, tuple]) -> tuple[list[int], int]:
    """Which cells can intersect every [lo, hi] predicate (closed
    interval). Returns (surviving cell ids, total cells). Driver-side
    over O(cells) JSON."""
    for col in ranges:
        if col not in manifest["dims"]:
            raise KeyError(f"no zone-map dimension {col!r}")
    keep = []
    for cell, zones in manifest["cells"].items():
        ok = True
        for col, (lo, hi) in ranges.items():
            mn, mx = zones[col]
            if mn is None or mx is None:  # all-null cell: no row matches
                ok = False
                break
            if _lt(hi, mn) or _lt(mx, lo):
                ok = False
                break
        if ok:
            keep.append(int(cell))
    return sorted(keep), len(manifest["cells"])


def read_zordered(
    spark: SparkSession, path: str, ranges: dict[str, tuple]
) -> tuple[DataFrame | None, int, int]:
    """Pruned range read: open ONLY the cell directories the zone map
    says can match, then apply the exact residual filter (cells are
    coarse; stats skipping is a superset guarantee, exactly like
    parquet row-group stats). Returns (df, cells_read, cells_total);
    df is None when every cell prunes away."""
    with open(os.path.join(path, _ZONES)) as f:
        manifest = json.load(f)
    keep, total = zone_prune(manifest, ranges)
    if not keep:
        return None, 0, total
    paths = [os.path.join(path, f"_zb={c}") for c in keep]
    df = spark.read.option("basePath", path).parquet(*paths)
    cond = F.lit(True)
    for col, (lo, hi) in ranges.items():
        cond = cond & F.col(col).between(F.lit(lo), F.lit(hi))
    return df.filter(cond), len(keep), total


# ---------------------------------------------------------------------------
# Bloom file-skipping sidecar — point lookups on a NON-curve column
# ---------------------------------------------------------------------------

# The zone map prunes range predicates on the two CURVE dimensions; a
# point lookup on any other column (find these event ids / user ids /
# doc ids) would still open every cell. A per-cell Bloom filter over a
# designated lookup column — the Delta Lake bloom-filter-index /
# parquet bloom analog, kept at CELL granularity to match this layout's
# pruning unit — lets the reader open only cells whose filter claims
# the key. No false negatives by construction (soundness is
# unconditional: a bit can only be SET by a row, never cleared), and
# false positives only cost extra reads that the exact residual filter
# then discards.


def _bloom_paths(path: str, col: str) -> tuple[str, str]:
    return (
        os.path.join(path, f"_BLOOM_{col}.parquet"),
        os.path.join(path, f"_BLOOM_{col}.json"),
    )


def build_zorder_bloom(
    spark: SparkSession,
    path: str,
    col: str,
    *,
    k: int = 3,
    bits_per_row: int = 10,
) -> dict:
    """Build the per-cell Bloom sidecar for ``col`` over an existing
    Z-ordered layout.

    Fully executor-side: each row contributes ``k`` set bits at
    positions xxhash64(col, seed) mod m; bits pack into 64-bit words
    with one groupBy((cell, word)) + bit_or — the same word-packing
    shape as decontaminate_bloom's bitmap (plans/llm_pipeline5.py), so
    the sidecar job shuffles O(rows·k) small tuples and writes
    O(cells · m/64) rows of (cell, word, bits) PARQUET (not JSON: at
    100 TB with 10⁵ cells the bitmap is a table, and the probe wants to
    JOIN it, not download it). ``m`` is sized from the widest cell
    (next power of two of bits_per_row × max rows/cell → ~10 bits/row
    ≈ 1% false positives at k=3) and recorded in a tiny JSON meta next
    to the data; rebuild after OPTIMIZE or appends (appends do not
    update the sidecar — the meta records the epoch ledger it was
    built against, and the reader refuses a stale sidecar rather than
    silently missing appended rows)."""
    df = spark.read.parquet(path).select("_zb", F.col(col).alias("_key"))
    widest = (
        df.groupBy("_zb").agg(F.count(F.lit(1)).alias("n"))
        .agg(F.max("n"))
        .collect()[0][0]
    )
    m = 1 << max(12, int(widest * bits_per_row - 1).bit_length())
    words = (
        df.select(
            "_zb",
            "_key",
            F.explode(F.sequence(F.lit(0), F.lit(k - 1))).alias("seed"),
        )
        .select(
            "_zb",
            F.pmod(F.xxhash64("_key", "seed"), F.lit(m)).alias("p"),
        )
        .groupBy("_zb", F.shiftright("p", 6).alias("word"))
        .agg(F.bit_or(F.expr("shiftleft(1L, p & 63)")).alias("bits"))
    )
    pq_path, meta_path = _bloom_paths(path, col)
    words.write.mode("overwrite").parquet(pq_path)
    with open(os.path.join(path, _ZONES)) as f:
        layout = json.load(f)
    meta = {
        "col": col,
        "k": k,
        "m": m,
        "bits_per_row": bits_per_row,
        "built_epochs": layout.get("epochs", []),
    }
    tmp = meta_path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(meta, f)
    os.replace(tmp, meta_path)
    return meta


def bloom_prune(
    spark: SparkSession, path: str, col: str, values: list
) -> tuple[list[int], int]:
    """Which cells can contain ANY of ``values`` according to the Bloom
    sidecar. The probe runs IN the engine: the value list becomes a
    tiny DataFrame, each value expands to its k (word, mask) probes
    (same xxhash64 expressions as the build — hash parity by
    construction, no driver-side hash reimplementation to drift), an
    equi-join on (word) against the sidecar checks bits, and a cell
    survives for a value iff all k probes hit. Only the surviving cell
    ids (O(cells)) ever reach the driver. Returns (cells, total_cells
    in the zone map)."""
    pq_path, meta_path = _bloom_paths(path, col)
    with open(meta_path) as f:
        meta = json.load(f)
    with open(os.path.join(path, _ZONES)) as f:
        layout = json.load(f)
    if meta.get("built_epochs") != layout.get("epochs", []):
        raise ValueError(
            f"stale bloom sidecar for {col!r}: built at epochs "
            f"{meta.get('built_epochs')}, layout now at "
            f"{layout.get('epochs', [])} — rebuild with build_zorder_bloom"
        )
    k, m = meta["k"], meta["m"]
    probes = (
        spark.createDataFrame([(v,) for v in values], f"_key {_key_ddl(values)}")
        .select(
            "_key",
            F.explode(F.sequence(F.lit(0), F.lit(k - 1))).alias("seed"),
        )
        .select(
            "_key",
            F.pmod(F.xxhash64("_key", "seed"), F.lit(m)).alias("p"),
        )
        .select(
            "_key",
            F.shiftright("p", 6).alias("word"),
            F.expr("shiftleft(1L, p & 63)").alias("mask"),
        )
    )
    sidecar = spark.read.parquet(pq_path)
    hits = (
        sidecar.join(F.broadcast(probes), "word")
        .filter(F.col("bits").bitwiseAND(F.col("mask")) != 0)
        .groupBy("_zb", "_key")
        .agg(F.count(F.lit(1)).alias("n_hit"))
        .filter(F.col("n_hit") == k)
        .select("_zb")
        .distinct()
        .collect()
    )
    return sorted(r["_zb"] for r in hits), len(layout["cells"])


def _key_ddl(values: list) -> str:
    """Probe-frame schema for the lookup values. Only integer and
    string keys are supported — xxhash64 over a float column would
    hash the DOUBLE bit pattern, and a caller passing 5.0 for a long
    column would probe the wrong positions and (soundly but uselessly)
    prune nothing or, worse, silently look up nothing. Refuse loudly
    instead."""
    if not values:
        raise ValueError("bloom probe needs at least one lookup value")
    if all(isinstance(v, str) for v in values):
        return "string"
    if all(isinstance(v, int) and not isinstance(v, bool) for v in values):
        return "long"
    raise TypeError(
        f"bloom lookup supports homogeneous int or str keys, got "
        f"{sorted({type(v).__name__ for v in values})}"
    )


def read_zordered_bloom(
    spark: SparkSession, path: str, col: str, values: list
) -> tuple[DataFrame | None, int, int]:
    """Point lookup served by the Bloom sidecar: open ONLY the cell
    directories whose filter claims one of the keys, then apply the
    exact IN filter (false positives discard here; false negatives
    cannot exist). Returns (df, cells_read, cells_total); df is None
    when every cell prunes away."""
    keep, total = bloom_prune(spark, path, col, values)
    if not keep:
        return None, 0, total
    paths = [os.path.join(path, f"_zb={c}") for c in keep]
    df = spark.read.option("basePath", path).parquet(*paths)
    return df.filter(F.col(col).isin(values)), len(keep), total
