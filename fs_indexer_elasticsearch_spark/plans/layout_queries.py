"""Physical-layout queries: Z-order clustering + zone-map pruned scans.

The snapshot store's hash buckets (sinks/snapshot.py) answer KEY
lookups; ``sinks/zorder.py`` answers the multi-dimensional RANGE scan —
this module registers the end-to-end proof: events clustered on the
(time, value) Morton curve, a rectangle predicate served by opening
only the zone-map-surviving cells, and the DuckDB oracle filtering the
RAW table directly, so the hash gate proves the entire physical path
(coordinate mapping → Morton cell write → measured zone map → pruned
file list → residual filter) is value-invisible. The pruning RATIO
(the point of the layout) is asserted in tests/test_zorder.py, which
also property-checks soundness on random rectangles.
"""

from __future__ import annotations

import hashlib
import os

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..sinks.zorder import (  # noqa: F401
    append_zordered,
    read_zordered,
    write_zordered,
    zone_prune,
)
from ..tables import load
from .registry import query, stable_round
from .scale_queries import _dataset_fingerprint, _pin, _store_lock

_TS_LO, _TS_HI = "2024-01-10 00:00:00", "2024-01-14 23:59:59.999999"
_VAL_LO, _VAL_HI = 100.0, 150.0


def zordered_events_path(spark: SparkSession, sf_dir: str) -> str:
    """Deterministic cached layout per (dataset, layout config) —
    the same /tmp tag idiom as the index stores: first call pays the
    one-time clustered write, later calls (bench loops, plan audit,
    repeated gates) exercise only the pruned read."""
    fp = _dataset_fingerprint(sf_dir, "events")
    tag = hashlib.md5(
        f"{os.path.abspath(sf_dir)}|{fp}|events|zorder-ts-value|b10c64|v1".encode()
    ).hexdigest()[:12]
    return f"/tmp/spark-graft-zorder-{tag}"


def _dims() -> dict:
    # Cell coordinates: hours since the corpus epoch × unit value
    # bands. Mapping quality affects only the pruning ratio — the zone
    # map measures the RAW columns, so soundness is unconditional
    # (sinks/zorder.py module docstring).
    hours = (
        F.datediff(F.col("ts").cast("date"), F.to_date(F.lit("2024-01-01"))) * 24
        + F.hour("ts")
    )
    return {"ts": hours, "value": F.floor("value")}


def _ensure_layout(spark: SparkSession, sf_dir: str, path: str) -> None:
    if os.path.exists(os.path.join(path, "_ZONES.json")):
        return
    ev = load(spark, sf_dir, "events")
    write_zordered(ev, path, _dims(), bits=10, cells=64)


def _ensure_incremental_layout(
    spark: SparkSession, sf_dir: str, path: str
) -> None:
    """Base write (80% of events) + one appended delta (the other
    20%), zone map widened by the append — built once per dataset tag,
    then only read (the store-caching idiom)."""
    if os.path.exists(os.path.join(path, "_ZONES.json")):
        return
    ev = load(spark, sf_dir, "events")
    write_zordered(
        ev.filter(F.col("event_id") % 5 != 0), path, _dims(), bits=10, cells=64
    )
    append_zordered(
        ev.filter(F.col("event_id") % 5 == 0),
        path,
        _dims(),
        bits=10,
        cells=64,
        epoch="delta-1",
    )


@query(
    "zorder_pruned_scan",
    oracle=f"""
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_events,
           round(sum(value) + 1e-7, 2) AS total_value,
           min(event_id) AS min_event,
           max(event_id) AS max_event
    FROM events
    WHERE ts BETWEEN TIMESTAMP '{_TS_LO}' AND TIMESTAMP '{_TS_HI}'
      AND value BETWEEN {_VAL_LO} AND {_VAL_HI}
    GROUP BY event_type
    """,
)
def zorder_pruned_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rectangle-predicate scan served by the Z-ordered layout: events
    clustered on the (hour, value) Morton curve at write time, the
    (5-day × 50-value) rectangle answered by opening ONLY the cell
    directories whose measured zone-map [min, max] can intersect it,
    plus the exact residual filter. The oracle scans the raw table, so
    a hash match proves pruning dropped no qualifying row and admitted
    no phantom.

    At 100 TB this is the scan-side complement of bucket pruning: a
    1%-selectivity rectangle over a Z-clustered table touches O(sqrt)
    of the curve's cells (measured: 4 of 26 populated cells at sf0.1,
    4 of 20 at sf0.01; ratio asserted in tests/test_zorder.py)
    instead of every file a single-column sort
    would leave the second predicate smeared across; the zone map is
    O(cells) driver-side JSON, exactly the file-stats skipping
    contract Delta/Iceberg readers run on min/max manifests."""
    return _pruned_rectangle_agg(
        spark, zordered_events_path(spark, sf_dir), sf_dir, _ensure_layout
    )


def _pruned_rectangle_agg(
    spark: SparkSession, path: str, sf_dir: str, ensure
) -> DataFrame:
    with _store_lock(path):
        ensure(spark, sf_dir, path)
        df, _kept, _total = read_zordered(
            spark,
            path,
            {"ts": (_TS_LO, _TS_HI), "value": (_VAL_LO, _VAL_HI)},
        )
        if df is None:
            return spark.createDataFrame(
                [],
                "event_type string, n_events long, total_value double, "
                "min_event long, max_event long",
            )
        out = _pin(
            df.groupBy("event_type").agg(
                F.count(F.lit(1)).cast("long").alias("n_events"),
                stable_round(F.sum("value"), 2).alias("total_value"),
                F.min("event_id").alias("min_event"),
                F.max("event_id").alias("max_event"),
            )
        )
    return out


@query(
    "zorder_incremental_scan",
    oracle=f"""
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_events,
           round(sum(value) + 1e-7, 2) AS total_value,
           min(event_id) AS min_event,
           max(event_id) AS max_event
    FROM events
    WHERE ts BETWEEN TIMESTAMP '{_TS_LO}' AND TIMESTAMP '{_TS_HI}'
      AND value BETWEEN {_VAL_LO} AND {_VAL_HI}
    GROUP BY event_type
    """,
)
def zorder_incremental_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The MAINTAINED form of zorder_pruned_scan: the layout is built
    from 80% of events, the remaining 20% arrives as an appended delta
    (``append_zordered`` — O(batch) file appends + min-of-mins /
    max-of-maxs zone-map widening, no rewrite of existing files, the
    Delta/Iceberg append half of the lifecycle), and the SAME rectangle
    is then served from the widened zone map. The oracle recomputes
    over the raw full table, so the hash gate proves the widened
    bounds lost no delta row and the append admitted no duplicate
    (the epoch guard makes replays no-ops — tests/test_zorder.py
    exercises a double-append)."""
    fp = _dataset_fingerprint(sf_dir, "events")
    tag = hashlib.md5(
        f"{os.path.abspath(sf_dir)}|{fp}|events|zorder-incr|b10c64|v1".encode()
    ).hexdigest()[:12]
    path = f"/tmp/spark-graft-zorder-{tag}"
    return _pruned_rectangle_agg(spark, path, sf_dir, _ensure_incremental_layout)


_LOOKUP_IDS = [7, 123, 555, 999_999_937]  # last one absent at every SF


@query(
    "zorder_bloom_lookup",
    oracle=f"""
    SELECT event_id, user_id, event_type, round(value + 1e-7, 2) AS value_r
    FROM events
    WHERE event_id IN ({", ".join(str(i) for i in _LOOKUP_IDS)})
    """,
)
def zorder_bloom_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point lookup on a NON-curve column served by the per-cell Bloom
    sidecar (sinks/zorder.build_zorder_bloom): event_id is neither
    Z-order dimension, so the zone map cannot prune it — the Bloom
    index opens only the cells whose filter claims one of the keys
    (~k/cells of the layout; the absent key matches nowhere and costs
    nothing beyond its k probe rows). The probe itself runs IN the
    engine — values expand to (word, mask) pairs with the same xxhash64
    expressions the build used, join the parquet sidecar, and only
    surviving cell ids reach the driver — so there is no driver-side
    hash reimplementation to drift from the executor's. The oracle
    scans the raw table with the same IN list; a hash match proves the
    skipping admitted no phantom and — the Bloom guarantee — lost no
    present key. Pruning ratio and the no-false-negative property are
    asserted in tests/test_zorder.py.

    At 100 TB this is the third physical-design axis registered here:
    hash buckets (key equality), Z-order zone maps (multi-dim ranges),
    Bloom sidecars (point-in-set on everything else) — the same trio
    Delta/Iceberg deployments run."""
    import os as _os

    from ..sinks.zorder import build_zorder_bloom, read_zordered_bloom

    path = zordered_events_path(spark, sf_dir)
    with _store_lock(path):
        _ensure_layout(spark, sf_dir, path)
        if not _os.path.exists(_os.path.join(path, "_BLOOM_event_id.json")):
            build_zorder_bloom(spark, path, "event_id")
        df, _kept, _total = read_zordered_bloom(
            spark, path, "event_id", _LOOKUP_IDS
        )
        if df is None:
            return spark.createDataFrame(
                [], "event_id long, user_id long, event_type string, value_r double"
            )
        out = _pin(
            df.select(
                "event_id",
                "user_id",
                "event_type",
                stable_round(F.col("value"), 2).alias("value_r"),
            )
        )
    return out
