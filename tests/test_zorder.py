"""Z-order layout + zone-map pruning (sinks/zorder.py).

The oracle gate proves the registered query's VALUES; this file covers
what the hash can't see: that pruning actually happens (the point of
the layout), that it is SOUND on arbitrary rectangles (pruned read ==
full filter, property-checked), and the Morton code's bit mechanics.
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from fs_indexer_elasticsearch_spark.sinks.zorder import (
    append_zordered,
    morton_interleave,
    read_zordered,
    write_zordered,
    zone_prune,
)


def _morton_ref(x: int, y: int, bits: int) -> int:
    z = 0
    for i in range(bits):
        z |= ((x >> i) & 1) << (2 * i) | ((y >> i) & 1) << (2 * i + 1)
    return z


def test_morton_matches_reference(spark):
    rows = [(x, y) for x in (0, 1, 5, 63) for y in (0, 2, 31, 63)]
    df = spark.createDataFrame(rows, "x int, y int").select(
        "x", "y", morton_interleave(F.col("x"), F.col("y"), 6).alias("z")
    )
    for r in df.collect():
        assert r.z == _morton_ref(r.x, r.y, 6), (r.x, r.y)


def test_morton_clamps_out_of_range(spark):
    df = spark.createDataFrame([(-5, 999999)], "x int, y int").select(
        morton_interleave(F.col("x"), F.col("y"), 6).alias("z")
    )
    assert df.collect()[0].z == _morton_ref(0, 63, 6)


@pytest.fixture()
def grid_store(spark, tmp_path):
    """64x64 integer grid clustered at 16 cells — every (x, y) exists
    exactly once, so expected rectangle contents are closed-form."""
    path = str(tmp_path / "zgrid")
    df = spark.range(64 * 64).select(
        (F.col("id") % 64).cast("int").alias("x"),
        (F.col("id") / 64).cast("int").alias("y"),
        F.col("id").alias("payload"),
    )
    write_zordered(df, path, {"x": F.col("x"), "y": F.col("y")}, bits=6, cells=16)
    return path


def test_rectangle_prunes_and_is_exact(spark, grid_store):
    df, kept, total = read_zordered(
        spark, grid_store, {"x": (8, 15), "y": (16, 23)}
    )
    assert total == 16
    # an 8x8 rectangle = 1/64 of the area; at 16 cells it must fit in
    # far fewer than all of them (Morton locality, not just stats luck)
    assert kept <= 4
    rows = {(r.x, r.y) for r in df.collect()}
    assert rows == {(x, y) for x in range(8, 16) for y in range(16, 24)}


def test_random_rectangles_sound(spark, grid_store):
    """Soundness property: pruned read == full-scan filter for random
    rectangles (deterministic seed)."""
    import random

    rng = random.Random(14)
    full = spark.read.parquet(grid_store)
    for _ in range(8):
        x0, y0 = rng.randrange(64), rng.randrange(64)
        x1, y1 = rng.randrange(x0, 64), rng.randrange(y0, 64)
        df, kept, total = read_zordered(
            spark, grid_store, {"x": (x0, x1), "y": (y0, y1)}
        )
        want = {
            (r.x, r.y)
            for r in full.filter(
                F.col("x").between(x0, x1) & F.col("y").between(y0, y1)
            ).collect()
        }
        got = set() if df is None else {(r.x, r.y) for r in df.collect()}
        assert got == want, (x0, x1, y0, y1, kept, total)


def test_empty_rectangle_prunes_everything(spark, grid_store):
    df, kept, total = read_zordered(spark, grid_store, {"x": (100, 200)})
    assert df is None and kept == 0 and total == 16


def test_unknown_dimension_raises(spark, grid_store):
    import json
    import os

    with open(os.path.join(grid_store, "_ZONES.json")) as f:
        manifest = json.load(f)
    with pytest.raises(KeyError):
        zone_prune(manifest, {"nope": (0, 1)})


def test_null_coordinates_place_and_never_match(spark, tmp_path):
    path = str(tmp_path / "znull")
    df = spark.createDataFrame(
        [(1, 10, 10), (2, None, 5), (3, None, None)],
        "payload int, x int, y int",
    )
    write_zordered(df, path, {"x": F.col("x"), "y": F.col("y")}, bits=4, cells=4)
    out, _k, _t = read_zordered(spark, path, {"x": (0, 100), "y": (0, 100)})
    assert [r.payload for r in out.collect()] == [1]


def test_append_widens_and_is_idempotent(spark, tmp_path):
    """Append places new rows on the same curve, widens only the
    touched cells' bounds, and replaying the same epoch is a no-op."""
    path = str(tmp_path / "zappend")
    base = spark.createDataFrame(
        [(1, 10, 10), (2, 20, 20)], "payload int, x int, y int"
    )
    delta = spark.createDataFrame(
        [(3, 11, 12), (4, 50, 50)], "payload int, x int, y int"
    )
    dims = {"x": F.col("x"), "y": F.col("y")}
    write_zordered(base, path, dims, bits=6, cells=4)
    m1 = append_zordered(delta, path, dims, bits=6, cells=4, epoch="e1")
    assert "e1" in m1["epochs"]
    # replay: same epoch -> no new rows, manifest unchanged
    m2 = append_zordered(delta, path, dims, bits=6, cells=4, epoch="e1")
    assert m2 == m1
    df, _k, _t = read_zordered(spark, path, {"x": (0, 63), "y": (0, 63)})
    assert sorted(r.payload for r in df.collect()) == [1, 2, 3, 4]
    # widened bounds stay sound for a rectangle containing only delta rows
    df2, _k2, _t2 = read_zordered(spark, path, {"x": (40, 60), "y": (40, 60)})
    assert [r.payload for r in df2.collect()] == [4]


def test_append_rejects_layout_mismatch(spark, tmp_path):
    path = str(tmp_path / "zmismatch")
    dims = {"x": F.col("x"), "y": F.col("y")}
    df = spark.createDataFrame([(1, 1, 1)], "payload int, x int, y int")
    write_zordered(df, path, dims, bits=6, cells=4)
    with pytest.raises(ValueError, match="layout mismatch"):
        append_zordered(df, path, dims, bits=8, cells=4)
    with pytest.raises(ValueError, match="dimension mismatch"):
        append_zordered(
            df, path, {"y": F.col("y"), "x": F.col("x")}, bits=6, cells=4
        )


def test_registered_query_prunes_events(spark):
    """The driver-gated query's layout must actually skip cells at
    sf0.001 — the ratio claim in its docstring, pinned."""
    from fs_indexer_elasticsearch_spark.plans.layout_queries import (
        _ensure_layout,
        _TS_HI,
        _TS_LO,
        _VAL_HI,
        _VAL_LO,
        zordered_events_path,
    )

    from fs_indexer_elasticsearch_spark.plans.scale_queries import _store_lock

    path = zordered_events_path(spark, "/root/testdata/sf0.001")
    with _store_lock(path):
        _ensure_layout(spark, "/root/testdata/sf0.001", path)
        df, kept, total = read_zordered(
            spark, path, {"ts": (_TS_LO, _TS_HI), "value": (_VAL_LO, _VAL_HI)}
        )
    assert df is not None
    assert kept < total / 2, (kept, total)


def test_optimize_compacts_and_regrids(spark, tmp_path):
    """OPTIMIZE after appends: rows identical, epoch ledger reset,
    finer cells improve the pruning ratio, per-cell file piles
    compacted."""
    import glob
    import json
    import os

    from fs_indexer_elasticsearch_spark.sinks.zorder import optimize_zordered

    path = str(tmp_path / "zopt")
    dims = {"x": F.col("x"), "y": F.col("y")}
    full = spark.range(64 * 64).select(
        (F.col("id") % 64).cast("int").alias("x"),
        (F.col("id") / 64).cast("int").alias("y"),
        F.col("id").alias("payload"),
    )
    write_zordered(full.filter("payload % 3 = 0"), path, dims, bits=6, cells=4)
    append_zordered(full.filter("payload % 3 = 1"), path, dims, bits=6, cells=4, epoch="e1")
    append_zordered(full.filter("payload % 3 = 2"), path, dims, bits=6, cells=4, epoch="e2")
    rect = {"x": (8, 15), "y": (16, 23)}
    df0, kept0, total0 = read_zordered(spark, path, rect)
    want = sorted(r.payload for r in df0.collect())
    files_before = len(glob.glob(os.path.join(path, "_zb=*", "*.parquet")))

    optimize_zordered(spark, path, dims, cells=16)

    with open(os.path.join(path, "_ZONES.json")) as f:
        m = json.load(f)
    assert m["cells_cfg"] == 16 and m["epochs"] == []
    df1, kept1, total1 = read_zordered(spark, path, rect)
    assert sorted(r.payload for r in df1.collect()) == want
    # finer grid -> strictly more total cells, and the rectangle's
    # touched fraction must not grow
    assert total1 > total0
    assert kept1 / total1 <= kept0 / total0
    # compaction: base + 2 appends leave ~3 files per cell; optimize
    # leaves one (compare per-cell — the regrid changed the cell count)
    files_after = len(glob.glob(os.path.join(path, "_zb=*", "*.parquet")))
    cells_after = len(glob.glob(os.path.join(path, "_zb=*")))
    assert files_before / total0 >= 3
    assert files_after / cells_after == 1


def test_streaming_zorder_pipeline(spark, tmp_path):
    """Micro-batches stream into the Z-layout (first batch seeds with
    its epoch recorded, later ones append under their epoch ids);
    after each cycle a pruned rectangle read equals a full filter, and
    a manual replay of a committed epoch is a no-op."""
    import pyspark.sql.types as T

    from fs_indexer_elasticsearch_spark.sinks.zorder import append_zordered
    from fs_indexer_elasticsearch_spark.streaming.pipeline import (
        streaming_zorder_pipeline,
    )

    schema = T.StructType(
        [
            T.StructField("x", T.IntegerType()),
            T.StructField("y", T.IntegerType()),
            T.StructField("payload", T.IntegerType()),
        ]
    )
    inp = tmp_path / "incoming"
    inp.mkdir()
    layout = str(tmp_path / "zlive")

    def drop(name, rows):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "overwrite"
        ).parquet(str(inp / name))

    def dims():
        return {"x": F.col("x"), "y": F.col("y")}

    drop("b1", [(1, 1, 1), (10, 10, 2)])
    q = streaming_zorder_pipeline(
        spark,
        str(inp) + "/*",
        schema,
        layout,
        str(tmp_path / "ckpt"),
        dims_factory=dims,
        bits=6,
        cells=4,
    )
    try:
        q.processAllAvailable()
        df, _k, _t = read_zordered(spark, layout, {"x": (0, 63), "y": (0, 63)})
        assert sorted(r.payload for r in df.collect()) == [1, 2]

        drop("b2", [(50, 50, 3)])
        q.processAllAvailable()
        df, _k, _t = read_zordered(spark, layout, {"x": (40, 60), "y": (40, 60)})
        assert [r.payload for r in df.collect()] == [3]
    finally:
        q.stop()

    # replay purity: re-appending a committed stream epoch is a no-op
    import json
    import os

    with open(os.path.join(layout, "_ZONES.json")) as f:
        epochs = json.load(f)["epochs"]
    assert any(e.startswith("stream-") for e in epochs)
    replay = spark.createDataFrame([(50, 50, 3)], schema)
    append_zordered(replay, layout, dims(), bits=6, cells=4, epoch=epochs[-1])
    df, _k, _t = read_zordered(spark, layout, {"x": (0, 63), "y": (0, 63)})
    assert sorted(r.payload for r in df.collect()) == [1, 2, 3]


# ---------------------------------------------------------------------------
# Bloom file-skipping sidecar
# ---------------------------------------------------------------------------


def test_bloom_lookup_no_false_negatives_and_prunes(spark, grid_store):
    """Every present key must be found (Bloom soundness), reading
    strictly fewer cells than the layout holds; an absent key must
    prune everything."""
    from fs_indexer_elasticsearch_spark.sinks.zorder import (
        bloom_prune,
        build_zorder_bloom,
        read_zordered_bloom,
    )

    build_zorder_bloom(spark, grid_store, "payload")
    # 8 deterministic present keys spread across the grid
    keys = [0, 17, 511, 1024, 2049, 3000, 4004, 4095]
    df, kept, total = read_zordered_bloom(spark, grid_store, "payload", keys)
    assert df is not None
    got = sorted(r.payload for r in df.collect())
    assert got == sorted(keys)  # no false negative, exact residual
    assert 0 < kept < total  # genuinely skipped files
    # Absent key: with ~10 bits/row the 8 probes should miss almost
    # everywhere; soundness only needs "no phantom row", which the
    # exact IN filter guarantees even on a false-positive cell.
    df2, kept2, _ = read_zordered_bloom(
        spark, grid_store, "payload", [999_999_937]
    )
    assert df2 is None or df2.count() == 0
    assert kept2 <= total
    cells, _ = bloom_prune(spark, grid_store, "payload", keys)
    assert cells == sorted(cells)


def test_bloom_stale_after_append_refuses(spark, tmp_path):
    """An append changes the epoch ledger; a sidecar built before it
    must refuse to serve rather than silently miss appended rows."""
    import pytest as _pytest

    from fs_indexer_elasticsearch_spark.sinks.zorder import (
        build_zorder_bloom,
        read_zordered_bloom,
    )

    path = str(tmp_path / "zbloomstale")
    df = spark.range(512).select(
        (F.col("id") % 32).cast("int").alias("x"),
        (F.col("id") / 32).cast("int").alias("y"),
        F.col("id").alias("payload"),
    )
    write_zordered(
        df, path, {"x": F.col("x"), "y": F.col("y")}, bits=5, cells=4, epoch="e0"
    )
    build_zorder_bloom(spark, path, "payload")
    delta = spark.range(512, 600).select(
        (F.col("id") % 32).cast("int").alias("x"),
        (F.col("id") / 32).cast("int").alias("y"),
        F.col("id").alias("payload"),
    )
    append_zordered(
        delta, path, {"x": F.col("x"), "y": F.col("y")}, bits=5, cells=4,
        epoch="e1",
    )
    with _pytest.raises(ValueError, match="stale bloom"):
        read_zordered_bloom(spark, path, "payload", [5])
    # Rebuild heals it and the appended key is now findable.
    build_zorder_bloom(spark, path, "payload")
    found, _, _ = read_zordered_bloom(spark, path, "payload", [555])
    assert found is not None and found.count() == 1


def test_bloom_string_keys(spark, tmp_path):
    """String lookup columns probe through the same xxhash64 path."""
    from fs_indexer_elasticsearch_spark.sinks.zorder import (
        build_zorder_bloom,
        read_zordered_bloom,
    )

    path = str(tmp_path / "zbloomstr")
    df = spark.range(400).select(
        (F.col("id") % 20).cast("int").alias("x"),
        (F.col("id") / 20).cast("int").alias("y"),
        F.concat(F.lit("k-"), F.col("id")).alias("name"),
    )
    write_zordered(df, path, {"x": F.col("x"), "y": F.col("y")}, bits=5, cells=4)
    build_zorder_bloom(spark, path, "name")
    found, kept, total = read_zordered_bloom(
        spark, path, "name", ["k-7", "k-399", "k-nope"]
    )
    assert found is not None
    assert sorted(r.name for r in found.collect()) == ["k-399", "k-7"]
    assert kept <= total


def test_optimize_rebuilds_bloom_sidecar(spark, tmp_path):
    """OPTIMIZE re-clusters cells, so per-cell bitmaps are wholesale
    invalid — it must rebuild registered sidecars against the new
    layout (not leave a missing/stale one for the next lookup)."""
    from fs_indexer_elasticsearch_spark.sinks.zorder import (
        build_zorder_bloom,
        optimize_zordered,
        read_zordered_bloom,
    )

    path = str(tmp_path / "zbloomopt")
    dims = {"x": F.col("x"), "y": F.col("y")}
    df = spark.range(600).select(
        (F.col("id") % 32).cast("int").alias("x"),
        (F.col("id") / 32).cast("int").alias("y"),
        F.col("id").alias("payload"),
    )
    write_zordered(df, path, dims, bits=5, cells=4)
    build_zorder_bloom(spark, path, "payload", k=4, bits_per_row=12)
    optimize_zordered(spark, path, dims, cells=8)
    found, kept, total = read_zordered_bloom(spark, path, "payload", [599])
    assert found is not None and found.count() == 1
    assert total == 8 or total <= 8  # re-gridded cell count
    import json as _json
    import os as _os

    with open(_os.path.join(path, "_BLOOM_payload.json")) as f:
        meta = _json.load(f)
    assert meta["k"] == 4 and meta["bits_per_row"] == 12


def test_bloom_rejects_mixed_or_float_keys(spark, grid_store):
    """Float or mixed-type probe values would hash the wrong bit
    patterns — the probe must refuse loudly, not silently miss."""
    import pytest as _pytest

    from fs_indexer_elasticsearch_spark.sinks.zorder import (
        bloom_prune,
        build_zorder_bloom,
    )

    build_zorder_bloom(spark, grid_store, "payload")
    with _pytest.raises(TypeError, match="homogeneous"):
        bloom_prune(spark, grid_store, "payload", [1.5, 2])
    with _pytest.raises(TypeError, match="homogeneous"):
        bloom_prune(spark, grid_store, "payload", ["a", 1])
    with _pytest.raises(ValueError, match="at least one"):
        bloom_prune(spark, grid_store, "payload", [])
