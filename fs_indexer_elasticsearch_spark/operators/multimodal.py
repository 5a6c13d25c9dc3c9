"""Multimodal column operators: opaque binary payloads + typed
metadata, processed with Arrow-batched pandas transforms.

The image/audio libraries are NOT in this container, so the decode
kernels are stubbed (NotImplementedError or a deterministic fake
behind ``fake=True``) — but the Spark-side plumbing is real: schema
(schema.MEDIA_ASSET_SCHEMA), mapInPandas batch shape, partitioning,
and the UDF signatures are what a production decode would use.

Scale notes: payloads ride as parquet binary; repartition by asset id
before decode so one poison payload can't skew a task; decode output
(features) is columnar float arrays that feed the similarity
operators directly.
"""

from __future__ import annotations

from collections.abc import Iterator

import pyspark.sql.functions as F
import pyspark.sql.types as T
from pyspark.sql import DataFrame

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.StringType()),
        T.StructField("media_type", T.StringType()),
        T.StructField("n_bytes", T.IntegerType()),
        T.StructField("features", T.ArrayType(T.FloatType())),
        # Which kernel produced the row: 'real' (decoded), 'fake'
        # (histogram stand-in), 'fallback' (real decode failed on this
        # payload). Downstream similarity ops can filter on it — real
        # and fake features live in incomparable vector spaces.
        T.StructField("feature_kind", T.StringType()),
    ]
)

FRAME_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.StringType()),
        T.StructField("frame_index", T.IntegerType()),
        T.StructField("frame_payload", T.BinaryType()),
    ]
)

RESIZE_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        # width*height grayscale bytes, row-major — the normalized
        # raster a training pipeline feeds the encoder.
        T.StructField("resized", T.BinaryType()),
        T.StructField("resize_kind", T.StringType()),
    ]
)


def attach_payload(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Build an asset DataFrame from any table: payload = utf-8 bytes
    of a text column (deterministic fixture for the binary path)."""
    return df.select(
        F.col(id_col).cast("string").alias("asset_id"),
        F.lit("image").alias("media_type"),
        F.col(text_col).cast("binary").alias("payload"),
        F.lit("application/octet-stream").alias("mime"),
    )


def _fake_feature(b: bytes, dim: int) -> list[float]:
    """Deterministic byte-histogram stand-in for a real decode."""
    import numpy as np

    hist = np.bincount(
        np.frombuffer(b, dtype=np.uint8) % dim, minlength=dim
    ).astype("float32")
    total = hist.sum() or 1.0
    return (hist / total).tolist()


def _real_feature(b: bytes, dim: int) -> list[float]:
    """Real image decode → dim-length grayscale strip, [0,1] floats.

    Imports PIL at call time (worker-side); callers decide what a
    missing library means (see ``_feature_batches``)."""
    import io

    from PIL import Image

    img = Image.open(io.BytesIO(b)).convert("L").resize((dim, 1))
    return [float(p) / 255.0 for p in img.getdata()]


def _pil_available() -> bool:
    try:
        import PIL  # noqa: F401

        return True
    except ImportError:
        return False


def _feature_batches(batches: Iterator, dim: int, fake: bool | None) -> Iterator:
    """The mapInPandas kernel, module-level so it is testable without a
    Spark worker. ``fake``: True → always histogram fake; False → real
    decode, NotImplementedError if PIL is absent; None (auto) → real
    where PIL imports, histogram fake otherwise (sandbox images).

    Per-payload fault isolation: a payload the real decoder rejects
    (corrupt bytes, non-image content, empty) falls back to the
    histogram feature with ``feature_kind='fallback'`` instead of
    failing the task — one poison payload must not kill the job
    (consistent with the module's scale notes). Only a MISSING library
    is a hard error: that is a deployment bug, not a data bug."""
    import pandas as pd

    use_real = fake is False
    if fake is None:
        use_real = _pil_available()

    for pdf in batches:
        feats, sizes, kinds = [], [], []
        for payload in pdf["payload"]:
            b = bytes(payload or b"")
            sizes.append(len(b))
            if use_real:
                try:
                    feats.append(_real_feature(b, dim))
                    kinds.append("real")
                except ImportError as exc:
                    raise NotImplementedError(
                        "real media decode requires PIL — not in this image"
                    ) from exc
                except Exception:  # noqa: BLE001 — poison payload
                    feats.append(_fake_feature(b, dim))
                    kinds.append("fallback")
            else:
                feats.append(_fake_feature(b, dim))
                kinds.append("fake")
        yield pd.DataFrame(
            {
                "asset_id": pdf["asset_id"],
                "media_type": pdf["media_type"],
                "n_bytes": pd.array(sizes, dtype="int32"),
                "features": feats,
                "feature_kind": kinds,
            }
        )


def extract_features(
    assets: DataFrame, dim: int = 16, fake: bool | None = True
) -> DataFrame:
    """Decode + feature-extract per asset (Arrow-batched).

    ``fake=True`` (default) produces a deterministic byte-histogram
    feature so tests are stable; ``fake=None`` auto-detects PIL ON THE
    DRIVER and closes over the decision; ``fake=False`` demands the
    real decoder and raises NotImplementedError where PIL is absent.

    Auto mode resolves once on the driver, not per worker: a cluster
    with PIL on only some executors must fail loudly (the strict
    ``fake=False`` contract) rather than silently mix histogram-fake
    and real grayscale vectors — incomparable spaces — in one output.
    Every row carries ``feature_kind`` ('real'/'fake'/'fallback') so
    downstream consumers can verify which kernel ran.
    """
    if fake is None:
        fake = not _pil_available()  # resolved on the driver

    def run(batches: Iterator) -> Iterator:
        yield from _feature_batches(batches, dim, fake)

    return assets.mapInPandas(run, FEATURE_SCHEMA)


def _fake_resize(b: bytes, w: int, h: int) -> bytes:
    """Deterministic stand-in for a real raster resize: stride-sample
    the payload down to exactly w*h bytes (zero-padded) — same output
    shape and dtype as the real kernel, so downstream plumbing is
    exercised identically."""
    n = w * h
    if not b:
        return bytes(n)
    step = max(len(b) // n, 1)
    return (b[::step])[:n].ljust(n, b"\0")


def _real_resize(b: bytes, w: int, h: int) -> bytes:
    """Real image resize → w*h grayscale raster bytes (row-major).
    Imports PIL at call time (worker-side)."""
    import io

    from PIL import Image

    return Image.open(io.BytesIO(b)).convert("L").resize((w, h)).tobytes()


def _resize_batches(batches: Iterator, w: int, h: int, fake: bool | None) -> Iterator:
    """Resize kernel with the same fake/auto/strict + per-payload
    fault-isolation contract as ``_feature_batches``: a corrupt
    payload falls back (kind='fallback'), a missing library under
    ``fake=False`` is a hard NotImplementedError."""
    import pandas as pd

    use_real = fake is False
    if fake is None:
        use_real = _pil_available()

    for pdf in batches:
        outs, kinds = [], []
        for payload in pdf["payload"]:
            b = bytes(payload or b"")
            if use_real:
                try:
                    outs.append(_real_resize(b, w, h))
                    kinds.append("real")
                except ImportError as exc:
                    raise NotImplementedError(
                        "real media resize requires PIL — not in this image"
                    ) from exc
                except Exception:  # noqa: BLE001 — poison payload
                    outs.append(_fake_resize(b, w, h))
                    kinds.append("fallback")
            else:
                outs.append(_fake_resize(b, w, h))
                kinds.append("fake")
        yield pd.DataFrame(
            {
                "asset_id": pdf["asset_id"],
                "width": pd.array([w] * len(outs), dtype="int32"),
                "height": pd.array([h] * len(outs), dtype="int32"),
                "resized": outs,
                "resize_kind": kinds,
            }
        )


def resize_images(
    assets: DataFrame, width: int = 8, height: int = 8, fake: bool | None = True
) -> DataFrame:
    """Resize every asset's raster to width x height (Arrow-batched
    mapInPandas) — the third of the four multimodal kernels (decode /
    feature-extract / RESIZE / frame-sample). Output is a fixed-size
    grayscale byte raster plus typed dimensions, the shape an
    image-training pipeline normalizes into before encoding. Same
    fake/auto/strict kernel contract as ``extract_features``."""
    if fake is None:
        fake = not _pil_available()  # resolved on the driver

    def run(batches: Iterator) -> Iterator:
        yield from _resize_batches(batches, width, height, fake)

    return assets.mapInPandas(run, RESIZE_SCHEMA)


def sample_frames(
    assets: DataFrame, every_n_bytes: int = 64, max_frames: int = 8
) -> DataFrame:
    """Frame-sampling plumbing (video pattern): slice the payload into
    pseudo-frames every ``every_n_bytes`` — a real implementation
    would demux keyframes; the batch/explode shape is identical."""

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            ids, idxs, frames = [], [], []
            for aid, payload in zip(pdf["asset_id"], pdf["payload"]):
                b = bytes(payload or b"")
                for i in range(min(max_frames, max(len(b) // every_n_bytes, 1))):
                    ids.append(aid)
                    idxs.append(i)
                    frames.append(b[i * every_n_bytes : (i + 1) * every_n_bytes])
            yield pd.DataFrame(
                {
                    "asset_id": ids,
                    "frame_index": pd.array(idxs, dtype="int32"),
                    "frame_payload": frames,
                }
            )

    return assets.mapInPandas(run, FRAME_SCHEMA)
