"""Multimodal columns: image/audio/video as opaque ``binary`` payloads
with typed metadata, processed by Arrow-batched stages over
``mapInPandas``. The decode kernels themselves are STUBBED (image/audio
libraries are not in this container): each stub either raises
NotImplementedError (strict mode) or produces a deterministic fake
derived from the bytes — the Spark-side plumbing (schemas, batch
iteration, partitioning, output shapes) is real and tested.

Design for 100 TB: binary payloads stay in Arrow record batches
end-to-end (no per-row Python), metadata lives in a MAP column so
pruning `meta` never drags `content` into memory, and frame sampling
emits rows (posexplode-shaped) so downstream stages parallelize per
frame, not per video.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..schemas import MEDIA_ASSETS  # noqa: F401  (canonical schema)

IMAGE_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("channels", T.IntegerType()),
        T.StructField("embedding", T.ArrayType(T.FloatType())),
    ]
)

FRAME_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType()),
        T.StructField("frame_no", T.IntegerType()),
        T.StructField("frame_ts_ms", T.LongType()),
        T.StructField("frame", T.BinaryType()),
    ]
)


def _fake_decode_image(data: bytes) -> tuple[int, int, int]:
    """STUB: deterministic (width, height, channels) from content bytes.
    Replace with PIL/cv2 decode when available."""
    h = hashlib.sha256(data).digest()
    return 64 + h[0] % 192, 64 + h[1] % 192, 3


def _fake_image_embedding(data: bytes, dim: int = 16) -> list[float]:
    """STUB: deterministic pseudo-embedding (normalized byte histogram
    projection). Replace with a real vision encoder pandas_udf."""
    arr = np.frombuffer(hashlib.sha256(data).digest(), dtype=np.uint8).astype(np.float64)
    v = arr[:dim] - arr[:dim].mean()
    n = np.linalg.norm(v)
    return (v / n if n else v).astype(np.float32).tolist()


def image_features(assets: DataFrame, strict: bool = False) -> DataFrame:
    """Decode + feature-extract stage: binary → (dims, embedding)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        if strict:
            raise NotImplementedError(
                "real image decoding requires PIL/cv2 (not in this container); "
                "run with strict=False for the deterministic stub"
            )
        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                data = bytes(r["content"]) if r["content"] is not None else b""
                w, h, c = _fake_decode_image(data)
                rows.append(
                    {
                        "asset_id": r["asset_id"],
                        "width": w,
                        "height": h,
                        "channels": c,
                        "embedding": _fake_image_embedding(data),
                    }
                )
            yield pd.DataFrame(rows, columns=[f.name for f in IMAGE_FEATURES_SCHEMA])

    return assets.where(F.col("media_type") == "image").select(
        "asset_id", "content"
    ).mapInPandas(run, IMAGE_FEATURES_SCHEMA)


def sample_frames(assets: DataFrame, every_ms: int = 1000, strict: bool = False) -> DataFrame:
    """Frame-sampling stage: one row per sampled frame. STUB slices the
    payload; a real implementation calls the video decoder per batch."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        if strict:
            raise NotImplementedError("real video decoding not available; use strict=False")
        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                data = bytes(r["content"]) if r["content"] is not None else b""
                n_frames = max(len(data) // 4096, 1)
                for i in range(n_frames):
                    rows.append(
                        {
                            "asset_id": r["asset_id"],
                            "frame_no": i,
                            "frame_ts_ms": i * every_ms,
                            "frame": data[i * 4096 : (i + 1) * 4096],
                        }
                    )
            yield pd.DataFrame(rows, columns=[f.name for f in FRAME_SCHEMA])

    return assets.where(F.col("media_type") == "video").select(
        "asset_id", "content"
    ).mapInPandas(run, FRAME_SCHEMA)
