"""Multimodal column plumbing: schemas, batch shapes, strict-mode stubs."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ai_tutor_based_on_rag_using_lanchain_and_vectordb_spark import schemas
from ai_tutor_based_on_rag_using_lanchain_and_vectordb_spark.sources import multimodal as MM


@pytest.fixture(scope="module")
def assets(spark):
    rows = [
        (1, 10, "image", b"\x89PNG fake image bytes" * 50, {"ext": "png"}),
        (2, 10, "image", b"JPEG other fake bytes" * 80, {"ext": "jpg"}),
        (3, 11, "video", b"\x00\x00ftyp fake video" * 2000, {"ext": "mp4"}),
        (4, 11, "audio", b"RIFF fake wav" * 10, {"ext": "wav"}),
    ]
    return spark.createDataFrame(rows, schemas.MEDIA_ASSETS)


def test_image_features_shape_and_determinism(spark, assets):
    out = MM.image_features(assets).toPandas()
    assert sorted(out["asset_id"]) == [1, 2]  # only images
    assert (out["channels"] == 3).all()
    assert out["embedding"].map(len).eq(16).all()
    again = MM.image_features(assets).toPandas()
    a = out.sort_values("asset_id").reset_index(drop=True)
    b = again.sort_values("asset_id").reset_index(drop=True)
    assert (a["width"] == b["width"]).all()
    assert a["embedding"].map(tuple).equals(b["embedding"].map(tuple))


def test_sample_frames_rows_per_video(spark, assets):
    frames = MM.sample_frames(assets, every_ms=500).toPandas()
    assert (frames["asset_id"] == 3).all()
    n = len(frames)
    assert n >= 2  # 32 KB fake video → multiple 4 KB frames
    assert sorted(frames["frame_no"]) == list(range(n))
    assert (frames["frame_ts_ms"] == frames["frame_no"] * 500).all()


def test_strict_mode_raises(spark, assets):
    import py4j

    with pytest.raises(Exception) as exc:
        MM.image_features(assets, strict=True).collect()
    assert "NotImplementedError" in str(exc.value) or "not in this container" in str(
        exc.value
    )


def test_metadata_prunes_without_touching_content(spark, assets):
    # meta-only projection must not read the binary column
    plan = assets.select("asset_id", "meta").queryExecution if False else None
    df = assets.select("asset_id", F.map_values("meta").alias("vals"))
    assert df.count() == 4


# ------------------------------------------------- MPEG-1 video pipeline


@pytest.fixture(scope="module")
def mpeg1_assets(spark):
    import numpy as np

    from ai_tutor_based_on_rag_using_lanchain_and_vectordb_spark.sources import mpeg1 as M1

    y, x = np.mgrid[0:32, 0:48]
    base = np.stack(
        [(x * 5) % 256, (y * 3) % 256, ((x + y) * 2) % 256], axis=-1
    ).astype(np.uint8)
    frames = [base, np.roll(base, 2, axis=1), np.roll(base, 4, axis=1)]
    data, recon = M1.encode_m1v(frames, mvs=[None, (0, -4), (0, -4)])
    df = spark.createDataFrame(
        [(7, 12, "video", bytearray(data), {"ext": "m1v"})], schemas.MEDIA_ASSETS
    )
    return df, data, recon


def test_mpeg1_video_metadata(spark, mpeg1_assets):
    assets, _, _ = mpeg1_assets
    out = MM.video_metadata(assets, strict=True).toPandas()
    assert list(out["format"]) == ["mpeg1"]
    assert list(out["width"]) == [48] and list(out["height"]) == [32]
    assert list(out["duration_ms"]) == [120]  # 3 pictures at 25 fps


def test_mpeg1_sample_frames_real_pixels(spark, mpeg1_assets):
    import numpy as np

    from ai_tutor_based_on_rag_using_lanchain_and_vectordb_spark.sources import (
        mediadecode as MD,
    )

    assets, _, recon = mpeg1_assets
    # every_ms=40 at 25 fps → every picture sampled
    frames = MM.sample_frames(assets, every_ms=40, strict=True).toPandas()
    assert len(frames) == 3
    assert list(frames["frame_ts_ms"]) == [0, 40, 80]
    for i, row in frames.iterrows():
        img = MD.decode_bmp_pixels(bytes(row["frame"]))
        # the BMP payload carries the DECODED pictures exactly (which
        # equal the encoder's reference recon — tests/test_mpeg1.py)
        assert np.array_equal(img[..., :3], recon[row["frame_no"]])


def test_mpeg1_frames_feed_image_features(spark, mpeg1_assets):
    assets, _, _ = mpeg1_assets
    frames = MM.sample_frames(assets, every_ms=40)
    imgs = frames.select(
        frames["asset_id"].alias("asset_id"),
        frames["frame_no"].cast("long").alias("doc_id"),
        F.lit("image").alias("media_type"),
        frames["frame"].alias("content"),
        F.create_map().cast("map<string,string>").alias("meta"),
    )
    feats = MM.image_features(imgs, strict=True).toPandas()
    assert len(feats) == 3
    assert (feats["pixels_real"]).all()
    assert (feats["width"] == 48).all() and (feats["height"] == 32).all()


def test_audio_spectral_gate_passes(spark, sf_dir):
    from ai_tutor_based_on_rag_using_lanchain_and_vectordb_spark.plans.pipeline import audio_spectral_gate

    row = audio_spectral_gate(spark, sf_dir).first()
    assert row["passed"] and row["n_checks"] == 96 and row["n_bad"] == 0


def test_audio_spectrogram_sine_and_parseval(spark):
    import io
    import struct
    import wave

    import numpy as np

    from ai_tutor_based_on_rag_using_lanchain_and_vectordb_spark.sources import multimodal as MM

    rate = 8000
    t = np.arange(rate // 5)
    x = (16383 * np.sin(2 * np.pi * 440 * t / rate)).astype(np.int16)
    x[rate // 10 :] = 0
    buf = io.BytesIO()
    with wave.open(buf, "wb") as f:
        f.setnchannels(1)
        f.setsampwidth(2)
        f.setframerate(rate)
        f.writeframes(x.tobytes())
    assets = spark.createDataFrame(
        [(1, 0, "audio", bytearray(buf.getvalue()), {})], MM.MEDIA_ASSETS
    )
    rows = {r["segment_no"]: r for r in
            MM.audio_spectrogram(assets, window_ms=100, strict=True).collect()}
    loud, quiet = rows[0], rows[1]
    assert loud["dominant_hz"] == 440.0
    seg = x[:800].astype(np.float64) / 32768.0
    assert abs(sum(loud["band_energy"]) - np.mean(seg * seg)) < 1e-12  # Parseval
    assert abs(loud["spectral_centroid_hz"] - 440.0) < 1.0
    assert sum(quiet["band_energy"]) == 0.0 and quiet["dominant_hz"] == 0.0


def test_image_phash_gate_passes(spark, sf_dir):
    from ai_tutor_based_on_rag_using_lanchain_and_vectordb_spark.plans.pipeline import image_phash_gate

    row = image_phash_gate(spark, sf_dir).first()
    assert row["passed"] and row["n_pairs"] == 48 and row["n_bad"] == 0


def test_image_phash_properties(spark):
    import numpy as np

    from ai_tutor_based_on_rag_using_lanchain_and_vectordb_spark.sources import multimodal as MM
    from ai_tutor_based_on_rag_using_lanchain_and_vectordb_spark.sources.mediaencode import encode_bmp

    rng = np.random.default_rng(2)
    img = rng.integers(0, 200, (40, 56, 3)).astype(np.int32)
    img = ((img + np.roll(img, 1, 0) + np.roll(img, 1, 1)) // 3).astype(np.uint8)
    bright = np.clip(img.astype(np.int32) + 20, 0, 255).astype(np.uint8)
    inverted = (255 - img.astype(np.int32)).astype(np.uint8)
    assets = spark.createDataFrame(
        [
            (1, 0, "image", bytearray(encode_bmp(img)), {}),
            (2, 0, "image", bytearray(encode_bmp(img)), {}),
            (3, 0, "image", bytearray(encode_bmp(bright)), {}),
            (4, 0, "image", bytearray(encode_bmp(inverted)), {}),
        ],
        MM.MEDIA_ASSETS,
    )
    sig = {r["asset_id"]: (r["phash_lo"], r["phash_hi"])
           for r in MM.image_phash(assets, strict=True).collect()}

    def ham(a, b):
        return bin(a[0] ^ b[0]).count("1") + bin(a[1] ^ b[1]).count("1")

    assert sig[1] == sig[2]                     # identical pixels
    assert ham(sig[1], sig[3]) == 0             # brightness shift: DC only
    assert ham(sig[1], sig[4]) >= 40            # inversion flips signs
