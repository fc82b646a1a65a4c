"""MPEG-1 program stream (sources/mpegps.py): mux/demux ES-exact round
trips across packetization variants, PES timestamp parsing, padding and
system-header skipping, strict/lax malformation handling, and the
end-to-end pipeline path (PS → video PES demux → picture decode)."""

from __future__ import annotations

import numpy as np
import pytest

from ai_tutor_based_on_rag_using_lanchain_and_vectordb_spark.sources import mpegps as PS
from ai_tutor_based_on_rag_using_lanchain_and_vectordb_spark.sources.mpeg1 import (
    decode_m1v,
    encode_m1v,
)


def _es():
    base = (np.arange(3 * 16 * 32, dtype=np.uint8).reshape(16, 32, 3) * 5) % 251
    return encode_m1v([base, np.roll(base, 1, 1)], mvs=[None, (0, -2)])


@pytest.mark.parametrize(
    "kw",
    [
        {},
        {"pes_size": 100},
        {"pes_size": 1},
        {"with_system_header": False},
        {"padding": 64},
        {"pts_start": 90000},
        {"pts_start": (1 << 33) - 1},  # full 33-bit timestamp
        {"stream_id": 0xE7},
    ],
)
def test_mux_demux_roundtrip(kw):
    es, ref = _es()
    ps = PS.encode_mpeg_ps(es, **kw)
    assert PS.is_mpeg_ps(ps)
    streams = PS.demux_mpeg_ps(ps, strict=True)
    sid = kw.get("stream_id", 0xE0)
    assert streams[sid] == es
    assert streams["_pts"][sid] == kw.get("pts_start", 0)
    # the reassembled ES decodes picture-exact
    _, pics = decode_m1v(PS.ps_video_es(ps), strict=True)
    assert len(pics) == 2 and np.array_equal(pics[0], ref[0])


def test_lax_truncation_keeps_prefix_strict_raises():
    es, _ = _es()
    ps = PS.encode_mpeg_ps(es, pes_size=100)
    cut = ps[: len(ps) // 2]
    with pytest.raises(PS.MpegPsError):
        PS.demux_mpeg_ps(cut, strict=True)
    out = PS.demux_mpeg_ps(cut)
    assert out[0xE0] and es.startswith(out[0xE0])


def test_non_ps_and_garbage():
    assert PS.demux_mpeg_ps(b"junk") is None
    assert PS.demux_mpeg_ps(b"") is None
    assert PS.ps_video_es(PS.PACK_START + b"\xff" * 20) in (None, b"")


def test_bad_stream_id_rejected():
    with pytest.raises(PS.MpegPsError, match="stream id"):
        PS.encode_mpeg_ps(b"x", stream_id=0xC0)


def test_audio_only_ps_has_no_video_es():
    # a PES packet with an audio stream id: demux keeps it, video
    # extraction returns None
    body = b"\x0f" + b"\x01\x02\x03"
    ps = (
        PS.PACK_START
        + PS.encode_mpeg_ps(b"", with_system_header=False)[4:12]  # reuse pack body
        + bytes([0, 0, 1, 0xC0, 0, len(body)])
        + body
        + PS.END_CODE
    )
    streams = PS.demux_mpeg_ps(ps)
    assert streams[0xC0] == b"\x01\x02\x03"
    assert PS.ps_video_es(ps) is None


def test_marker_bit_tamper_detected_strict():
    es, _ = _es()
    ps = bytearray(PS.encode_mpeg_ps(es))
    ps[4] = 0x00  # pack header '0010' marker nibble cleared
    with pytest.raises(PS.MpegPsError, match="pack header"):
        PS.demux_mpeg_ps(bytes(ps), strict=True)


def test_trailing_garbage_strict():
    es, _ = _es()
    ps = PS.encode_mpeg_ps(es)
    with pytest.raises(PS.MpegPsError, match="trailing"):
        PS.demux_mpeg_ps(ps + b"\x00\x01", strict=True)
    out = PS.demux_mpeg_ps(ps + b"\x00\x01")  # lax: ignore
    assert out[0xE0] == es


def test_video_metadata_and_frames_through_pipeline(spark):
    """PS assets flow through video_metadata (format mpeg1-ps) and
    sample_frames (pictures decode identically to the bare ES)."""
    from ai_tutor_based_on_rag_using_lanchain_and_vectordb_spark.sources import multimodal as MM

    es, ref = _es()
    ps = PS.encode_mpeg_ps(es, pes_size=150)
    assets = spark.createDataFrame(
        [(1, 0, "video", bytearray(es), {}), (2, 0, "video", bytearray(ps), {})],
        MM.MEDIA_ASSETS,
    )
    meta = {r["asset_id"]: r for r in MM.video_metadata(assets, strict=True).collect()}
    assert meta[1]["format"] == "mpeg1" and meta[2]["format"] == "mpeg1-ps"
    assert meta[1]["width"] == meta[2]["width"] == 32
    frames = MM.sample_frames(assets, every_ms=1, strict=True).collect()
    by_asset = {}
    for r in frames:
        by_asset.setdefault(r["asset_id"], []).append(r["frame"])
    assert len(by_asset[1]) == len(by_asset[2]) == 2
    assert [bytes(f) for f in by_asset[1]] == [bytes(f) for f in by_asset[2]]
