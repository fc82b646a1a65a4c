"""MPEG-1 video codec (sources/mpeg1.py): VLC-table invariants,
encode→decode round trips pinned EXACTLY to the encoder's reference
reconstruction (I, P, motion full/half-pel, skip, custom matrices,
multi-slice, stuffing, f_codes), metadata, and fail-soft behavior."""

from __future__ import annotations

import numpy as np
import pytest

from ai_tutor_based_on_rag_using_lanchain_and_vectordb_spark.sources import mpeg1 as M


def _grad(h, w, seed=0):
    y, x = np.mgrid[0:h, 0:w]
    return np.stack(
        [(x * 3 + seed) % 256, (y * 4 + 2 * seed) % 256, ((x + y) * 2) % 256],
        axis=-1,
    ).astype(np.uint8)


def _noise(h, w, seed):
    return np.random.default_rng(seed).integers(0, 256, (h, w, 3), dtype=np.uint8)


def _roundtrip(frames, **kw):
    data, recon = M.encode_m1v(frames, **kw)
    info, dec = M.decode_m1v(data, strict=True)
    assert len(dec) == len(frames)
    for i, (a, b) in enumerate(zip(dec, recon)):
        assert np.array_equal(a, b), f"frame {i} diverged from encoder recon"
    return data, info, dec


# ------------------------------------------------------------- VLC tables


def _all_codes():
    codes = []
    codes += list(M.MBA_CODES.values()) + [M.MBA_ESCAPE, M.MBA_STUFFING]
    return {
        "mba": list(M.MBA_CODES.values()) + [M.MBA_ESCAPE, M.MBA_STUFFING],
        "mbtype_i": list(M.MBTYPE_I.keys()),
        "mbtype_p": list(M.MBTYPE_P.keys()),
        "cbp": list(M.CBP_CODES.values()),
        "motion": list(M.MOTION_CODES.values()),
        "dc_luma": list(M.DC_SIZE_LUMA.values()),
        "dc_chroma": list(M.DC_SIZE_CHROMA.values()),
        "dct": list(M.DCT_CODES.values()) + [M.DCT_EOB, M.DCT_ESCAPE],
    }


@pytest.mark.parametrize("name,codes", _all_codes().items())
def test_vlc_tables_prefix_free(name, codes):
    # a decode table with one code a prefix of another is undecodable —
    # this catches the classic transcription slip class
    assert len(set(codes)) == len(codes), f"{name}: duplicate code"
    s = sorted(codes)
    for a, b in zip(s, s[1:]):
        assert not b.startswith(a), f"{name}: {a} is a prefix of {b}"


def test_dct_table_shape():
    # B.14 structure: 111 run/level entries, runs 0-31, level caps
    assert len(M.DCT_CODES) == 111
    by_run = {}
    for (r, l), _ in M.DCT_CODES.items():
        by_run.setdefault(r, []).append(l)
    assert max(by_run) == 31
    assert sorted(by_run[0]) == list(range(1, 41))
    assert sorted(by_run[1]) == list(range(1, 19))
    for r in range(27, 32):
        assert by_run[r] == [1]


# ------------------------------------------------------------ round trips


@pytest.mark.parametrize("h,w", [(16, 16), (48, 64), (33, 47), (17, 81)])
def test_intra_roundtrip_sizes(h, w):
    # non-multiple-of-16 sizes exercise pad + crop
    data, info, dec = _roundtrip([_grad(h, w)])
    assert (info.width, info.height) == (w, h)
    assert dec[0].shape == (h, w, 3)


def test_intra_quality():
    src = _grad(48, 64)
    _, _, dec = _roundtrip([src])
    err = np.abs(dec[0].astype(int) - src.astype(int)).mean()
    assert err < 4.0  # smooth content compresses nearly losslessly


def test_p_frames_motion_and_residual():
    base = _grad(48, 64)
    f1 = np.roll(base, 2, axis=1)  # content moved right 2 pels → mv -4
    f2 = f1.copy()
    f2[10:18, 10:18] = 255 - f2[10:18, 10:18]
    data, info, dec = _roundtrip(
        [base, f1, f2, f2], mvs=[None, (0, -4), (0, 0), (1, 1)]
    )
    assert info.n_pictures == 4
    # P pictures must actually be smaller than coding everything intra
    intra_only, _ = M.encode_m1v([base, f1, f2, f2], gop=1)
    assert len(data) < len(intra_only)


def test_half_pel_interpolation_path():
    base = _grad(32, 32, seed=3)
    _roundtrip([base, base, base], mvs=[None, (1, 1), (-1, -3)])


def test_large_mv_big_f_code():
    base = _grad(64, 96)
    moved = np.roll(base, 24, axis=1)
    _roundtrip([base, moved], mvs=[None, (0, -48)], f_code=3)


def test_skipped_macroblocks_shrink_stream():
    base = _grad(48, 64)
    static, _ = M.encode_m1v([base, base])
    changed, _ = M.encode_m1v([base, np.roll(base, 8, 0)])
    assert len(static) < len(changed)
    _roundtrip([base, base])


def test_custom_quant_matrices():
    iq = np.clip(M.DEFAULT_INTRA_Q * 2, 1, 255)
    nq = np.full((8, 8), 24, dtype=np.int64)
    src = _grad(32, 48)
    data, _, _ = _roundtrip(
        [src, np.roll(src, 1, 0)], intra_q=iq, non_intra_q=nq
    )
    # matrices are actually in the header (load flags set)
    default, _, _ = _roundtrip([src, np.roll(src, 1, 0)])
    assert data != default


def test_multi_slice_and_stuffing():
    src = _grad(64, 48, seed=5)
    _roundtrip([src, np.roll(src, 3, 1)], slices_per_picture=4)
    _roundtrip([src], mb_stuffing=True)


def test_gop_second_intra():
    base = _grad(32, 32)
    seq = [base, np.roll(base, 1, 1), _grad(32, 32, seed=9), base]
    _roundtrip(seq, gop=2)  # pictures 0 and 2 intra


def test_noise_exercises_escape_coding():
    # heavy noise at low q produces |level| beyond every B.14 entry →
    # escape path on both sides
    _roundtrip([_noise(32, 32, 1)], q_scale=1)
    _roundtrip([_noise(32, 32, 2), _noise(32, 32, 3)], q_scale=1)


# ------------------------------------------------------------- metadata


def test_video_info():
    data, _ = M.encode_m1v([_grad(32, 48)] * 3, fps_code=5)
    info = M.video_info(data)
    assert (info.width, info.height) == (48, 32)
    assert info.fps == 30.0
    assert info.n_pictures == 3
    assert info.duration_ms == 100
    assert M.is_mpeg1(data)
    assert not M.is_mpeg1(b"\x00\x00\x01\xb7")
    assert M.video_info(b"garbage") is None


# -------------------------------------------------------------- fail-soft


def test_truncation_lax_keeps_prefix_strict_raises():
    # equal-weight pictures (intra-only noise) so a 55% cut lands
    # between pictures 2 and 3
    data, _ = M.encode_m1v([_noise(32, 32, s) for s in range(4)], gop=1)
    cut = data[: int(len(data) * 0.55)]
    info, frames = M.decode_m1v(cut)
    assert info is not None
    assert 0 < len(frames) < 4
    with pytest.raises(M.Mpeg1Error):
        M.decode_m1v(cut, strict=True)


def test_reserved_picture_type_rejected():
    data, _ = M.encode_m1v([_grad(16, 16)])
    # flip picture_coding_type I→5 (reserved) in the picture header:
    # the type field is bits 10-12 after the picture start code
    idx = data.find(b"\x00\x00\x01\x00") + 4
    b = bytearray(data)
    # bits: tttttttttt TTT... → byte1 holds bits 8-15 of the header
    # temporal_ref(10) then type(3): type occupies bits 10-12
    b[idx + 1] = (b[idx + 1] & ~0x38) | (5 << 3)
    with pytest.raises(M.Mpeg1Error, match="reserved picture_coding_type"):
        M.decode_m1v(bytes(b), strict=True)
    info, frames = M.decode_m1v(bytes(b))
    assert frames == []


def test_b_picture_before_two_refs_rejected():
    # I B P stream with the P picture excised: the B has no backward
    # anchor pair left in decode order... drop everything from the
    # second start code group so only [I, B] remain
    base = _grad(32, 32)
    data, _ = M.encode_m1v([base, base, base], b_frames=2, gop=3)
    # coded order: I(0), then the GOP's Bs would need TWO anchors —
    # with all three display frames in one group the coded order is
    # I, P?  Build explicitly: 4 frames b_frames=1 → coded I P B; cut
    # the P out
    data, _ = M.encode_m1v([base, base, base], b_frames=1, gop=2)
    pics = []
    start = 0
    while True:
        i = data.find(b"\x00\x00\x01\x00", start)
        if i < 0:
            break
        pics.append(i)
        start = i + 4
    assert len(pics) == 3  # I(0) P(2) B(1) coded order
    chopped = data[: pics[1]] + data[pics[2] :]  # remove the P
    with pytest.raises(M.Mpeg1Error, match="two reference"):
        M.decode_m1v(chopped, strict=True)


# --------------------------------------------------------------- B frames


def test_b_frames_roundtrip_exact():
    base = _grad(48, 64)
    frames = [np.roll(base, 2 * i, axis=1) for i in range(5)]  # I B P B P
    data, info, dec = _roundtrip(
        frames,
        b_frames=1,
        mvs=[None, (0, -2), (0, -4), (0, -2), (0, -4)],
        b_mvs=[None, ((0, -2), (0, 2)), None, ((0, -2), (0, 2)), None],
    )
    assert info.n_pictures == 5


def test_b_frames_display_order():
    # distinct uniform levels per display frame: decode order differs
    # from display order, output must come back sorted by display time
    frames = [np.full((16, 16, 3), 40 + 30 * i, np.uint8) for i in range(5)]
    data, _, dec = _roundtrip(frames, b_frames=1)
    for i, img in enumerate(dec):
        assert abs(int(img.mean()) - (40 + 30 * i)) <= 2, i


def test_b_frames_interp_backward_paths():
    # still scene then a jump: Bs between identical anchors prefer
    # interp/backward modes; round trip must stay exact either way
    a = _grad(32, 48, seed=1)
    b = _grad(32, 48, seed=7)
    _roundtrip([a, a, a, b, b, b], b_frames=2, gop=3)


def test_b_frames_two_between():
    base = _grad(32, 32)
    frames = [np.roll(base, i, axis=0) for i in range(7)]
    _roundtrip(frames, b_frames=2, gop=6,
               mvs=[None] + [(-2 * (i % 3 or 3), 0) for i in range(1, 7)])


def test_b_frames_trailing_tail_promoted():
    # 6 frames, b=1 → anchors 0,2,4 and trailing 5 becomes a P anchor
    base = _grad(16, 32)
    frames = [np.roll(base, i, axis=1) for i in range(6)]
    _roundtrip(frames, b_frames=1)


def test_b_gop_validation():
    with pytest.raises(M.Mpeg1Error, match="multiple"):
        M.encode_m1v([_grad(16, 16)] * 4, b_frames=1, gop=3)


def test_garbage_after_header_fail_soft():
    data, _ = M.encode_m1v([_grad(16, 16)])
    junk = data[:20] + bytes(range(256)) * 3
    info, frames = M.decode_m1v(junk)  # must not raise in lax mode
    assert info is not None


def test_p_before_i_rejected():
    data, _ = M.encode_m1v([_grad(16, 16), _grad(16, 16, seed=2)])
    # drop everything between sequence header end and the second
    # (P) picture start code
    second_pic = data.find(b"\x00\x00\x01\x00", data.find(b"\x00\x00\x01\x00") + 4)
    seq_hdr_end = data.find(b"\x00\x00\x01\xb8")  # GOP header start
    chopped = data[:seq_hdr_end] + data[second_pic:]
    with pytest.raises(M.Mpeg1Error, match="P picture before"):
        M.decode_m1v(chopped, strict=True)


def test_golden_stream_pin():
    """Byte-exact pin of a deterministic stream (I + full-pel P +
    half-pel P, q=4, 2 slices): any drift in a VLC table, the zigzag,
    quantization, or header layout changes these bytes. The round-trip
    tests alone cannot catch a self-consistent table error; this pin at
    least freezes today's transcription."""
    import hashlib

    y, x = np.mgrid[0:32, 0:48]
    base = np.stack(
        [(x * 5) % 256, (y * 3) % 256, ((x + y) * 2) % 256], axis=-1
    ).astype(np.uint8)
    data, _ = M.encode_m1v(
        [base, np.roll(base, 2, axis=1), np.roll(base, 4, axis=1)],
        mvs=[None, (0, -4), (1, -3)],
        q_scale=4,
        slices_per_picture=2,
    )
    assert len(data) == 419
    assert (
        hashlib.sha256(data).hexdigest()
        == "5407f4f6458b1eef4e111ac9332f120deb15e108c6c64a558849f387f48ac00e"
    )



# --------------------------------------------------------------- D frames


def test_d_pictures_roundtrip_exact():
    # per-macroblock constant grays: DC-only quantization is exact
    rng = np.random.default_rng(4)
    levels = rng.integers(0, 256, (3, 2, 3))
    frames = [
        np.repeat(np.repeat(lv, 16, 0), 16, 1).astype(np.uint8)[..., None]
        .repeat(3, 2)
        for lv in levels
    ]
    data, ref = M.encode_m1v(frames, d_pictures=True)
    info, dec = M.decode_m1v(data, strict=True)
    assert info.n_pictures == 3 and len(dec) == 3
    for d, r, f in zip(dec, ref, frames):
        assert np.array_equal(d, r)  # decoder ≡ encoder reconstruction
        assert np.array_equal(d, f)  # and exact on blockwise-flat input


def test_d_pictures_gradient_recon_exact():
    g = (np.arange(32 * 48 * 3, dtype=np.uint8).reshape(32, 48, 3) * 7) % 251
    data, ref = M.encode_m1v([g, g], d_pictures=True)
    _, dec = M.decode_m1v(data, strict=True)
    assert np.array_equal(dec[0], ref[0])
    # D coding keeps only per-block DC: tiny stream
    assert len(data) < 300


def test_d_pictures_exclude_prediction_options():
    g = np.zeros((16, 16, 3), np.uint8)
    with pytest.raises(M.Mpeg1Error, match="all-D"):
        M.encode_m1v([g, g], d_pictures=True, b_frames=1)
    with pytest.raises(M.Mpeg1Error, match="all-D"):
        M.encode_m1v([g, g], d_pictures=True, mvs=[None, (0, 2)])
