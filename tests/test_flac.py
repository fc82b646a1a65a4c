"""FLAC codec (sources/flac.py): lossless round trips across every
subframe/stereo/residual path, structural validation (CRC-8/16, MD5,
coded numbers), fail-closed lax decode, and a golden byte pin guarding
the encoder against silent drift. No external FLAC implementation
exists in this container to cross-validate against, so the suite leans
on (a) sample-exact round trips, (b) tamper detection, (c) spec-table
spot values, and (d) the byte pin."""

from __future__ import annotations

import hashlib

import numpy as np
import pytest

from ai_tutor_based_on_rag_using_lanchain_and_vectordb_spark.sources import flac as FL
from ai_tutor_based_on_rag_using_lanchain_and_vectordb_spark.sources import mediadecode as MD


def _sig(n=5000, seed=7, amp=3000):
    rng = np.random.default_rng(seed)
    t = np.arange(n)
    l = (amp * np.sin(t / 30) + rng.integers(-50, 50, n)).astype(np.int64)
    r = (amp * 0.8 * np.sin(t / 31 + 1) + rng.integers(-50, 50, n)).astype(np.int64)
    return np.stack([l, r], axis=1)


def _roundtrip(s, **kw):
    data = FL.encode_flac(s, **kw)
    info, dec = FL.decode_flac(data, strict=True)
    want = s if s.ndim == 2 else s[:, None]
    assert np.array_equal(dec, want)
    assert info.md5_ok
    return data, info


# ------------------------------------------------------------ round trips


@pytest.mark.parametrize(
    "kw",
    [
        {},
        {"block_size": 1024},
        {"block_size": 100},  # uncommon 8-bit block-size code
        {"block_size": 777},  # uncommon 16-bit block-size code
        {"lpc_order": 8},
        {"stereo_mode": "indep"},
        {"stereo_mode": "mid_side"},
        {"stereo_mode": "left_side"},
        {"stereo_mode": "right_side"},
        {"partition_order": 2},
        {"force_subframe": "verbatim"},
        {"variable_blocking": True},
        {"padding": 32},
        {"sample_rate": 12345},  # uncommon 16-bit Hz sample-rate code
        {"sample_rate": 123450},  # 16-bit tens-of-Hz code
        {"bits_per_sample": 20, "block_size": 192},  # table block size
    ],
)
def test_stereo_roundtrip_exact(kw):
    _roundtrip(_sig(), **kw)


def test_mono_lpc_roundtrip():
    t = np.arange(3000)
    m = (200 * np.sin(t / 10)).astype(np.int64)
    data, info = _roundtrip(m, lpc_order=4)
    assert info.channels == 1
    # LPC must beat fixed prediction on a smooth signal
    assert len(data) < len(FL.encode_flac(m))


def test_constant_subframe():
    c = np.full(3000, -123, np.int64)
    data, _ = _roundtrip(c)
    assert len(data) < 100  # one CONSTANT subframe per block


def test_noise_uses_escape_and_stays_exact():
    rng = np.random.default_rng(3)
    x = rng.integers(-32768, 32768, 4096).astype(np.int64)
    data, _ = _roundtrip(x)
    assert len(data) < 2 * len(x) * 1.1  # never blows past raw + overhead


def test_rice2_path_32bit_noise():
    rng = np.random.default_rng(5)
    x = rng.integers(-(2**31), 2**31, 2048).astype(np.int64)
    _roundtrip(x, bits_per_sample=32)


@pytest.mark.parametrize("bps", [8, 12, 16, 20, 24, 32])
def test_all_sample_sizes(bps):
    rng = np.random.default_rng(bps)
    lim = 1 << (bps - 1)
    x = rng.integers(-lim, lim, 1500).astype(np.int64)
    _roundtrip(x, bits_per_sample=bps)


def test_wasted_bits_engage_and_roundtrip():
    rng = np.random.default_rng(3)
    base = rng.integers(-800, 800, 3000).astype(np.int64)
    a, _ = _roundtrip(base * 16)
    b, _ = _roundtrip(base * 16 + 1)
    assert len(a) < len(b) - 1000  # 4 wasted bits × 3000 samples ≈ 1.5 kB


def test_zero_tail_partitions():
    s = np.zeros(1024, np.int64)
    s[-1] = 5000
    _roundtrip(s, partition_order=3)


def test_multichannel_independent():
    rng = np.random.default_rng(9)
    s = rng.integers(-1000, 1000, (700, 5)).astype(np.int64)
    data, info = _roundtrip(s, block_size=256)
    assert info.channels == 5


def test_sample_exceeding_bps_rejected():
    with pytest.raises(FL.FlacError, match="exceed"):
        FL.encode_flac(np.array([40000]), bits_per_sample=16)


# ---------------------------------------------------------- validation


def test_strict_truncation_and_lax_prefix():
    s = _sig(2000, amp=800)
    full = FL.encode_flac(s, block_size=256)
    cut = full[: len(full) // 2]
    with pytest.raises(FL.FlacError):
        FL.decode_flac(cut, strict=True)
    info, dec = FL.decode_flac(cut)
    assert 0 < len(dec) < 2000 and len(dec) % 256 == 0
    assert np.array_equal(dec, s[: len(dec)])
    assert not info.md5_ok


def test_crc16_tamper_detected():
    full = FL.encode_flac(_sig(2000, amp=800), block_size=256)
    b = bytearray(full)
    b[len(b) // 2] ^= 0x40
    with pytest.raises(FL.FlacError, match="CRC"):
        FL.decode_flac(bytes(b), strict=True)
    info, dec = FL.decode_flac(bytes(b))  # lax: keeps the good prefix
    assert len(dec) < 2000


def test_md5_tamper_detected():
    full = bytearray(FL.encode_flac(_sig(500, amp=800)))
    # STREAMINFO md5 lives at bytes 26..42 of the 4+4+34 header
    full[30] ^= 0xFF
    with pytest.raises(FL.FlacError, match="MD5"):
        FL.decode_flac(bytes(full), strict=True)
    info, _ = FL.decode_flac(bytes(full))
    assert not info.md5_ok


def test_non_flac_rejected():
    with pytest.raises(FL.FlacError):
        FL.decode_flac(b"RIFF\x00\x00\x00\x00WAVE")


def test_trailing_garbage_strict():
    full = FL.encode_flac(_sig(300, amp=500))
    with pytest.raises(FL.FlacError):
        FL.decode_flac(full + b"\xde\xad\xbe\xef", strict=True)
    info, dec = FL.decode_flac(full + b"\xde\xad\xbe\xef")
    assert len(dec) == 300 and info.md5_ok


# ------------------------------------------------------ spec structures


def test_coded_number_roundtrip():
    for v in [0, 1, 0x7F, 0x80, 0x7FF, 0x800, 0xFFFF, 0x10000,
              0x1FFFFF, 0x3FFFFFF, 0x7FFFFFFF, (1 << 36) - 1]:
        w = FL._BitWriter()
        FL._write_coded_number(w, v)
        r = FL._BitReader(bytes(w.out))
        assert FL._read_coded_number(r) == v, v
    # 7-byte form is 0xFE-led (the UTF-8 extension)
    w = FL._BitWriter()
    FL._write_coded_number(w, (1 << 36) - 1)
    assert w.out[0] == 0xFE and len(w.out) == 7


def test_crc_spot_values():
    # CRC-8 poly 0x07 / CRC-16 poly 0x8005, both init 0 — classic
    # check values for "123456789"
    assert FL.crc8(b"123456789") == 0xF4
    assert FL.crc16(b"123456789") == 0xFEE8


def test_block_size_table_spot_values():
    assert FL.BLOCK_SIZE_CODES[0x1] == 192
    assert FL.BLOCK_SIZE_CODES[0x5] == 4608
    assert FL.BLOCK_SIZE_CODES[0x8] == 256
    assert FL.BLOCK_SIZE_CODES[0xF] == 32768
    assert FL.SAMPLE_RATE_CODES[0x9] == 44100
    assert FL.SAMPLE_SIZE_CODES[0x4] == 16


def test_fixed_predictor_coefficients():
    # binomial rows with alternating sign (§9.2.3)
    assert FL._FIXED_COEF[4] == [4, -6, 4, -1]
    assert FL._FIXED_COEF[3] == [3, -3, 1]


# ------------------------------------------------------- integration


def test_decode_audio_dispatch_flac():
    rate = 8000
    t = np.arange(rate // 5)
    x = (16383 * np.sin(2 * np.pi * 440 * t / rate)).astype(np.int64)
    x[rate // 10 :] = 0
    data = FL.encode_flac(x, sample_rate=rate, bits_per_sample=16,
                          block_size=256, lpc_order=8)
    info = MD.decode_audio(data)
    assert info.format == "flac"
    assert info.sample_rate == rate and info.channels == 1
    assert info.bits_per_sample == 16 and info.n_samples == len(x)
    # loud half then silence: rms ≈ 0.5/√2 over half the span
    assert abs(info.rms - 0.5 / np.sqrt(2) / np.sqrt(2)) < 0.02
    ai, mono = MD.decode_audio_samples(data)
    assert ai.format == "flac" and len(mono) == len(x)
    got = np.sqrt(np.mean(mono[: rate // 10] ** 2))
    assert abs(got - 0.5 / np.sqrt(2)) < 0.01
    assert np.all(mono[rate // 10 :] == 0)


def test_decode_audio_dispatch_wav_unchanged():
    import io
    import struct
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as f:
        f.setnchannels(1)
        f.setsampwidth(2)
        f.setframerate(8000)
        f.writeframes(struct.pack("<4h", 100, -100, 200, -200))
    info = MD.decode_audio(buf.getvalue())
    assert info.format == "wav" and info.n_samples == 4


def test_decode_audio_garbage_returns_none():
    assert MD.decode_audio(b"fLaC" + b"\x00" * 40) is None
    assert MD.decode_audio_samples(b"fLaC\xff\xff") is None
    assert MD.decode_audio(b"") is None


def test_sniff_mime_flac():
    from ai_tutor_based_on_rag_using_lanchain_and_vectordb_spark.sources.loaders import sniff_mime

    assert sniff_mime(b"fLaC\x00\x00\x00\x22") == "audio/flac"


# ------------------------------------------------------- golden byte pin


def test_golden_byte_pin():
    """Any change to the encoder's bit layout, Rice parameter search,
    LPC quantization, or CRC tables flips this hash — forcing a
    deliberate re-pin (the arithcode.py lesson: a self-consistent
    encoder/decoder drift passes every round trip)."""
    t = np.arange(1200)
    s = np.stack(
        [
            (1500 * np.sin(t / 17)).astype(np.int64),
            (1100 * np.sin(t / 23 + 2)).astype(np.int64) * 4,  # wasted bits
        ],
        axis=1,
    )
    data = FL.encode_flac(s, block_size=512, lpc_order=6, partition_order=2)
    info, dec = FL.decode_flac(data, strict=True)
    assert np.array_equal(dec, s)
    assert hashlib.sha256(data).hexdigest() == (
        "9501e54ddda04dfa3827f5bd90cb29e38b73168ea67ae839277108d5a270a0d1"
    )


# One pinned stream PER SUBFRAME TYPE (constant / verbatim / fixed /
# lpc): no external FLAC decoder exists in this container to
# cross-validate against (documented in sources/flac.py), so each
# encoder path gets its own drift tripwire — a layout change in any
# one subframe encoder flips exactly its pin.
_SUBFRAME_PINS = {
    "constant": "068042da1cb88ed8991a6aef8ee51a25b4f7791230df5c6d5101985f85272a83",
    "verbatim": "e940802387b4ba91dae39a1bfdf18211cf5dde4e809a1d3c29920e18f591d3b0",
    "fixed": "58b51056da0ad3098f54eece436ab0e3d4cf66f1b9ae0c35e1e7cec6d558fa1e",
    "lpc": "099ba0b459c30a04589b1eff841a8c5713af8c8abbbbcaf5cc3e9b13734b3c45",
}


def _subframe_case(name):
    t = np.arange(1200)
    smooth = np.stack(
        [
            (1500 * np.sin(t / 17)).astype(np.int64),
            (1100 * np.sin(t / 23 + 2)).astype(np.int64),
        ],
        axis=1,
    )
    rng = np.random.default_rng(11)
    if name == "constant":
        return np.full((1200, 2), 37, dtype=np.int64), dict(block_size=512)
    if name == "verbatim":
        noise = rng.integers(-2000, 2000, size=(1200, 2))
        return noise, dict(block_size=512, force_subframe="verbatim")
    if name == "fixed":
        return smooth, dict(block_size=512, lpc_order=0, partition_order=2)
    return smooth, dict(
        block_size=512, lpc_order=6, partition_order=2, force_subframe="lpc"
    )


@pytest.mark.parametrize("name", sorted(_SUBFRAME_PINS))
def test_golden_pin_per_subframe_type(name):
    sig, kw = _subframe_case(name)
    data = FL.encode_flac(sig, **kw)
    info, dec = FL.decode_flac(data, strict=True)
    assert np.array_equal(dec, sig)
    assert hashlib.sha256(data).hexdigest() == _SUBFRAME_PINS[name]
