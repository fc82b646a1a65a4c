"""FLAC (RFC 9639) lossless-audio elementary codec — stdlib + numpy.

Compressed-audio analog of :mod:`mpeg1`: the multimodal audio stage
(reference parity: the RAG app stores uploads as opaque bytes,
backend/main.py:332 — audio decode is beyond-reference surface) decodes
real FLAC streams instead of stubbing non-WAV codecs. Both directions
are implemented so every decoder path is exercised by in-repo streams:

* **decode**: fLaC marker, metadata-block walk (STREAMINFO required,
  all other block types skipped), frame headers (all block-size /
  sample-rate / sample-size codes, UTF-8-coded frame & sample numbers,
  CRC-8), subframes CONSTANT / VERBATIM / FIXED 0-4 / LPC 1-32, wasted
  bits, Rice + Rice2 residual partitions incl. escape partitions, the
  four channel assignments (independent, left/side, right/side,
  mid/side), frame CRC-16 and stream MD5 verification.
* **encode**: per-block stereo-mode search, per-channel subframe
  search (constant / fixed 0-4 / optional LPC via Levinson-Durbin with
  quantized coefficients), wasted-bits detection, exact best-k Rice
  parameter per partition with escape fallback, Rice2 when a parameter
  exceeds the 4-bit space, correct CRCs and MD5.

Lossless means round trips are SAMPLE-EXACT (`decode(encode(x)) == x`)
for any int input within bits_per_sample — the property the tests pin.
Like the other in-container codecs, no external FLAC implementation
exists here to cross-validate against (verified each round:
``find / -name 'libFLAC*'`` and ``which flac ffmpeg`` come up empty);
the golden byte-pin tests — one pinned stream PER SUBFRAME TYPE
(constant / verbatim / fixed / lpc) plus a combined stereo+wasted-bits
stream — guard the encoder against silent drift, and every VLC-free
structural field is spec-transcribed with the table values asserted
in tests.
"""

from __future__ import annotations

import hashlib
import struct
from typing import NamedTuple

import numpy as np


class FlacError(ValueError):
    pass


# ------------------------------------------------------------ bit I/O


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, value: int, nbits: int) -> None:
        self.acc = (self.acc << nbits) | (value & ((1 << nbits) - 1))
        self.n += nbits
        while self.n >= 8:
            self.n -= 8
            self.out.append((self.acc >> self.n) & 0xFF)
        self.acc &= (1 << self.n) - 1

    def unary(self, q: int) -> None:
        # q zero bits then a one bit (§9.2.7.1)
        while q >= 32:
            self.write(0, 32)
            q -= 32
        self.write(1, q + 1)

    def align(self) -> None:
        if self.n:
            self.write(0, 8 - self.n)


class _BitReader:
    __slots__ = ("d", "bitpos")

    def __init__(self, data: bytes):
        self.d = data
        self.bitpos = 0

    def read(self, n: int) -> int:
        end = self.bitpos + n
        if end > len(self.d) * 8:
            raise FlacError("truncated stream")
        v = 0
        pos = self.bitpos
        while n:
            byte = self.d[pos >> 3]
            avail = 8 - (pos & 7)
            take = min(avail, n)
            v = (v << take) | ((byte >> (avail - take)) & ((1 << take) - 1))
            pos += take
            n -= take
        self.bitpos = pos
        return v

    def sread(self, n: int) -> int:
        v = self.read(n)
        return v - (1 << n) if v >= 1 << (n - 1) else v

    def unary(self) -> int:
        q = 0
        nbits = len(self.d) * 8
        pos = self.bitpos
        while True:
            if pos >= nbits:
                raise FlacError("truncated stream")
            if (self.d[pos >> 3] >> (7 - (pos & 7))) & 1:
                self.bitpos = pos + 1
                return q
            pos += 1
            q += 1

    def align(self) -> None:
        self.bitpos = (self.bitpos + 7) & ~7

    def byte_pos(self) -> int:
        return self.bitpos >> 3


# --------------------------------------------------------------- CRCs


def _make_crc8_table() -> list:
    tbl = []
    for b in range(256):
        c = b
        for _ in range(8):
            c = ((c << 1) ^ 0x07) & 0xFF if c & 0x80 else (c << 1) & 0xFF
        tbl.append(c)
    return tbl


def _make_crc16_table() -> list:
    tbl = []
    for b in range(256):
        c = b << 8
        for _ in range(8):
            c = ((c << 1) ^ 0x8005) & 0xFFFF if c & 0x8000 else (c << 1) & 0xFFFF
        tbl.append(c)
    return tbl


_CRC8_T = _make_crc8_table()
_CRC16_T = _make_crc16_table()


def crc8(data: bytes) -> int:
    c = 0
    for b in data:
        c = _CRC8_T[c ^ b]
    return c


def crc16(data: bytes) -> int:
    c = 0
    for b in data:
        c = _CRC16_T[((c >> 8) ^ b) & 0xFF] ^ ((c << 8) & 0xFFFF)
    return c


# -------------------------------------------------- header code tables

# §9.1.1 block-size bits → size (None = uncommon: 8/16-bit at header end)
BLOCK_SIZE_CODES = {
    0x1: 192, 0x2: 576, 0x3: 1152, 0x4: 2304, 0x5: 4608,
    0x8: 256, 0x9: 512, 0xA: 1024, 0xB: 2048, 0xC: 4096,
    0xD: 8192, 0xE: 16384, 0xF: 32768,
}
_BLOCK_SIZE_ENC = {v: k for k, v in BLOCK_SIZE_CODES.items()}

# §9.1.2 sample-rate bits → Hz (0 = streaminfo; 0xC/0xD/0xE trailing)
SAMPLE_RATE_CODES = {
    0x1: 88200, 0x2: 176400, 0x3: 192000, 0x4: 8000, 0x5: 16000,
    0x6: 22050, 0x7: 24000, 0x8: 32000, 0x9: 44100, 0xA: 48000,
    0xB: 96000,
}
_SAMPLE_RATE_ENC = {v: k for k, v in SAMPLE_RATE_CODES.items()}

# §9.1.4 sample-size bits → bits per sample (0 = streaminfo)
SAMPLE_SIZE_CODES = {0x1: 8, 0x2: 12, 0x4: 16, 0x5: 20, 0x6: 24, 0x7: 32}
_SAMPLE_SIZE_ENC = {v: k for k, v in SAMPLE_SIZE_CODES.items()}

# §9.2.3 fixed-predictor coefficients by order (applied to s[i-1..i-o])
_FIXED_COEF = {
    0: [],
    1: [1],
    2: [2, -1],
    3: [3, -3, 1],
    4: [4, -6, 4, -1],
}


# ------------------------------------------------------- coded numbers


def _write_coded_number(w: _BitWriter, v: int) -> None:
    """UTF-8-style variable-length number (§9.1.5), up to 36 bits."""
    if v < 0x80:
        w.write(v, 8)
        return
    for cont, maxbits in ((1, 11), (2, 16), (3, 21), (4, 26), (5, 31), (6, 36)):
        if v < 1 << maxbits:
            lead_prefix = (0x100 - (0x100 >> (cont + 1))) & 0xFF
            w.write(lead_prefix | (v >> (6 * cont)), 8)
            for i in range(cont - 1, -1, -1):
                w.write(0x80 | ((v >> (6 * i)) & 0x3F), 8)
            return
    raise FlacError("coded number out of range")


def _read_coded_number(r: _BitReader) -> int:
    b0 = r.read(8)
    if b0 < 0x80:
        return b0
    n = 0
    mask = 0x40
    while b0 & mask:
        n += 1
        mask >>= 1
    if n < 1 or n > 6:
        raise FlacError("invalid coded number")
    v = b0 & (mask - 1)
    for _ in range(n):
        c = r.read(8)
        if c & 0xC0 != 0x80:
            raise FlacError("invalid coded-number continuation")
        v = (v << 6) | (c & 0x3F)
    return v


# ------------------------------------------------------------- decoder


class FlacInfo(NamedTuple):
    sample_rate: int
    channels: int
    bits_per_sample: int
    total_samples: int
    min_block_size: int
    max_block_size: int
    md5_ok: bool
    n_frames: int


def _decode_residual(r: _BitReader, block_size: int, order: int) -> np.ndarray:
    if order > block_size:
        raise FlacError("predictor order exceeds block size")
    method = r.read(2)
    if method > 1:
        raise FlacError("reserved residual coding method")
    pbits = 4 + method
    escape = (1 << pbits) - 1
    po = r.read(4)
    if block_size % (1 << po):
        raise FlacError("partition order does not divide block size")
    out = np.empty(block_size - order, dtype=np.int64)
    idx = 0
    for p in range(1 << po):
        cnt = (block_size >> po) - (order if p == 0 else 0)
        if cnt < 0:
            raise FlacError("predictor order exceeds first partition")
        k = r.read(pbits)
        if k == escape:
            nraw = r.read(5)
            if nraw == 0:
                out[idx : idx + cnt] = 0
            else:
                for i in range(cnt):
                    out[idx + i] = r.sread(nraw)
        else:
            for i in range(cnt):
                q = r.unary()
                u = (q << k) | r.read(k) if k else q
                out[idx + i] = (u >> 1) ^ -(u & 1)
        idx += cnt
    return out


def _predict(warm: np.ndarray, resid: np.ndarray, coefs: list, shift: int) -> np.ndarray:
    order = len(coefs)
    n = order + len(resid)
    s = np.empty(n, dtype=np.int64)
    s[:order] = warm
    c = coefs  # c[0] applies to s[i-1]
    for i in range(order, n):
        acc = 0
        for j in range(order):
            acc += c[j] * s[i - 1 - j]
        s[i] = resid[i - order] + (acc >> shift)
    return s


def _decode_subframe(r: _BitReader, block_size: int, bps: int) -> np.ndarray:
    if r.read(1):
        raise FlacError("subframe padding bit set")
    ftype = r.read(6)
    wasted = 0
    if r.read(1):
        wasted = r.unary() + 1
    eff = bps - wasted
    if eff <= 0:
        raise FlacError("wasted bits exceed sample size")
    if ftype == 0:  # CONSTANT
        s = np.full(block_size, r.sread(eff), dtype=np.int64)
    elif ftype == 1:  # VERBATIM
        s = np.fromiter(
            (r.sread(eff) for _ in range(block_size)), dtype=np.int64, count=block_size
        )
    elif 8 <= ftype <= 12:  # FIXED order 0-4
        order = ftype - 8
        warm = np.fromiter(
            (r.sread(eff) for _ in range(order)), dtype=np.int64, count=order
        )
        resid = _decode_residual(r, block_size, order)
        s = _predict(warm, resid, _FIXED_COEF[order], 0)
    elif ftype >= 32:  # LPC order 1-32
        order = ftype - 31
        warm = np.fromiter(
            (r.sread(eff) for _ in range(order)), dtype=np.int64, count=order
        )
        precision = r.read(4) + 1
        if precision == 16:
            raise FlacError("invalid LPC precision")
        shift = r.read(5)
        coefs = [r.sread(precision) for _ in range(order)]
        resid = _decode_residual(r, block_size, order)
        s = _predict(warm, resid, coefs, shift)
    else:
        raise FlacError(f"reserved subframe type {ftype:#08b}")
    return s << wasted if wasted else s


def _decode_frame(data: bytes, pos: int, info: dict):
    """One frame at byte offset ``pos`` → (samples (n, ch) int64,
    frame/sample number, next byte offset). Raises FlacError on any
    inconsistency (caller decides strict/lax)."""
    r = _BitReader(data)
    r.bitpos = pos * 8
    if r.read(14) != 0x3FFE:
        raise FlacError("bad frame sync")
    if r.read(1):
        raise FlacError("reserved frame-header bit set")
    variable = r.read(1)
    bs_code = r.read(4)
    sr_code = r.read(4)
    ch_code = r.read(4)
    ss_code = r.read(3)
    if r.read(1):
        raise FlacError("reserved frame-header bit set")
    number = _read_coded_number(r)
    if bs_code == 0:
        raise FlacError("reserved block-size code")
    elif bs_code == 6:
        block_size = r.read(8) + 1
    elif bs_code == 7:
        block_size = r.read(16) + 1
    else:
        block_size = BLOCK_SIZE_CODES[bs_code]
    if sr_code == 0:
        sample_rate = info["sample_rate"]
    elif sr_code == 0xC:
        sample_rate = r.read(8) * 1000
    elif sr_code == 0xD:
        sample_rate = r.read(16)
    elif sr_code == 0xE:
        sample_rate = r.read(16) * 10
    elif sr_code == 0xF:
        raise FlacError("invalid sample-rate code")
    else:
        sample_rate = SAMPLE_RATE_CODES[sr_code]
    if ss_code == 0:
        bps = info["bits_per_sample"]
    elif ss_code == 3:
        raise FlacError("reserved sample-size code")
    else:
        bps = SAMPLE_SIZE_CODES[ss_code]
    if ch_code < 8:
        channels, mode = ch_code + 1, "indep"
    elif ch_code == 8:
        channels, mode = 2, "left_side"
    elif ch_code == 9:
        channels, mode = 2, "right_side"
    elif ch_code == 10:
        channels, mode = 2, "mid_side"
    else:
        raise FlacError("reserved channel assignment")
    hdr_end = r.byte_pos()
    if crc8(data[pos:hdr_end]) != r.read(8):
        raise FlacError("frame header CRC-8 mismatch")
    if channels != info["channels"] or bps != info["bits_per_sample"]:
        raise FlacError("frame disagrees with STREAMINFO")
    if sample_rate != info["sample_rate"]:
        raise FlacError("frame sample rate disagrees with STREAMINFO")

    subs = []
    for ch in range(channels):
        side = (
            (mode == "left_side" and ch == 1)
            or (mode == "right_side" and ch == 0)
            or (mode == "mid_side" and ch == 1)
        )
        subs.append(_decode_subframe(r, block_size, bps + (1 if side else 0)))
    r.align()
    frame_end = r.byte_pos()
    if crc16(data[pos:frame_end]) != r.read(16):
        raise FlacError("frame CRC-16 mismatch")

    if mode == "indep":
        out = np.stack(subs, axis=1)
    elif mode == "left_side":
        left, side = subs
        out = np.stack([left, left - side], axis=1)
    elif mode == "right_side":
        side, right = subs
        out = np.stack([right + side, right], axis=1)
    else:  # mid_side
        mid, side = subs
        m2 = (mid << 1) | (side & 1)
        out = np.stack([(m2 + side) >> 1, (m2 - side) >> 1], axis=1)
    return out, variable, number, r.byte_pos()


def decode_flac(data: bytes, strict: bool = False):
    """Decode a FLAC stream → (FlacInfo, samples int64 (n, channels)).

    ``strict=True`` raises on any malformation (bad CRC, truncation,
    trailing garbage, MD5 mismatch when STREAMINFO carries one);
    lax mode keeps the valid frame prefix and reports ``md5_ok``.
    """
    if len(data) < 4 or data[:4] != b"fLaC":
        raise FlacError("missing fLaC marker")
    r = _BitReader(data)
    r.bitpos = 32
    info = None
    last = False
    while not last:
        last = bool(r.read(1))
        btype = r.read(7)
        length = r.read(24)
        body_at = r.byte_pos()
        if btype == 127:
            raise FlacError("forbidden metadata block type")
        if btype == 0:
            if length != 34:
                raise FlacError("bad STREAMINFO length")
            min_bs = r.read(16)
            max_bs = r.read(16)
            r.read(24)  # min frame size (informational)
            r.read(24)  # max frame size
            sr = r.read(20)
            ch = r.read(3) + 1
            bps = r.read(5) + 1
            total = r.read(36)
            md5 = data[r.byte_pos() : r.byte_pos() + 16]
            r.bitpos += 128
            info = {
                "sample_rate": sr,
                "channels": ch,
                "bits_per_sample": bps,
                "total_samples": total,
                "min_block_size": min_bs,
                "max_block_size": max_bs,
                "md5": md5,
            }
        else:
            if body_at + length > len(data):
                raise FlacError("truncated metadata block")
            r.bitpos = (body_at + length) * 8
    if info is None:
        raise FlacError("no STREAMINFO block")

    frames = []
    n_frames = 0
    pos = r.byte_pos()
    expect_next = 0  # next frame number (fixed) / sample number (variable)
    while pos < len(data):
        try:
            block, variable, number, pos2 = _decode_frame(data, pos, info)
        except FlacError:
            if strict:
                raise
            break
        if number != expect_next:
            if strict:
                raise FlacError(
                    f"frame number {number} out of order (expected {expect_next})"
                )
            break
        expect_next = number + (len(block) if variable else 1)
        frames.append(block)
        n_frames += 1
        pos = pos2
    if strict and pos < len(data):
        raise FlacError("trailing bytes after last frame")

    if frames:
        samples = np.concatenate(frames, axis=0)
    else:
        samples = np.zeros((0, info["channels"]), dtype=np.int64)
    if info["total_samples"]:
        if strict and len(samples) != info["total_samples"]:
            raise FlacError("decoded sample count disagrees with STREAMINFO")
        samples = samples[: info["total_samples"]]

    md5_ok = False
    if info["md5"] != b"\x00" * 16:
        md5_ok = hashlib.md5(
            _pack_samples(samples, info["bits_per_sample"])
        ).digest() == info["md5"]
        if strict and not md5_ok:
            raise FlacError("stream MD5 mismatch")
    return (
        FlacInfo(
            info["sample_rate"],
            info["channels"],
            info["bits_per_sample"],
            info["total_samples"],
            info["min_block_size"],
            info["max_block_size"],
            md5_ok,
            n_frames,
        ),
        samples,
    )


def _pack_samples(samples: np.ndarray, bps: int) -> bytes:
    """Interleaved little-endian signed samples at ceil(bps/8) bytes —
    the layout the stream MD5 covers (§8.2)."""
    nbytes = (bps + 7) // 8
    flat = samples.reshape(-1).astype(np.int64)
    if nbytes == 1:
        return flat.astype(np.int8).tobytes()
    if nbytes == 2:
        return flat.astype("<i2").tobytes()
    if nbytes == 4:
        return flat.astype("<i4").tobytes()
    # 24-bit: low 3 bytes of the little-endian 32-bit form
    b4 = flat.astype("<i4").view(np.uint8).reshape(-1, 4)
    return b4[:, :3].tobytes()


# ------------------------------------------------------------- encoder


def _zigzag(v: np.ndarray) -> np.ndarray:
    return (v << 1) ^ (v >> 63)


def _rice_cost(u: np.ndarray, k: int) -> int:
    return int(np.sum(u >> k)) + len(u) * (1 + k)


def _best_rice(u: np.ndarray, kmax: int):
    """(k, cost) minimizing the exact Rice bit cost for folded values."""
    best_k, best_c = 0, _rice_cost(u, 0)
    for k in range(1, kmax + 1):
        c = _rice_cost(u, k)
        if c < best_c:
            best_k, best_c = k, c
        elif c > best_c * 2:
            break
    return best_k, best_c


def _write_residual(
    w: _BitWriter, resid: np.ndarray, block_size: int, order: int, po: int
) -> None:
    u = _zigzag(resid.astype(np.int64))
    # method: Rice2 only if some partition's best k needs 5 bits
    parts = []
    idx = 0
    for p in range(1 << po):
        cnt = (block_size >> po) - (order if p == 0 else 0)
        parts.append(u[idx : idx + cnt])
        idx += cnt
    choices = []
    need_rice2 = False
    for part in parts:
        if len(part) == 0:
            choices.append((0, 0, False))
            continue
        k, cost = _best_rice(part, 30)
        # zigzag-folded max bit length == signed two's-complement width
        maxbits = int(part.max()).bit_length() if part.max() > 0 else 0
        raw_cost = len(part) * maxbits
        use_escape = maxbits <= 31 and raw_cost + 5 < cost
        choices.append((k, maxbits, use_escape))
        if not use_escape and k > 14:
            need_rice2 = True
    method = 1 if need_rice2 else 0
    pbits = 4 + method
    escape = (1 << pbits) - 1
    w.write(method, 2)
    w.write(po, 4)
    for part, (k, maxbits, use_escape) in zip(parts, choices):
        if use_escape:
            w.write(escape, pbits)
            w.write(maxbits, 5)
            if maxbits:
                for v in part:
                    # verbatim residuals are the signed originals
                    sv = int((v >> 1) ^ -(v & 1))
                    w.write(sv & ((1 << maxbits) - 1), maxbits)
        else:
            w.write(k, pbits)
            for v in part:
                v = int(v)
                w.unary(v >> k)
                if k:
                    w.write(v & ((1 << k) - 1), k)


def _fixed_residual(s: np.ndarray, order: int) -> np.ndarray:
    r = s.astype(np.int64)
    for _ in range(order):
        r = np.diff(r)
    return r


def _lpc_coefs(s: np.ndarray, order: int, precision: int = 12):
    """Quantized LPC coefficients via autocorrelation + Levinson-Durbin.
    Returns (qcoefs list, shift) or None when the signal is degenerate
    (constant / too short) and LPC adds nothing."""
    x = s.astype(np.float64)
    n = len(x)
    if order < 1 or n <= order + 1:
        return None
    ac = np.array([np.dot(x[: n - i], x[i:]) for i in range(order + 1)])
    if ac[0] == 0:
        return None
    err = ac[0]
    a: list = []
    for i in range(order):
        acc = ac[i + 1] - sum(a[j] * ac[i - j] for j in range(i))
        kref = acc / err
        a = [a[j] - kref * a[i - 1 - j] for j in range(i)] + [kref]
        err *= 1 - kref * kref
        if err <= 0:
            return None
    a = np.asarray(a)
    cmax = np.max(np.abs(a))
    if not np.isfinite(cmax) or cmax == 0:
        return None
    shift = precision - 1 - int(np.floor(np.log2(cmax))) - 1
    shift = max(0, min(31, shift))
    lim = 1 << (precision - 1)
    q = np.clip(np.round(a * (1 << shift)), -lim, lim - 1).astype(np.int64)
    if not q.any():
        return None
    return list(q), shift


def _lpc_residual(s: np.ndarray, coefs: list, shift: int) -> np.ndarray:
    order = len(coefs)
    x = s.astype(np.int64)
    acc = np.zeros(len(x) - order, dtype=np.int64)
    for j, c in enumerate(coefs):
        acc += int(c) * x[order - 1 - j : len(x) - 1 - j]
    return x[order:] - (acc >> shift)


def _subframe_plan(s: np.ndarray, bps: int, lpc_order: int, force: str | None):
    """Pick (kind, order, coefs, shift, resid, wasted) for one channel."""
    wasted = 0
    sv = s.astype(np.int64)
    if np.all(sv == sv[0]):
        return ("constant", 0, None, 0, None, 0)
    nz = sv[sv != 0]
    if len(nz):
        tz = int(np.min([(int(v) & -int(v)).bit_length() - 1 for v in nz[:256]]))
        if tz > 0 and np.all(sv % (1 << tz) == 0):
            wasted = tz
            sv = sv >> tz
    best = None  # (cost, kind, order, coefs, shift, resid)
    for order in range(min(5, len(sv))):
        resid = _fixed_residual(sv, order)
        u = _zigzag(resid)
        cost = _best_rice(u, 30)[1] if len(u) else 0
        cost += order * (bps - wasted)
        if best is None or cost < best[0]:
            best = (cost, "fixed", order, None, 0, resid)
    if (force == "lpc" or lpc_order) and len(sv) > lpc_order + 1:
        q = _lpc_coefs(sv, lpc_order)
        if q is not None:
            coefs, shift = q
            resid = _lpc_residual(sv, coefs, shift)
            u = _zigzag(resid)
            cost = _best_rice(u, 30)[1] + lpc_order * (bps - wasted) + lpc_order * 12
            if force == "lpc" or cost < best[0]:
                best = (cost, "lpc", lpc_order, coefs, shift, resid)
    if force == "verbatim":
        return ("verbatim", 0, None, 0, None, wasted)
    _, kind, order, coefs, shift, resid = best
    return (kind, order, coefs, shift, resid, wasted)


def _write_subframe(
    w: _BitWriter,
    s: np.ndarray,
    bps: int,
    po: int,
    lpc_order: int,
    force: str | None,
) -> None:
    kind, order, coefs, shift, resid, wasted = _subframe_plan(
        s, bps, lpc_order, force
    )
    eff = bps - wasted
    sv = (s.astype(np.int64) >> wasted) if wasted else s.astype(np.int64)
    block_size = len(s)
    if kind == "constant":
        w.write(0, 1)
        w.write(0, 6)
        w.write(0, 1)
        w.write(int(sv[0]) & ((1 << eff) - 1), eff)
        return
    header_type = {
        "verbatim": 1,
        "fixed": 8 + order,
        "lpc": 31 + order,
    }[kind]
    w.write(0, 1)
    w.write(header_type, 6)
    if wasted:
        w.write(1, 1)
        w.unary(wasted - 1)
    else:
        w.write(0, 1)
    if kind == "verbatim":
        for v in sv:
            w.write(int(v) & ((1 << eff) - 1), eff)
        return
    for v in sv[:order]:
        w.write(int(v) & ((1 << eff) - 1), eff)
    if kind == "lpc":
        w.write(12 - 1, 4)
        w.write(shift, 5)
        for c in coefs:
            w.write(int(c) & 0xFFF, 12)
    use_po = po
    while use_po and (
        block_size % (1 << use_po) or (block_size >> use_po) <= order
    ):
        use_po -= 1
    _write_residual(w, resid, block_size, order, use_po)


def encode_flac(
    samples: np.ndarray,
    sample_rate: int = 44100,
    bits_per_sample: int = 16,
    block_size: int = 4096,
    stereo_mode: str = "auto",
    lpc_order: int = 0,
    partition_order: int = 0,
    variable_blocking: bool = False,
    force_subframe: str | None = None,
    padding: int = 0,
) -> bytes:
    """Encode integer samples ((n,) mono or (n, ch)) as a FLAC stream.

    Lossless: ``decode_flac(encode_flac(x))[1] == x`` exactly for any
    input within ``bits_per_sample`` (signed). ``stereo_mode``: one of
    auto / indep / left_side / right_side / mid_side (2ch only);
    ``lpc_order`` > 0 enables the LPC search at that order;
    ``force_subframe`` pins every subframe to verbatim/lpc (decoder
    path coverage); ``padding`` appends a PADDING metadata block.
    """
    s = np.asarray(samples)
    if s.ndim == 1:
        s = s[:, None]
    if s.ndim != 2 or s.shape[0] == 0:
        raise FlacError("need a non-empty (n,) or (n, ch) sample array")
    n, channels = s.shape
    if channels > 8:
        raise FlacError("FLAC supports at most 8 channels")
    lim = 1 << (bits_per_sample - 1)
    s = s.astype(np.int64)
    if s.min() < -lim or s.max() >= lim:
        raise FlacError("samples exceed bits_per_sample")
    if not 1 <= block_size <= 65536:
        raise FlacError("block size out of range")

    md5 = hashlib.md5(_pack_samples(s, bits_per_sample)).digest()
    out = bytearray(b"fLaC")
    hdr = _BitWriter()
    hdr.write(0 if padding else 1, 1)
    hdr.write(0, 7)
    hdr.write(34, 24)
    # last-block exemption (§8.2): a single short stream still reports
    # the nominal block size
    hdr.write(block_size, 16)
    hdr.write(block_size, 16)
    hdr.write(0, 24)
    hdr.write(0, 24)
    hdr.write(sample_rate, 20)
    hdr.write(channels - 1, 3)
    hdr.write(bits_per_sample - 1, 5)
    hdr.write(n, 36)
    out += hdr.out + md5
    if padding:
        pad = _BitWriter()
        pad.write(1, 1)
        pad.write(1, 7)
        pad.write(padding, 24)
        out += pad.out + b"\x00" * padding

    frame_no = 0
    pos = 0
    while pos < n:
        cnt = min(block_size, n - pos)
        block = s[pos : pos + cnt]
        w = _BitWriter()
        w.write(0x3FFE, 14)
        w.write(0, 1)
        w.write(1 if variable_blocking else 0, 1)
        bs_code = _BLOCK_SIZE_ENC.get(cnt)
        if bs_code is None:
            bs_code = 7 if cnt > 256 else 6
        w.write(bs_code, 4)
        sr_code = _SAMPLE_RATE_ENC.get(sample_rate)
        if sr_code is None:
            if sample_rate < 65536:
                sr_code = 0xD
            elif sample_rate % 10 == 0 and sample_rate // 10 < 65536:
                sr_code = 0xE
            elif sample_rate % 1000 == 0 and sample_rate // 1000 < 256:
                sr_code = 0xC
            else:
                raise FlacError("sample rate not representable")
        w.write(sr_code, 4)

        mode = stereo_mode
        if channels != 2:
            mode = "indep"
        elif mode == "auto":
            l, r = block[:, 0], block[:, 1]
            side = l - r
            mid = (l + r) >> 1
            def _c(x):
                d = np.abs(np.diff(x.astype(np.int64), 2)) if len(x) > 2 else np.abs(x)
                return int(np.sum(np.log2(d + 1)))
            costs = {
                "indep": _c(l) + _c(r),
                "left_side": _c(l) + _c(side),
                "right_side": _c(side) + _c(r),
                "mid_side": _c(mid) + _c(side),
            }
            mode = min(costs, key=costs.get)
        ch_code = {
            "indep": channels - 1,
            "left_side": 8,
            "right_side": 9,
            "mid_side": 10,
        }[mode]
        w.write(ch_code, 4)
        w.write(_SAMPLE_SIZE_ENC.get(bits_per_sample, 0), 3)
        w.write(0, 1)
        _write_coded_number(w, pos if variable_blocking else frame_no)
        if bs_code == 6:
            w.write(cnt - 1, 8)
        elif bs_code == 7:
            w.write(cnt - 1, 16)
        if sr_code == 0xC:
            w.write(sample_rate // 1000, 8)
        elif sr_code == 0xD:
            w.write(sample_rate, 16)
        elif sr_code == 0xE:
            w.write(sample_rate // 10, 16)
        w.align()
        w.out.append(crc8(bytes(w.out)))

        if mode == "indep":
            chans = [(block[:, c], 0) for c in range(channels)]
        elif mode == "left_side":
            chans = [(block[:, 0], 0), (block[:, 0] - block[:, 1], 1)]
        elif mode == "right_side":
            chans = [(block[:, 0] - block[:, 1], 1), (block[:, 1], 0)]
        else:
            chans = [
                ((block[:, 0] + block[:, 1]) >> 1, 0),
                (block[:, 0] - block[:, 1], 1),
            ]
        for cs, extra in chans:
            _write_subframe(
                w, cs, bits_per_sample + extra, partition_order, lpc_order,
                force_subframe,
            )
        w.align()
        fcrc = crc16(bytes(w.out))
        w.write(fcrc, 16)
        out += w.out
        frame_no += 1
        pos += cnt
    return bytes(out)


