"""MPEG-1 video (ISO/IEC 11172-2) elementary-stream codec — the
"compressed video" half of the multimodal pipeline, stdlib+numpy like
the rest of sources/ (the reference never decodes media at all;
uploads are opaque bytes, backend/main.py:332 — this is beyond-
reference surface).

Scope: intra (I) and forward-predicted (P) pictures, 4:2:0, one or
more slices per picture, full- and half-pel forward motion
compensation, skipped macroblocks, custom or default quantization
matrices, macroblock stuffing, f_codes 1-7. B pictures and D pictures
are not produced by the encoder and are rejected by the decoder
(fail-closed, clearly reported) — I/P covers every element of the
block layer (the B-picture layer adds a second, structurally
identical, MV/prediction path).

Both directions share one set of VLC tables (Annex B: B.1 address
increments, B.2 macroblock types, B.3 coded block pattern, B.4 motion
codes, B.5 DC size, B.14 run/level DCT coefficients), one
reconstruction arithmetic (§2.4.4: ×2 quantizer form with
oddification and ±2048 clamp), and one float IDCT (the 8-point DCT-III
basis shared with the JPEG decoders, mediadecode._jpeg_idct_matrix) —
so encoder-side reference reconstruction is bit-identical to decoder
output by construction, and the round-trip tests pin that equality.

Conformance caveat (documented, same class as the QM coder before its
libjpeg cross-check): no MPEG-capable decoder exists in this container
to cross-validate against, so the Annex-B tables are a from-spec
transcription verified by prefix-freeness + round-trip, not by an
external bitstream.
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np

from .mediadecode import _JPEG_ZIGZAG, _jpeg_idct_matrix

# ------------------------------------------------------------------ consts

SEQ_START = 0xB3
GOP_START = 0xB8
PIC_START = 0x00
SEQ_END = 0xB7
SLICE_MIN, SLICE_MAX = 0x01, 0xAF

PICTURE_RATES = {
    1: 23.976, 2: 24.0, 3: 25.0, 4: 29.97, 5: 30.0, 6: 50.0, 7: 59.94, 8: 60.0,
}

# §2.4.4.2 default intra quantizer matrix (raster order)
DEFAULT_INTRA_Q = np.array(
    [
        8, 16, 19, 22, 26, 27, 29, 34,
        16, 16, 22, 24, 27, 29, 34, 37,
        19, 22, 26, 27, 29, 34, 34, 38,
        22, 22, 26, 27, 29, 34, 37, 40,
        22, 26, 27, 29, 32, 35, 40, 48,
        26, 27, 29, 32, 35, 40, 48, 58,
        26, 27, 29, 34, 38, 46, 56, 69,
        27, 29, 35, 38, 46, 56, 69, 83,
    ],
    dtype=np.int64,
).reshape(8, 8)

DEFAULT_NON_INTRA_Q = np.full((8, 8), 16, dtype=np.int64)

_ZZ = np.array(_JPEG_ZIGZAG)  # MPEG-1 scan order == JPEG zigzag

# ------------------------------------------------------------- VLC tables
# Annex B, written once as (value -> bitstring); decode tries are built
# from the same dicts, so encoder and decoder cannot disagree.

# B.1 macroblock_address_increment (1-33) + escape (+33) + stuffing
MBA_CODES = {
    1: "1", 2: "011", 3: "010", 4: "0011", 5: "0010",
    6: "00011", 7: "00010", 8: "0000111", 9: "0000110",
    10: "00001011", 11: "00001010", 12: "00001001", 13: "00001000",
    14: "00000111", 15: "00000110",
    16: "0000010111", 17: "0000010110", 18: "0000010101",
    19: "0000010100", 20: "0000010011", 21: "0000010010",
    22: "00000100011", 23: "00000100010", 24: "00000100001",
    25: "00000100000", 26: "00000011111", 27: "00000011110",
    28: "00000011101", 29: "00000011100", 30: "00000011011",
    31: "00000011010", 32: "00000011001", 33: "00000011000",
}
MBA_ESCAPE = "00000001000"   # add 33, then continue reading
MBA_STUFFING = "00000001111"  # discarded

# B.2a / B.2b macroblock_type → (quant, motion_forward, coded, intra)
MBTYPE_I = {"1": (0, 0, 0, 1), "01": (1, 0, 0, 1)}
MBTYPE_P = {
    "1": (0, 1, 1, 0),
    "01": (0, 0, 1, 0),
    "001": (0, 1, 0, 0),
    "00011": (0, 0, 0, 1),
    "00010": (1, 1, 1, 0),
    "00001": (1, 0, 1, 0),
    "000001": (1, 0, 0, 1),
}

# B.2c macroblock_type for B pictures →
# (quant, motion_forward, motion_backward, coded, intra)
MBTYPE_B = {
    "10": (0, 1, 1, 0, 0),
    "11": (0, 1, 1, 1, 0),
    "010": (0, 0, 1, 0, 0),
    "011": (0, 0, 1, 1, 0),
    "0010": (0, 1, 0, 0, 0),
    "0011": (0, 1, 0, 1, 0),
    "00011": (0, 0, 0, 0, 1),
    "00010": (1, 1, 1, 1, 0),
    "000011": (1, 1, 0, 1, 0),
    "000010": (1, 0, 1, 1, 0),
    "000001": (1, 0, 0, 0, 1),
}

# B.3 coded_block_pattern (cbp 1-63; 0 has no code)
CBP_CODES = {
    60: "111", 4: "1101", 8: "1100", 16: "1011", 32: "1010",
    12: "10011", 48: "10010", 20: "10001", 40: "10000",
    28: "01111", 44: "01110", 52: "01101", 56: "01100",
    1: "01011", 61: "01010", 2: "01001", 62: "01000",
    24: "001111", 36: "001110", 3: "001101", 63: "001100",
    5: "0010111", 9: "0010110", 17: "0010101", 33: "0010100",
    6: "0010011", 10: "0010010", 18: "0010001", 34: "0010000",
    7: "00011111", 11: "00011110", 19: "00011101", 35: "00011100",
    13: "00011011", 49: "00011010", 21: "00011001", 41: "00011000",
    14: "00010111", 50: "00010110", 22: "00010101", 42: "00010100",
    15: "00010011", 51: "00010010", 23: "00010001", 43: "00010000",
    25: "00001111", 37: "00001110", 26: "00001101", 38: "00001100",
    29: "00001011", 45: "00001010", 53: "00001001", 57: "00001000",
    30: "00000111", 46: "00000110", 54: "00000101", 58: "00000100",
    31: "000000111", 47: "000000110", 55: "000000101", 59: "000000100",
    27: "000000011", 39: "000000010",
}

# B.4 motion_code magnitude (0-16); sign bit follows non-zero codes
MOTION_CODES = {
    0: "1", 1: "01", 2: "001", 3: "0001", 4: "000011",
    5: "0000101", 6: "0000100", 7: "0000011",
    8: "000001011", 9: "000001010", 10: "000001001",
    11: "0000010001", 12: "0000010000", 13: "0000001111",
    14: "0000001110", 15: "0000001101", 16: "0000001100",
}

# B.5a / B.5b dct_dc_size
DC_SIZE_LUMA = {
    0: "100", 1: "00", 2: "01", 3: "101", 4: "110",
    5: "1110", 6: "11110", 7: "111110", 8: "1111110",
}
DC_SIZE_CHROMA = {
    0: "00", 1: "01", 2: "10", 3: "110", 4: "1110",
    5: "11110", 6: "111110", 7: "1111110", 8: "11111110",
}

# B.14 dct_coeff: (run, level) → bits (sign bit appended separately).
# EOB = '10'; (0,1) is '11' except as the FIRST coefficient of a
# non-intra block where it is '1'. ESCAPE = '000001' + run(6) +
# level(8/16).
DCT_CODES = {
    (0, 1): "11", (0, 2): "0100", (0, 3): "00101", (0, 4): "0000110",
    (0, 5): "00100110", (0, 6): "00100001", (0, 7): "0000001010",
    (0, 8): "000000011101", (0, 9): "000000011000",
    (0, 10): "000000010011", (0, 11): "000000010000",
    (0, 12): "0000000011010", (0, 13): "0000000011001",
    (0, 14): "0000000011000", (0, 15): "0000000010111",
    (0, 16): "00000000011111", (0, 17): "00000000011110",
    (0, 18): "00000000011101", (0, 19): "00000000011100",
    (0, 20): "00000000011011", (0, 21): "00000000011010",
    (0, 22): "00000000011001", (0, 23): "00000000011000",
    (0, 24): "00000000010111", (0, 25): "00000000010110",
    (0, 26): "00000000010101", (0, 27): "00000000010100",
    (0, 28): "00000000010011", (0, 29): "00000000010010",
    (0, 30): "00000000010001", (0, 31): "00000000010000",
    (0, 32): "000000000011000", (0, 33): "000000000010111",
    (0, 34): "000000000010110", (0, 35): "000000000010101",
    (0, 36): "000000000010100", (0, 37): "000000000010011",
    (0, 38): "000000000010010", (0, 39): "000000000010001",
    (0, 40): "000000000010000",
    (1, 1): "011", (1, 2): "000110", (1, 3): "00100101",
    (1, 4): "0000001100", (1, 5): "000000011011",
    (1, 6): "0000000010110", (1, 7): "0000000010101",
    (1, 8): "000000000011111", (1, 9): "000000000011110",
    (1, 10): "000000000011101", (1, 11): "000000000011100",
    (1, 12): "000000000011011", (1, 13): "000000000011010",
    (1, 14): "000000000011001",
    (1, 15): "0000000000010011", (1, 16): "0000000000010010",
    (1, 17): "0000000000010001", (1, 18): "0000000000010000",
    (2, 1): "0101", (2, 2): "0000100", (2, 3): "0000001011",
    (2, 4): "000000010100", (2, 5): "0000000010100",
    (3, 1): "00111", (3, 2): "00100100", (3, 3): "000000011100",
    (3, 4): "0000000010011",
    (4, 1): "00110", (4, 2): "0000001111", (4, 3): "000000010010",
    (5, 1): "000111", (5, 2): "0000001001", (5, 3): "0000000010010",
    (6, 1): "000101", (6, 2): "000000011110", (6, 3): "0000000000010100",
    (7, 1): "000100", (7, 2): "000000010101",
    (8, 1): "0000111", (8, 2): "000000010001",
    (9, 1): "0000101", (9, 2): "0000000010001",
    (10, 1): "00100111", (10, 2): "0000000010000",
    (11, 1): "00100011", (11, 2): "0000000000011010",
    (12, 1): "00100010", (12, 2): "0000000000011001",
    (13, 1): "00100000", (13, 2): "0000000000011000",
    (14, 1): "0000001110", (14, 2): "0000000000010111",
    (15, 1): "0000001101", (15, 2): "0000000000010110",
    (16, 1): "0000001000", (16, 2): "0000000000010101",
    (17, 1): "000000011111", (18, 1): "000000011010",
    (19, 1): "000000011001", (20, 1): "000000010111",
    (21, 1): "000000010110",
    (22, 1): "0000000011111", (23, 1): "0000000011110",
    (24, 1): "0000000011101", (25, 1): "0000000011100",
    (26, 1): "0000000011011",
    (27, 1): "0000000000011111", (28, 1): "0000000000011110",
    (29, 1): "0000000000011101", (30, 1): "0000000000011100",
    (31, 1): "0000000000011011",
}
DCT_EOB = "10"
DCT_ESCAPE = "000001"


def _build_trie(codes: dict) -> dict:
    """bitstring→value dict keyed by (length, int(bits, 2)) for O(1)
    longest-prefix probing up to 17 bits."""
    out = {}
    for v, bits in codes.items():
        out[(len(bits), int(bits, 2))] = v
    return out


class Mpeg1Error(ValueError):
    pass


# ----------------------------------------------------------------- bit io


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

    def write_bits(self, bits: str) -> None:
        if bits:
            self.write(int(bits, 2), len(bits))

    def align(self) -> None:
        if self.n:
            self.write(0, 8 - self.n)

    def start_code(self, code: int) -> None:
        self.align()
        self.out += bytes((0, 0, 1, code))


class _BitReader:
    __slots__ = ("d", "bitpos")

    def __init__(self, data: bytes):
        self.d = data
        self.bitpos = 0

    def read(self, n: int) -> int:
        end = self.bitpos + n
        if end > len(self.d) * 8:
            raise Mpeg1Error("truncated stream")
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

    def peek(self, n: int) -> int:
        save = self.bitpos
        try:
            return self.read(n)
        finally:
            self.bitpos = save

    def vlc(self, trie: dict, max_len: int = 17, what: str = "code") -> object:
        for ln in range(1, max_len + 1):
            if (ln, self.peek(ln)) in trie:
                v = trie[(ln, self.peek(ln))]
                self.read(ln)
                return v
        raise Mpeg1Error(f"invalid {what} VLC at bit {self.bitpos}")

    def align(self) -> None:
        self.bitpos = (self.bitpos + 7) & ~7

    def byte_pos(self) -> int:
        return self.bitpos >> 3


def _trie_from_bits(codes: dict) -> dict:
    """{bitstring: value} → decode trie keyed by (len, int(bits, 2))."""
    return {(len(bits), int(bits, 2)): v for bits, v in codes.items()}


_MBA_T = _build_trie(MBA_CODES)
_MBA_T[(len(MBA_ESCAPE), int(MBA_ESCAPE, 2))] = "escape"
_MBA_T[(len(MBA_STUFFING), int(MBA_STUFFING, 2))] = "stuffing"
_MBTYPE_I_T = _trie_from_bits(MBTYPE_I)
_MBTYPE_P_T = _trie_from_bits(MBTYPE_P)
_MBTYPE_B_T = _trie_from_bits(MBTYPE_B)
_CBP_T = _build_trie(CBP_CODES)
_MOTION_T = _build_trie(MOTION_CODES)
_DCL_T = _build_trie(DC_SIZE_LUMA)
_DCC_T = _build_trie(DC_SIZE_CHROMA)
_DCT_T = _build_trie(DCT_CODES)
_DCT_T[(len(DCT_EOB), int(DCT_EOB, 2))] = "eob"
_DCT_T[(len(DCT_ESCAPE), int(DCT_ESCAPE, 2))] = "escape"


# ------------------------------------------------------- shared arithmetic

_IDCT_T = _jpeg_idct_matrix()


def _idct(block: np.ndarray) -> np.ndarray:
    """Shared float IDCT (DCT-III basis) — same rounding for encoder
    reference recon and decoder output."""
    return np.round(_IDCT_T.T @ block.astype(np.float64) @ _IDCT_T)


def _dct(block: np.ndarray) -> np.ndarray:
    return _IDCT_T @ block.astype(np.float64) @ _IDCT_T.T


def _oddify(recon: np.ndarray) -> np.ndarray:
    """§2.4.4.2 mismatch control: every reconstructed coefficient is
    forced odd (even values move one step toward zero)."""
    even = (recon % 2 == 0) & (recon != 0)
    return recon - even * np.sign(recon)


def _recon_intra(levels_zz: np.ndarray, q: int, w: np.ndarray) -> np.ndarray:
    """levels (raster 8x8, DC at [0,0] already ×8) → dequantized
    coefficients."""
    rec = (2 * levels_zz * q * w) // 16
    neg = (2 * levels_zz * q * w) < 0
    rec = np.where(neg, -((-2 * levels_zz * q * w) // 16), rec)  # trunc toward 0
    rec = _oddify(rec)
    rec[0, 0] = levels_zz[0, 0] * 8  # DC: ×8, no oddification
    return np.clip(rec, -2048, 2047)


def _recon_non_intra(levels: np.ndarray, q: int, w: np.ndarray) -> np.ndarray:
    t = (2 * levels + np.sign(levels)) * q * w
    rec = np.where(t >= 0, t // 16, -((-t) // 16))
    rec = _oddify(rec)
    rec[levels == 0] = 0
    return np.clip(rec, -2048, 2047)


def _clamp_mv(mv: int, pos: int, extent: int) -> int:
    """Clamp a half-pel MV so the 16-pel (+½) luma read and the
    derived 8-pel (+½) chroma read stay inside a plane of ``extent``
    pels for a macroblock at pel ``pos``."""
    return max(-pos * 2, min(mv, (extent - 17 - pos) * 2))


def _chroma_mv(mv: int) -> int:
    """Luma half-pel MV → chroma half-pel MV (÷2, truncation toward
    zero, §2.4.4.5) — one rule shared by encoder and decoder."""
    return mv // 2 if mv >= 0 else -((-mv) // 2)


def _half_pel_pred(ref: np.ndarray, y: int, x: int, mv_y: int, mv_x: int,
                   h: int, w: int) -> np.ndarray:
    """Forward prediction of an h×w block at (y, x) from ``ref`` with a
    half-pel MV: right/down half positions average 2 (or 4) neighbors
    with upward rounding (//2 +1), §2.4.4.5."""
    iy, ix = y + (mv_y >> 1), x + (mv_x >> 1)
    hy, hx = mv_y & 1, mv_x & 1
    r = ref.astype(np.int32)
    a = r[iy : iy + h, ix : ix + w]
    if not hy and not hx:
        return a
    if hy and not hx:
        b = r[iy + 1 : iy + 1 + h, ix : ix + w]
        return (a + b + 1) >> 1
    if hx and not hy:
        b = r[iy : iy + h, ix + 1 : ix + 1 + w]
        return (a + b + 1) >> 1
    b = r[iy + 1 : iy + 1 + h, ix : ix + w]
    c = r[iy : iy + h, ix + 1 : ix + 1 + w]
    d = r[iy + 1 : iy + 1 + h, ix + 1 : ix + 1 + w]
    return (a + b + c + d + 2) >> 2


def _rgb_to_ycbcr420(img: np.ndarray):
    """BT.601 full-range (the JPEG convention, consistent across this
    repo's media stack) + 2x2 box-filter chroma subsampling."""
    f = img.astype(np.float64)
    r, g, b = f[..., 0], f[..., 1], f[..., 2]
    yy = 0.299 * r + 0.587 * g + 0.114 * b
    cb = 128.0 - 0.168735892 * r - 0.331264108 * g + 0.5 * b
    cr = 128.0 + 0.5 * r - 0.418687589 * g - 0.081312411 * b
    h, w = yy.shape
    he, we = (h + 1) & ~1, (w + 1) & ~1
    out = []
    for p in (cb, cr):
        pad = np.pad(p, ((0, he - h), (0, we - w)), mode="edge")
        sub = (pad[0::2, 0::2] + pad[1::2, 0::2] + pad[0::2, 1::2] + pad[1::2, 1::2]) / 4.0
        out.append(np.clip(np.round(sub), 0, 255).astype(np.uint8))
    return np.clip(np.round(yy), 0, 255).astype(np.uint8), out[0], out[1]


def _ycbcr420_to_rgb(yp: np.ndarray, cb: np.ndarray, cr: np.ndarray) -> np.ndarray:
    h, w = yp.shape
    cbf = np.repeat(np.repeat(cb, 2, 0), 2, 1)[:h, :w].astype(np.float64) - 128.0
    crf = np.repeat(np.repeat(cr, 2, 0), 2, 1)[:h, :w].astype(np.float64) - 128.0
    yf = yp.astype(np.float64)
    r = yf + 1.402 * crf
    g = yf - 0.344136286 * cbf - 0.714136286 * crf
    b = yf + 1.772 * cbf
    return np.clip(np.round(np.stack([r, g, b], axis=-1)), 0, 255).astype(np.uint8)


# ---------------------------------------------------------------- encoder


def _emit_dc(bw: _BitWriter, diff: int, luma: bool) -> None:
    size = 0 if diff == 0 else max(1, int(abs(diff)).bit_length())
    bw.write_bits((DC_SIZE_LUMA if luma else DC_SIZE_CHROMA)[size])
    if size:
        v = diff if diff > 0 else diff + (1 << size) - 1
        bw.write(v, size)


def _emit_coeff(bw: _BitWriter, run: int, level: int, first: bool) -> None:
    mag = abs(level)
    bits = DCT_CODES.get((run, mag))
    if bits is not None:
        if first and run == 0 and mag == 1:
            bits = "1"
        bw.write_bits(bits)
        bw.write(0 if level > 0 else 1, 1)
        return
    # escape: 6-bit run + 8/16-bit level
    bw.write_bits(DCT_ESCAPE)
    bw.write(run, 6)
    if -127 <= level <= 127 and level != 0:
        bw.write(level & 0xFF, 8)
    elif 128 <= level <= 255:
        bw.write(0x00, 8)
        bw.write(level, 8)
    elif -255 <= level <= -128:
        bw.write(0x80, 8)
        bw.write(level + 256, 8)
    else:
        raise Mpeg1Error(f"level {level} out of escape range")


def _emit_block(bw: _BitWriter, levels_zz: list, intra: bool) -> None:
    """levels_zz: 64 levels in zigzag order (intra: index 0 is the DC
    DIFFERENTIAL, emitted by the caller — here we emit AC only)."""
    run = 0
    first = not intra
    start = 1 if intra else 0
    for i in range(start, 64):
        lv = int(levels_zz[i])
        if lv == 0:
            run += 1
            continue
        _emit_coeff(bw, run, lv, first)
        first = False
        run = 0
    bw.write_bits(DCT_EOB)


def _emit_motion(bw: _BitWriter, diff: int, f: int) -> None:
    """diff already wrapped into [-16f, 16f-1]. Encode motion_code +
    residual (f>1)."""
    if diff == 0:
        bw.write_bits(MOTION_CODES[0])
        return
    r_size = (f - 1).bit_length() if f > 1 else 0
    a = abs(diff)
    code = (a + f - 1) // f
    residual = a - ((code - 1) * f + 1)
    bw.write_bits(MOTION_CODES[code])
    bw.write(0 if diff > 0 else 1, 1)
    if r_size:
        bw.write(residual, r_size)


class _PlaneSet(NamedTuple):
    y: np.ndarray
    cb: np.ndarray
    cr: np.ndarray


def _quant_intra_block(coef: np.ndarray, q: int, w: np.ndarray) -> np.ndarray:
    lv = np.round(16.0 * coef / (2.0 * q * w)).astype(np.int64)
    lv[0, 0] = int(np.round(coef[0, 0] / 8.0))
    return np.clip(lv, -255, 255)


def _quant_non_intra_block(coef: np.ndarray, q: int, w: np.ndarray) -> np.ndarray:
    lv = np.trunc(16.0 * coef / (2.0 * q * w)).astype(np.int64)
    return np.clip(lv, -255, 255)


def encode_m1v(
    frames: list,
    fps_code: int = 3,
    q_scale: int = 8,
    gop: int = 12,
    mvs: list | None = None,
    f_code: int = 2,
    intra_q: np.ndarray | None = None,
    non_intra_q: np.ndarray | None = None,
    mb_stuffing: bool = False,
    slices_per_picture: int = 1,
    b_frames: int = 0,
    b_mvs: list | None = None,
    d_pictures: bool = False,
) -> tuple:
    """Encode RGB frames (each (h, w, 3) uint8) as an MPEG-1 video
    elementary stream. Frame sizes are padded up to 16×16 macroblock
    multiples internally (decode crops back).

    ``mvs``: optional per-DISPLAY-frame (mv_y, mv_x) forward vector in
    HALF-PEL units applied to every MC macroblock of that P/B picture
    (the encoder still picks intra/MC/skip per macroblock by SAD).
    ``b_frames``: number of B pictures between anchors (0 = the I/P
    stream). ``b_mvs``: optional per-display-frame (fwd, bwd) vector
    pair for B pictures, each (mv_y, mv_x) in half-pels. With B
    pictures the stream is in CODED order (future anchor before its
    Bs); gop must be a multiple of b_frames+1. ``d_pictures`` encodes
    EVERY picture as a D picture (DC-only intra, §2.4.4.1 — the
    fast-forward preview type; the spec allows D only in all-D
    streams, so it excludes b_frames/mvs).

    Returns ``(stream_bytes, reference_frames)`` — reference frames in
    DISPLAY order, the encoder's own reconstruction (decoder
    arithmetic), which decode_m1v must reproduce EXACTLY; tests pin
    that equality."""
    if not frames:
        raise Mpeg1Error("no frames")
    if b_frames and gop % (b_frames + 1):
        raise Mpeg1Error("gop must be a multiple of b_frames+1")
    if d_pictures and (b_frames or mvs or b_mvs):
        raise Mpeg1Error("D-picture streams are all-D (no B/P vectors)")
    h, w = frames[0].shape[:2]
    iq = DEFAULT_INTRA_Q if intra_q is None else np.asarray(intra_q, np.int64)
    nq = (
        DEFAULT_NON_INTRA_Q
        if non_intra_q is None
        else np.asarray(non_intra_q, np.int64)
    )
    mb_w, mb_h = (w + 15) // 16, (h + 15) // 16
    pw, ph = mb_w * 16, mb_h * 16
    f = 1 << (f_code - 1)

    bw = _BitWriter()
    # sequence header
    bw.start_code(SEQ_START)
    bw.write(w, 12)
    bw.write(h, 12)
    bw.write(1, 4)   # pel aspect 1:1
    bw.write(fps_code, 4)
    bw.write(0x3FFFF, 18)  # variable bitrate
    bw.write(1, 1)   # marker
    bw.write(16, 10)  # vbv buffer size
    bw.write(0, 1)   # not constrained
    custom_iq = intra_q is not None
    bw.write(1 if custom_iq else 0, 1)
    if custom_iq:
        flat = iq.flatten()[_ZZ]
        for v in flat:
            bw.write(int(v), 8)
    custom_nq = non_intra_q is not None
    bw.write(1 if custom_nq else 0, 1)
    if custom_nq:
        flat = nq.flatten()[_ZZ]
        for v in flat:
            bw.write(int(v), 8)

    def pad_planes(img) -> _PlaneSet:
        yy, cb, cr = _rgb_to_ycbcr420(img)
        yp = np.pad(yy, ((0, ph - h), (0, pw - w)), mode="edge")
        cbp = np.pad(cb, ((0, ph // 2 - cb.shape[0]), (0, pw // 2 - cb.shape[1])), mode="edge")
        crp = np.pad(cr, ((0, ph // 2 - cr.shape[0]), (0, pw // 2 - cr.shape[1])), mode="edge")
        return _PlaneSet(yp, cbp, crp)

    def mb_blocks(ps: _PlaneSet, my: int, mx: int):
        """The 6 source blocks of MB (my, mx): 4 luma + cb + cr."""
        y0, x0 = my * 16, mx * 16
        return [
            ps.y[y0 : y0 + 8, x0 : x0 + 8],
            ps.y[y0 : y0 + 8, x0 + 8 : x0 + 16],
            ps.y[y0 + 8 : y0 + 16, x0 : x0 + 8],
            ps.y[y0 + 8 : y0 + 16, x0 + 8 : x0 + 16],
            ps.cb[y0 // 2 : y0 // 2 + 8, x0 // 2 : x0 // 2 + 8],
            ps.cr[y0 // 2 : y0 // 2 + 8, x0 // 2 : x0 // 2 + 8],
        ]

    def mc6(ref: _PlaneSet, my: int, mx: int, mv_y: int, mv_x: int):
        """The 6 motion-compensated prediction blocks from ``ref``
        (MV pre-clamped by the caller)."""
        y0, x0 = my * 16, mx * 16
        cy, cx = _chroma_mv(mv_y), _chroma_mv(mv_x)
        return [
            _half_pel_pred(ref.y, y0, x0, mv_y, mv_x, 8, 8),
            _half_pel_pred(ref.y, y0, x0 + 8, mv_y, mv_x, 8, 8),
            _half_pel_pred(ref.y, y0 + 8, x0, mv_y, mv_x, 8, 8),
            _half_pel_pred(ref.y, y0 + 8, x0 + 8, mv_y, mv_x, 8, 8),
            _half_pel_pred(ref.cb, y0 // 2, x0 // 2, cy, cx, 8, 8),
            _half_pel_pred(ref.cr, y0 // 2, x0 // 2, cy, cx, 8, 8),
        ]

    def sad6(blks, preds) -> int:
        return sum(
            int(np.abs(b.astype(np.int32) - p).sum())
            for b, p in zip(blks, preds)
        )

    def encode_picture(src: _PlaneSet, ptype: int, temporal_ref: int,
                       fwd_ref, bwd_ref, mv, mvb) -> _PlaneSet:
        """Emit one picture (header + slices + macroblocks) and return
        its reconstruction. ptype 1=I, 2=P, 3=B."""
        bw.start_code(PIC_START)
        bw.write(temporal_ref % 1024, 10)
        bw.write(ptype, 3)
        bw.write(0xFFFF, 16)  # vbv_delay: variable
        if ptype in (2, 3):
            bw.write(0, 1)  # full_pel_forward_vector = 0 (half-pel units)
            bw.write(f_code, 3)
        if ptype == 3:
            bw.write(0, 1)  # full_pel_backward_vector
            bw.write(f_code, 3)

        rec = _PlaneSet(
            np.zeros((ph, pw), np.uint8),
            np.zeros((ph // 2, pw // 2), np.uint8),
            np.zeros((ph // 2, pw // 2), np.uint8),
        )

        rows_per_slice = max(1, mb_h // max(1, slices_per_picture))
        slice_starts = set(range(0, mb_h, rows_per_slice))

        addr_prev = -1
        pred_dc = [1024, 1024, 1024]
        pred_mv = (0, 0)       # forward predictor
        pred_mv_b = (0, 0)     # backward predictor (B pictures)
        last_b_mode = None     # (use_f, use_b, mvf, mvb) of prev coded MB

        def flush_addr(bwr, addr):
            nonlocal addr_prev
            if mb_stuffing:
                # legal no-op: any number of stuffing codes may precede
                # the increment (decoder must discard them)
                bwr.write_bits(MBA_STUFFING)
            inc = addr - addr_prev
            while inc > 33:
                bwr.write_bits(MBA_ESCAPE)
                inc -= 33
            bwr.write_bits(MBA_CODES[inc])
            addr_prev = addr

        for my in range(mb_h):
            if my in slice_starts:
                bw.start_code(SLICE_MIN + my)
                bw.write(q_scale, 5)
                bw.write(0, 1)  # no extra slice info
                addr_prev = my * mb_w - 1
                pred_dc = [1024, 1024, 1024]
                pred_mv = (0, 0)
                pred_mv_b = (0, 0)
                last_b_mode = None
            for mx in range(mb_w):
                addr = my * mb_w + mx
                blks = mb_blocks(src, my, mx)
                y0, x0 = my * 16, mx * 16

                # --- candidate predictions
                use_intra = ptype == 1
                use_f = use_b = False
                preds = None
                if ptype == 2:
                    mv_y = _clamp_mv(mv[0], y0, ph)
                    mv_x = _clamp_mv(mv[1], x0, pw)
                    preds = mc6(fwd_ref, my, mx, mv_y, mv_x)
                    sad_mc = sad6(blks, preds)
                    sad_intra = sum(
                        int(np.abs(b.astype(np.int32) - 128).sum()) for b in blks
                    )
                    use_intra = sad_intra * 2 < sad_mc
                    use_f = not use_intra
                    cur_mv = (mv_y, mv_x)
                elif ptype == 3:
                    fy = _clamp_mv(mv[0], y0, ph)
                    fx = _clamp_mv(mv[1], x0, pw)
                    by = _clamp_mv(mvb[0], y0, ph)
                    bx = _clamp_mv(mvb[1], x0, pw)
                    pf = mc6(fwd_ref, my, mx, fy, fx)
                    pb = mc6(bwd_ref, my, mx, by, bx)
                    pi = [
                        (a.astype(np.int32) + b_.astype(np.int32) + 1) >> 1
                        for a, b_ in zip(pf, pb)
                    ]
                    cands = [
                        (sad6(blks, pf), True, False, pf),
                        (sad6(blks, pb), False, True, pb),
                        (sad6(blks, pi), True, True, pi),
                    ]
                    best = min(cands, key=lambda c: c[0])
                    sad_intra = sum(
                        int(np.abs(b.astype(np.int32) - 128).sum()) for b in blks
                    )
                    use_intra = sad_intra * 2 < best[0]
                    if not use_intra:
                        _, use_f, use_b, preds = best
                    cur_mv = (fy, fx)
                    cur_mv_b = (by, bx)

                targets = [
                    (0, y0, x0), (1, y0, x0 + 8), (2, y0 + 8, x0),
                    (3, y0 + 8, x0 + 8), (4, y0 // 2, x0 // 2), (5, y0 // 2, x0 // 2),
                ]

                def place(bi, arr):
                    _, py, px = targets[bi]
                    plane = (rec.y, rec.y, rec.y, rec.y, rec.cb, rec.cr)[bi]
                    plane[py : py + 8, px : px + 8] = np.clip(arr, 0, 255).astype(np.uint8)

                if ptype == 4:
                    # D macroblock: type '1', six DC-only blocks, then
                    # the end_of_macroblock bit (§2.4.3.7)
                    flush_addr(bw, addr)
                    bw.write(1, 1)  # macroblock_type: intra, no quant
                    for bi, b in enumerate(blks):
                        comp = 0 if bi < 4 else bi - 3
                        dc = int(np.clip(np.round(b.astype(np.float64).mean()),
                                         0, 255))
                        diff = dc - pred_dc[comp] // 8
                        pred_dc[comp] = dc * 8
                        _emit_dc(bw, diff, luma=bi < 4)
                        place(bi, np.full((8, 8), dc, np.float64))
                    bw.write(1, 1)  # end_of_macroblock
                    continue

                if use_intra:
                    # ----- intra macroblock ('1' in I pictures, B.2b/c
                    # '00011' otherwise)
                    flush_addr(bw, addr)
                    bw.write_bits("1" if ptype == 1 else "00011")
                    levels6 = []
                    for bi, b in enumerate(blks):
                        coef = _dct(b.astype(np.float64))
                        lv = _quant_intra_block(coef, q_scale, iq)
                        levels6.append(lv)
                    # emit with DC prediction
                    for bi, lv in enumerate(levels6):
                        comp = 0 if bi < 4 else bi - 3
                        dc = int(lv[0, 0])
                        diff = dc - pred_dc[comp] // 8
                        pred_dc[comp] = dc * 8
                        _emit_dc(bw, diff, luma=bi < 4)
                        zz = lv.flatten()[_ZZ]
                        _emit_block(bw, zz, intra=True)
                        recb = _recon_intra(lv, q_scale, iq)
                        place(bi, _idct(recb))
                    pred_mv = (0, 0)
                    pred_mv_b = (0, 0)
                    last_b_mode = None
                    continue

                # ----- non-intra: residual against the chosen prediction
                resid_lv = []
                cbp = 0
                for bi, (b, p) in enumerate(zip(blks, preds)):
                    diffb = b.astype(np.float64) - np.asarray(p, np.float64)
                    coef = _dct(diffb)
                    lv = _quant_non_intra_block(coef, q_scale, nq)
                    resid_lv.append(lv)
                    if np.any(lv):
                        cbp |= 1 << (5 - bi)

                if ptype == 2:
                    # skip only when nothing to code and MV is zero;
                    # never first/last MB of a row (so also never
                    # first/last of a slice — slices span whole rows)
                    can_skip = (
                        cbp == 0 and cur_mv == (0, 0)
                        and mx != 0 and mx != mb_w - 1
                    )
                    if can_skip:
                        # skipped MB: recon = co-located previous frame
                        for bi in range(6):
                            place(bi, preds[bi])
                        pred_mv = (0, 0)
                        pred_dc = [1024, 1024, 1024]
                        continue
                    flush_addr(bw, addr)
                    if cbp == 0 and cur_mv == (0, 0):
                        # cbp 0 has no VLC — emit as MC-not-coded, MV(0,0)
                        bw.write_bits("001")  # mc, not coded
                        dy = _wrap_mv(cur_mv[0] - pred_mv[0], f)
                        dx = _wrap_mv(cur_mv[1] - pred_mv[1], f)
                        _emit_motion(bw, dx, f)  # horizontal first
                        _emit_motion(bw, dy, f)
                        pred_mv = cur_mv
                        for bi in range(6):
                            place(bi, preds[bi])
                        pred_dc = [1024, 1024, 1024]
                        continue
                    if cur_mv == (0, 0) and cbp:
                        # no-MC coded (mv implicitly 0)
                        bw.write_bits("01")
                        pred_mv = (0, 0)
                    else:
                        bw.write_bits("1" if cbp else "001")
                        dx = _wrap_mv(cur_mv[1] - pred_mv[1], f)
                        dy = _wrap_mv(cur_mv[0] - pred_mv[0], f)
                        _emit_motion(bw, dx, f)
                        _emit_motion(bw, dy, f)
                        pred_mv = cur_mv
                else:
                    # ----- B macroblock (§2.4.4.3): skip repeats the
                    # previous MB's prediction mode and vectors
                    can_skip = (
                        cbp == 0
                        and last_b_mode == (use_f, use_b, cur_mv, cur_mv_b)
                        and mx != 0 and mx != mb_w - 1
                    )
                    if can_skip:
                        for bi in range(6):
                            place(bi, preds[bi])
                        pred_dc = [1024, 1024, 1024]
                        continue
                    flush_addr(bw, addr)
                    if not use_f and not use_b:
                        raise Mpeg1Error("B macroblock without prediction")
                    key = {
                        (True, False): ("0011", "0010"),
                        (False, True): ("011", "010"),
                        (True, True): ("11", "10"),
                    }[(use_f, use_b)]
                    bw.write_bits(key[0] if cbp else key[1])
                    if use_f:
                        dx = _wrap_mv(cur_mv[1] - pred_mv[1], f)
                        dy = _wrap_mv(cur_mv[0] - pred_mv[0], f)
                        _emit_motion(bw, dx, f)
                        _emit_motion(bw, dy, f)
                        pred_mv = cur_mv
                    if use_b:
                        dx = _wrap_mv(cur_mv_b[1] - pred_mv_b[1], f)
                        dy = _wrap_mv(cur_mv_b[0] - pred_mv_b[0], f)
                        _emit_motion(bw, dx, f)
                        _emit_motion(bw, dy, f)
                        pred_mv_b = cur_mv_b
                    last_b_mode = (use_f, use_b, cur_mv, cur_mv_b)

                if cbp:
                    bw.write_bits(CBP_CODES[cbp])
                    for bi in range(6):
                        if not (cbp >> (5 - bi)) & 1:
                            place(bi, preds[bi])
                            continue
                        lv = resid_lv[bi]
                        zz = lv.flatten()[_ZZ]
                        _emit_block(bw, zz, intra=False)
                        recb = _recon_non_intra(lv, q_scale, nq)
                        place(bi, preds[bi] + _idct(recb))
                else:
                    for bi in range(6):
                        place(bi, preds[bi])
                pred_dc = [1024, 1024, 1024]
        return rec

    # ---- schedule: display → coded order
    n = len(frames)
    m = b_frames + 1
    anchors = [i for i in range(n) if i % m == 0]
    if anchors[-1] != n - 1:
        # trailing frames have no future anchor: promote them to anchors
        anchors += list(range(anchors[-1] + 1, n))
    coded: list[tuple[int, int]] = []  # (display_idx, ptype)
    if d_pictures:
        coded = [(i, 4) for i in range(n)]
    else:
        prev_a = None
        for a in anchors:
            ptype = 1 if a % gop == 0 else 2
            coded.append((a, ptype))
            if prev_a is not None:
                for b_idx in range(prev_a + 1, a):
                    coded.append((b_idx, 3))
            prev_a = a

    def frame_mv(i):
        if mvs is not None and i < len(mvs) and mvs[i] is not None:
            return tuple(mvs[i])
        return (0, 0)

    def frame_bmv(i):
        if b_mvs is not None and i < len(b_mvs) and b_mvs[i] is not None:
            return tuple(b_mvs[i][0]), tuple(b_mvs[i][1])
        return frame_mv(i), (0, 0)

    recon_by_idx: dict[int, np.ndarray] = {}
    recs: dict[int, _PlaneSet] = {}
    prev_anchor_idx = None
    for display_idx, ptype in coded:
        img = frames[display_idx]
        if img.shape[:2] != (h, w):
            raise Mpeg1Error("all frames must share one size")
        src = pad_planes(img)
        if ptype == 1:
            bw.start_code(GOP_START)
            bw.write(0, 25)  # time code
            # later GOPs are open when B pictures lead them (their
            # leading Bs reference the previous GOP's anchor)
            closed = 1 if (display_idx == 0 or not b_frames) else 0
            bw.write(closed, 1)
            bw.write(0, 1)   # broken link
        gop_start = (display_idx // gop) * gop
        tref = display_idx - gop_start
        if ptype == 3:
            fwd = recs[prev_prev_anchor_idx]
            bwd = recs[prev_anchor_idx]
            mv_f, mv_b = frame_bmv(display_idx)
            rec = encode_picture(src, 3, tref, fwd, bwd, mv_f, mv_b)
        elif ptype == 2:
            fwd = recs[prev_anchor_idx]
            rec = encode_picture(src, 2, tref, fwd, None, frame_mv(display_idx), None)
            prev_prev_anchor_idx = prev_anchor_idx
            prev_anchor_idx = display_idx
        elif ptype == 4:
            rec = encode_picture(src, 4, tref, None, None, None, None)
        else:
            rec = encode_picture(src, 1, tref, None, None, None, None)
            prev_prev_anchor_idx = prev_anchor_idx
            prev_anchor_idx = display_idx
        recs[display_idx] = rec
        recon_by_idx[display_idx] = _ycbcr420_to_rgb(
            rec.y[:h, :w],
            rec.cb[: (h + 1) // 2, : (w + 1) // 2],
            rec.cr[: (h + 1) // 2, : (w + 1) // 2],
        )
        # B reconstructions are never referenced again — free them
        if ptype == 3:
            del recs[display_idx]

    bw.start_code(SEQ_END)
    bw.align()
    recon_frames = [recon_by_idx[i] for i in range(n)]
    return bytes(bw.out), recon_frames


def _wrap_mv(diff: int, f: int) -> int:
    """Wrap an MV differential into the codable window [-16f, 16f-1]
    (modular 32f arithmetic, §2.4.4.5 complement logic)."""
    span = 32 * f
    while diff < -16 * f:
        diff += span
    while diff >= 16 * f:
        diff -= span
    return diff


# ---------------------------------------------------------------- decoder


class Mpeg1Info(NamedTuple):
    width: int
    height: int
    fps: float
    n_pictures: int
    duration_ms: int


def _find_start_codes(data: bytes):
    """Yield (offset_of_code_byte, code) for every 00 00 01 xx."""
    pos = 0
    n = len(data)
    while True:
        idx = data.find(b"\x00\x00\x01", pos)
        if idx < 0 or idx + 3 >= n:
            return
        yield idx + 3, data[idx + 3]
        pos = idx + 3


def is_mpeg1(data: bytes) -> bool:
    return data[:4] == b"\x00\x00\x01\xb3"


def video_info(data: bytes) -> Mpeg1Info | None:
    """Sequence-header metadata + picture count (header walk only)."""
    if not is_mpeg1(data) or len(data) < 12:
        return None
    br = _BitReader(data[4:])
    try:
        w = br.read(12)
        h = br.read(12)
        br.read(4)
        rate = PICTURE_RATES.get(br.read(4), 0.0)
    except Mpeg1Error:
        return None
    n_pics = sum(1 for _, c in _find_start_codes(data) if c == PIC_START)
    dur = int(n_pics * 1000 / rate) if rate else 0
    return Mpeg1Info(w, h, rate, n_pics, dur)


def _read_dc(br: _BitReader, luma: bool) -> int:
    size = br.vlc(_DCL_T if luma else _DCC_T, 8, "dct_dc_size")
    if size == 0:
        return 0
    v = br.read(size)
    if v < (1 << (size - 1)):  # negative: offset binary
        v = v - (1 << size) + 1
    return v


def _read_coeff(br: _BitReader, first: bool):
    """→ ('eob',) | (run, level)."""
    if first and br.peek(1) == 1:
        br.read(1)
        sign = br.read(1)
        return (0, -1 if sign else 1)
    v = br.vlc(_DCT_T, 17, "dct_coeff")
    if v == "eob":
        return ("eob",)
    if v == "escape":
        run = br.read(6)
        lv = br.read(8)
        if lv == 0:
            lv = br.read(8)  # +128..255
        elif lv == 128:
            lv = br.read(8) - 256  # -255..-128
        elif lv > 128:
            lv = lv - 256
        return (run, lv)
    run, mag = v
    sign = br.read(1)
    return (run, -mag if sign else mag)


def _read_block(br: _BitReader, intra: bool, dc: int | None) -> np.ndarray:
    """Parse one block's coefficients → 8×8 LEVELS in raster order
    (intra: dc level already resolved by the caller)."""
    lv = np.zeros(64, dtype=np.int64)
    if intra:
        lv[0] = dc
        i = 0  # next coefficient index = i + run + 1
        first = False
    else:
        i = -1  # first coefficient index = run
        first = True
    while True:
        got = _read_coeff(br, first)
        first = False
        if got[0] == "eob":
            break
        run, level = got
        i += run + 1
        if i > 63:
            raise Mpeg1Error("coefficient run overflows block")
        lv[i] = level
    out = np.zeros(64, dtype=np.int64)
    out[_ZZ] = lv  # de-zigzag
    return out.reshape(8, 8)


def _read_mv(br: _BitReader, f: int, pred: int) -> int:
    code = br.vlc(_MOTION_T, 11, "motion_code")
    if code == 0:
        diff = 0
    else:
        sign = br.read(1)
        r_size = (f - 1).bit_length() if f > 1 else 0
        residual = br.read(r_size) if r_size else 0
        diff = (code - 1) * f + 1 + residual
        if sign:
            diff = -diff
    return _wrap_mv_recon(pred, diff, f)


def _wrap_mv_recon(pred: int, diff: int, f: int) -> int:
    """§2.4.4.5: the new vector is pred+diff wrapped into the codable
    window [-16f, 16f-1]."""
    v = pred + diff
    span = 32 * f
    while v < -16 * f:
        v += span
    while v >= 16 * f:
        v -= span
    return v


def decode_m1v(data: bytes, strict: bool = False, max_frames: int = 100_000):
    """Decode an MPEG-1 video elementary stream → (Mpeg1Info, list of
    (h, w, 3) uint8 RGB frames) in DISPLAY order. I, P, and B
    pictures; D pictures raise (fail-closed). Lax mode returns the
    frames decoded before the first error; strict raises
    Mpeg1Error."""
    info = video_info(data)
    if info is None:
        if strict:
            raise Mpeg1Error("not an MPEG-1 video elementary stream")
        return None, []
    w, h = info.width, info.height
    mb_w, mb_h = (w + 15) // 16, (h + 15) // 16
    pw, ph = mb_w * 16, mb_h * 16

    iq = DEFAULT_INTRA_Q.copy()
    nq = DEFAULT_NON_INTRA_Q.copy()
    # parse the rest of the sequence header for custom matrices
    br = _BitReader(data[4:])
    br.read(12 + 12 + 4 + 4 + 18 + 1 + 10 + 1)
    try:
        if br.read(1):
            flat = np.array([br.read(8) for _ in range(64)], dtype=np.int64)
            m = np.zeros(64, dtype=np.int64)
            m[_ZZ] = flat
            iq = m.reshape(8, 8)
        if br.read(1):
            flat = np.array([br.read(8) for _ in range(64)], dtype=np.int64)
            m = np.zeros(64, dtype=np.int64)
            m[_ZZ] = flat
            nq = m.reshape(8, 8)
    except Mpeg1Error:
        if strict:
            raise
        return info, []

    frames: list = []
    ref: _PlaneSet | None = None        # most recent anchor (future ref)
    prev_ref: _PlaneSet | None = None   # anchor before it (past ref)
    pending_anchor = None               # display reordering buffer

    codes = list(_find_start_codes(data))
    # group: picture start → its slices (until next picture/sequence code)
    pic_spans = []
    for i, (off, c) in enumerate(codes):
        if c == PIC_START:
            pic_spans.append((i, off))

    def decode_picture(ci: int) -> _PlaneSet:
        nonlocal ref
        off = codes[ci][0]
        pbr = _BitReader(data[off + 1 :])
        pbr.read(10)  # temporal reference
        ptype = pbr.read(3)
        if ptype not in (1, 2, 3, 4):
            raise Mpeg1Error(f"reserved picture_coding_type {ptype} (B/D)")
        if ptype == 2 and ref is None:
            raise Mpeg1Error("P picture before any I picture")
        if ptype == 3 and (ref is None or prev_ref is None):
            raise Mpeg1Error("B picture before two reference pictures")
        pbr.read(16)  # vbv_delay
        full_pel = f = 0
        full_pel_b = fb = 0
        if ptype in (2, 3):
            full_pel = pbr.read(1)
            f_code = pbr.read(3)
            if not 1 <= f_code <= 7:
                raise Mpeg1Error(f"bad forward_f_code {f_code}")
            f = 1 << (f_code - 1)
        if ptype == 3:
            full_pel_b = pbr.read(1)
            fb_code = pbr.read(3)
            if not 1 <= fb_code <= 7:
                raise Mpeg1Error(f"bad backward_f_code {fb_code}")
            fb = 1 << (fb_code - 1)
        # B pictures: forward ref = past anchor, backward ref = the
        # future anchor (most recently decoded, precedes Bs in coded
        # order)
        fwd_ref = prev_ref if ptype == 3 else ref
        bwd_ref = ref

        rec = _PlaneSet(
            np.zeros((ph, pw), np.uint8),
            np.zeros((ph // 2, pw // 2), np.uint8),
            np.zeros((ph // 2, pw // 2), np.uint8),
        )
        decoded = np.zeros(mb_w * mb_h, dtype=bool)

        # iterate this picture's slices
        si = ci + 1
        while si < len(codes) and SLICE_MIN <= codes[si][1] <= SLICE_MAX:
            s_off, s_code = codes[si]
            sbr = _BitReader(data[s_off + 1 :])
            q_scale = sbr.read(5)
            if not q_scale:
                raise Mpeg1Error("quantizer_scale 0")
            while sbr.read(1):
                sbr.read(8)  # extra slice information
            mb_row0 = s_code - 1
            addr = mb_row0 * mb_w - 1
            pred_dc = [1024, 1024, 1024]
            pred_mv = [0, 0]
            pred_mv_b = [0, 0]
            last_b_mode = None  # (has_f, has_b, mvf, mvb) of prev MB

            def place(bi, my, mx, arr):
                y0, x0 = my * 16, mx * 16
                if bi < 4:
                    py = y0 + (8 if bi >= 2 else 0)
                    px = x0 + (8 if bi % 2 else 0)
                    rec.y[py : py + 8, px : px + 8] = np.clip(arr, 0, 255).astype(np.uint8)
                else:
                    plane = rec.cb if bi == 4 else rec.cr
                    plane[y0 // 2 : y0 // 2 + 8, x0 // 2 : x0 // 2 + 8] = np.clip(
                        arr, 0, 255
                    ).astype(np.uint8)

            def mc_pred(my, mx, mv_y, mv_x, src=None):
                src = fwd_ref if src is None else src
                y0, x0 = my * 16, mx * 16
                mv_y = _clamp_mv(mv_y, y0, ph)
                mv_x = _clamp_mv(mv_x, x0, pw)
                cy, cx = _chroma_mv(mv_y), _chroma_mv(mv_x)
                return [
                    _half_pel_pred(src.y, y0, x0, mv_y, mv_x, 8, 8),
                    _half_pel_pred(src.y, y0, x0 + 8, mv_y, mv_x, 8, 8),
                    _half_pel_pred(src.y, y0 + 8, x0, mv_y, mv_x, 8, 8),
                    _half_pel_pred(src.y, y0 + 8, x0 + 8, mv_y, mv_x, 8, 8),
                    _half_pel_pred(src.cb, y0 // 2, x0 // 2, cy, cx, 8, 8),
                    _half_pel_pred(src.cr, y0 // 2, x0 // 2, cy, cx, 8, 8),
                ]

            def combined_pred(my, mx, has_f, has_b, mvf, mvb):
                """fwd / bwd / interpolated prediction (§2.4.4.3);
                interp averages with upward rounding."""
                pf = mc_pred(my, mx, mvf[0], mvf[1]) if has_f else None
                pb = (
                    mc_pred(my, mx, mvb[0], mvb[1], src=bwd_ref)
                    if has_b
                    else None
                )
                if has_f and has_b:
                    return [
                        (a.astype(np.int32) + b.astype(np.int32) + 1) >> 1
                        for a, b in zip(pf, pb)
                    ]
                return pf if has_f else pb

            # macroblock loop until the slice's bits run out (next
            # start code boundary)
            end_bit = (codes[si + 1][0] - 3 - (s_off + 1)) * 8 if si + 1 < len(codes) else len(data[s_off + 1 :]) * 8
            while True:
                # stop when only alignment padding remains
                if end_bit - sbr.bitpos < 11 and (
                    end_bit <= sbr.bitpos
                    or sbr.peek(min(11, end_bit - sbr.bitpos)) == 0
                ):
                    break
                inc = 0
                while True:
                    got = sbr.vlc(_MBA_T, 11, "mb_address")
                    if got == "stuffing":
                        continue
                    if got == "escape":
                        inc += 33
                        continue
                    inc += got
                    break
                prev_addr = addr
                addr += inc
                if addr >= mb_w * mb_h:
                    raise Mpeg1Error("macroblock address out of range")
                # skipped macroblocks: P = zero-MV copy of the
                # reference; B = repeat the previous MB's prediction
                # mode and vectors (§2.4.4.4)
                for sk in range(prev_addr + 1, addr):
                    if sk < 0:
                        continue
                    my, mx = divmod(sk, mb_w)
                    if ptype in (1, 4):
                        raise Mpeg1Error("skipped macroblock in I/D picture")
                    if ptype == 3:
                        if last_b_mode is None:
                            raise Mpeg1Error(
                                "skipped B macroblock with no previous "
                                "prediction to repeat"
                            )
                        arrs = combined_pred(my, mx, *last_b_mode)
                    else:
                        arrs = mc_pred(my, mx, 0, 0)
                        pred_mv = [0, 0]
                    for bi, arr in enumerate(arrs):
                        place(bi, my, mx, arr)
                    decoded[sk] = True
                    pred_dc = [1024, 1024, 1024]
                my, mx = divmod(addr, mb_w)
                if ptype == 4:
                    # D macroblock: 1-bit type, six DC-only blocks,
                    # end_of_macroblock bit (§2.4.3.7)
                    if sbr.read(1) != 1:
                        raise Mpeg1Error("bad D-picture macroblock_type")
                    for bi in range(6):
                        comp = 0 if bi < 4 else bi - 3
                        dc_diff = _read_dc(sbr, luma=bi < 4)
                        dc = pred_dc[comp] // 8 + dc_diff
                        pred_dc[comp] = dc * 8
                        place(bi, my, mx, np.full((8, 8), dc, np.int32))
                    if sbr.read(1) != 1:
                        raise Mpeg1Error("missing end_of_macroblock in D picture")
                    decoded[addr] = True
                    continue
                mb = None  # backward motion flag only exists in B
                if ptype == 1:
                    quant, mf, coded, intra = sbr.vlc(_MBTYPE_I_T, 6, "mb_type")
                elif ptype == 2:
                    quant, mf, coded, intra = sbr.vlc(_MBTYPE_P_T, 6, "mb_type")
                else:
                    quant, mf, mb, coded, intra = sbr.vlc(
                        _MBTYPE_B_T, 6, "mb_type"
                    )
                if quant:
                    q_scale = sbr.read(5)
                    if not q_scale:
                        raise Mpeg1Error("quantizer_scale 0")
                mv_y = mv_x = 0
                if mf:
                    mv_x = _read_mv(sbr, f, pred_mv[1])
                    mv_y = _read_mv(sbr, f, pred_mv[0])
                    if full_pel:
                        mv_x *= 2
                        mv_y *= 2
                    pred_mv = [mv_y, mv_x]
                elif not intra and ptype == 2:
                    pred_mv = [0, 0]
                mvb_y = mvb_x = 0
                if mb:
                    mvb_x = _read_mv(sbr, fb, pred_mv_b[1])
                    mvb_y = _read_mv(sbr, fb, pred_mv_b[0])
                    if full_pel_b:
                        mvb_x *= 2
                        mvb_y *= 2
                    pred_mv_b = [mvb_y, mvb_x]

                if intra:
                    pred_mv = [0, 0]
                    pred_mv_b = [0, 0]
                    last_b_mode = None
                    for bi in range(6):
                        comp = 0 if bi < 4 else bi - 3
                        dc_diff = _read_dc(sbr, luma=bi < 4)
                        dc = pred_dc[comp] // 8 + dc_diff
                        pred_dc[comp] = dc * 8
                        levels = _read_block(sbr, intra=True, dc=dc)
                        recb = _recon_intra(levels, q_scale, iq)
                        place(bi, my, mx, _idct(recb))
                else:
                    pred_dc = [1024, 1024, 1024]
                    if ptype == 3:
                        if not mf and not mb:
                            raise Mpeg1Error("B macroblock without prediction")
                        last_b_mode = (
                            bool(mf), bool(mb),
                            (mv_y, mv_x), (mvb_y, mvb_x),
                        )
                        preds = combined_pred(my, mx, *last_b_mode)
                    else:
                        preds = mc_pred(my, mx, mv_y, mv_x)
                    cbp = sbr.vlc(_CBP_T, 9, "coded_block_pattern") if coded else 0
                    for bi in range(6):
                        if (cbp >> (5 - bi)) & 1:
                            levels = _read_block(sbr, intra=False, dc=None)
                            recb = _recon_non_intra(levels, q_scale, nq)
                            place(bi, my, mx, preds[bi] + _idct(recb))
                        else:
                            place(bi, my, mx, preds[bi])
                decoded[addr] = True
            si += 1

        if ptype == 1 and not decoded.all():
            raise Mpeg1Error("I picture left undecoded macroblocks")
        return rec, si, ptype

    def to_rgb(rec: _PlaneSet):
        return _ycbcr420_to_rgb(
            rec.y[:h, :w],
            rec.cb[: (h + 1) // 2, : (w + 1) // 2],
            rec.cr[: (h + 1) // 2, : (w + 1) // 2],
        )

    try:
        idx = 0
        while idx < len(codes) and len(frames) < max_frames:
            off, c = codes[idx]
            if c == PIC_START:
                rec, idx, pt = decode_picture(idx)
                if pt in (3, 4):
                    # B pictures display immediately (their anchors are
                    # already decoded); D pictures are standalone
                    # previews — neither is ever a reference frame
                    frames.append(to_rgb(rec))
                else:
                    # anchors display delayed: an anchor is emitted when
                    # the NEXT anchor arrives (the Bs between them come
                    # first in display order)
                    if pending_anchor is not None:
                        frames.append(pending_anchor)
                    pending_anchor = to_rgb(rec)
                    prev_ref = ref
                    ref = rec
            else:
                idx += 1
        if pending_anchor is not None and len(frames) < max_frames:
            frames.append(pending_anchor)
            pending_anchor = None
    except Mpeg1Error:
        if strict:
            raise
        if pending_anchor is not None and len(frames) < max_frames:
            frames.append(pending_anchor)  # lax: flush what completed
    return info, frames
