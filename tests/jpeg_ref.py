"""Minimal baseline-JPEG ENCODER (test fixture only — the product ships
a decoder, mediadecode.decode_jpeg_pixels; this reference encoder gives
round-trip ground truth without shipping golden binaries).

Scope: 8-bit baseline (SOF0), grayscale or YCbCr 4:4:4 / 4:2:0,
near-lossless all-ones quantization so round-trip error is DCT rounding
only, optional restart intervals. Huffman tables are a valid canonical
layout (symbols 0-127 at 8 bits, 128-255 at 9 bits) rather than the
Annex K defaults — simpler to construct, and it exercises the decoder's
generic DHT handling instead of a hard-coded table."""

from __future__ import annotations

import struct

import numpy as np

from ai_tutor_based_on_rag_using_lanchain_and_vectordb_spark.sources.mediadecode import (
    _JPEG_ZIGZAG,
    _jpeg_idct_matrix,
)

# canonical code for symbol s: 8 bits for 0-127, 9 bits (256+s-128) after
_HUFF_COUNTS = bytes([0] * 7 + [128, 128] + [0] * 7)
_HUFF_SYMBOLS = bytes(range(256))


def _code(sym: int) -> tuple[int, int]:
    return (8, sym) if sym < 128 else (9, 256 + sym - 128)


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
            byte = (self.acc >> self.n) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:  # byte stuffing
                self.out.append(0x00)

    def flush(self) -> None:
        if self.n:
            self.write((1 << (8 - self.n)) - 1, 8 - self.n)  # pad with 1s


def _category(v: int) -> int:
    return int(v).bit_length() if v > 0 else int(-v).bit_length()


def _emit_coeff(bw: _BitWriter, v: int, t: int) -> None:
    if t:
        bw.write(v if v >= 0 else v + (1 << t) - 1, t)


_T_MAT = _jpeg_idct_matrix()


def _encode_block(bw: _BitWriter, block: np.ndarray, pred: int) -> int:
    """block: 8x8 spatial uint8/int. Returns the new DC predictor."""
    coeff = _T_MAT @ (block.astype(np.float64) - 128.0) @ _T_MAT.T
    q = np.round(coeff).astype(np.int64).reshape(64)[_JPEG_ZIGZAG]
    dc = int(q[0])
    diff = dc - pred
    t = _category(diff)
    bw.write(*reversed(_code(t)))
    _emit_coeff(bw, diff, t)
    run = 0
    for k in range(1, 64):
        v = int(q[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            bw.write(*reversed(_code(0xF0)))  # ZRL
            run -= 16
        s = _category(v)
        bw.write(*reversed(_code((run << 4) | s)))
        _emit_coeff(bw, v, s)
        run = 0
    if run:
        bw.write(*reversed(_code(0x00)))  # EOB
    return dc


def _seg(marker: int, body: bytes) -> bytes:
    return struct.pack(">BBH", 0xFF, marker, len(body) + 2) + body


def _plane_blocks(plane: np.ndarray, bw_blocks: int, bh_blocks: int) -> np.ndarray:
    """Pad a plane to (bh_blocks*8, bw_blocks*8) by edge replication and
    return the (bh*bw, 8, 8) block array in raster order."""
    h, w = plane.shape
    padded = np.pad(
        plane, ((0, bh_blocks * 8 - h), (0, bw_blocks * 8 - w)), mode="edge"
    )
    return (
        padded.reshape(bh_blocks, 8, bw_blocks, 8)
        .transpose(0, 2, 1, 3)
        .reshape(-1, 8, 8)
    )


def encode_jpeg(
    img: np.ndarray, subsample: bool = False, restart_interval: int = 0
) -> bytes:
    """img: (h, w) grayscale or (h, w, 3) RGB uint8. ``subsample=True``
    writes 4:2:0 (chroma averaged 2x2); else 4:4:4 / single-component."""
    gray = img.ndim == 2
    h, w = img.shape[:2]
    if gray:
        planes = [img.astype(np.float64)]
        samplings = [(1, 1)]
    else:
        rgb = img.astype(np.float64)
        r, g, b = rgb[:, :, 0], rgb[:, :, 1], rgb[:, :, 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = 128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b
        cr = 128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b
        if subsample:
            pad_h, pad_w = (h + 1) & ~1, (w + 1) & ~1
            def down(p):
                p = np.pad(p, ((0, pad_h - h), (0, pad_w - w)), mode="edge")
                return (
                    p.reshape(pad_h // 2, 2, pad_w // 2, 2).mean(axis=(1, 3))
                )
            planes = [y, down(cb), down(cr)]
            samplings = [(2, 2), (1, 1), (1, 1)]
        else:
            planes = [y, cb, cr]
            samplings = [(1, 1), (1, 1), (1, 1)]
    planes = [np.clip(np.round(p), 0, 255) for p in planes]

    hmax = max(s[0] for s in samplings)
    vmax = max(s[1] for s in samplings)
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))

    blocks = []  # per component: (blocks_array, blocks_per_row)
    for p, (hi, vi) in zip(planes, samplings):
        bw_blocks, bh_blocks = mcus_x * hi, mcus_y * vi
        blocks.append((_plane_blocks(p, bw_blocks, bh_blocks), bw_blocks))

    out = bytearray(b"\xff\xd8")  # SOI
    out += _seg(0xDB, bytes([0x00]) + bytes([1] * 64))  # DQT 0: all ones
    sof = bytearray(struct.pack(">BHHB", 8, h, w, len(planes)))
    for ci, (hi, vi) in enumerate(samplings):
        sof += bytes([ci + 1, (hi << 4) | vi, 0])
    out += _seg(0xC0, bytes(sof))
    out += _seg(0xC4, bytes([0x00]) + _HUFF_COUNTS + _HUFF_SYMBOLS)  # DC 0
    out += _seg(0xC4, bytes([0x10]) + _HUFF_COUNTS + _HUFF_SYMBOLS)  # AC 0
    if restart_interval:
        out += _seg(0xDD, struct.pack(">H", restart_interval))
    sos = bytearray([len(planes)])
    for ci in range(len(planes)):
        sos += bytes([ci + 1, 0x00])
    sos += bytes([0, 63, 0])
    out += _seg(0xDA, bytes(sos))

    bw = _BitWriter()
    pred = [0] * len(planes)
    rst = 0
    since_restart = 0
    for mcu in range(mcus_x * mcus_y):
        if restart_interval and since_restart == restart_interval:
            bw.flush()
            out += bw.out
            out += bytes([0xFF, 0xD0 + (rst % 8)])
            rst += 1
            bw = _BitWriter()
            pred = [0] * len(planes)
            since_restart = 0
        my, mx = divmod(mcu, mcus_x)
        for ci, (hi, vi) in enumerate(samplings):
            arr, bw_blocks = blocks[ci]
            for by in range(vi):
                for bx in range(hi):
                    idx = (my * vi + by) * bw_blocks + (mx * hi + bx)
                    pred[ci] = _encode_block(bw, arr[idx], pred[ci])
        since_restart += 1
    bw.flush()
    out += bw.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)
