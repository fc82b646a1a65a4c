"""Minimal JPEG ENCODER — the payload synthesizer behind the engine's
media self-check gates (plans/pipeline.multimodal_gate builds MJPEG
frames in-engine with it) and the round-trip ground truth for the
decoder tests (no golden binaries in the repo).

Scope: 8-bit baseline (SOF0), progressive (SOF2, four-stage scan
script with successive approximation), or sequential ARITHMETIC
(SOF9, QM coder per T.81 Annex D/F via sources/arithcode.py, DAC
conditioning at spec defaults), grayscale / YCbCr 4:4:4 /
4:2:0 / CMYK-YCCK (APP14), LOSSLESS (SOF3, all predictors, 2-16 bit,
restarts) and two-level HIERARCHICAL pyramids (DHP + EXP + SOF5
differential, grayscale or YCbCr), near-lossless all-ones quantization
so round-trip error is DCT rounding only, optional restart intervals.
Huffman tables are a valid canonical layout (symbols 0-127 at 8 bits,
128-255 at 9 bits) rather than the Annex K defaults — simpler to
construct, and it exercises the decoder's generic DHT handling instead
of a hard-coded table."""

from __future__ import annotations

import struct

import numpy as np

from .mediadecode import _JPEG_ZIGZAG, _jpeg_idct_matrix

# canonical code for symbol s: 8 bits for 0-127, 9 bits (256+s-128) after
_HUFF_COUNTS = bytes([0] * 7 + [128, 128] + [0] * 7)
_HUFF_SYMBOLS = bytes(range(256))
# DC-class tables list ONLY the 16 DCT category symbols (0..15):
# strict decoders (system libjpeg) reject DC tables defining symbols
# above 15. All 16 get length-8 canonical codes, i.e. code == symbol —
# exactly what _code() emits — so the entropy bitstream is unchanged.
# (The lossless SOF3 encoder keeps its own 17-symbol table for SSSS=16;
# strict-decoder interop there is moot — libjpeg has no lossless mode.)
_HUFF_DC_COUNTS = bytes([0] * 7 + [16] + [0] * 8)
_HUFF_DC_SYMBOLS = bytes(range(16))


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


def _encode_block(
    bw: _BitWriter, block: np.ndarray, pred: int, shift: float = 128.0
) -> int:
    """block: 8x8 spatial uint8/int. Returns the new DC predictor.
    ``shift=0`` codes difference images (hierarchical SOF5 frames)."""
    coeff = _T_MAT @ (block.astype(np.float64) - shift) @ _T_MAT.T
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


def _quantize_block(block: np.ndarray) -> np.ndarray:
    """8x8 spatial -> 64 quantized (all-ones table) coefficients in
    zigzag order."""
    coeff = _T_MAT @ (block.astype(np.float64) - 128.0) @ _T_MAT.T
    return np.round(coeff).astype(np.int64).reshape(64)[_JPEG_ZIGZAG]


def _emit_symbol(bw: _BitWriter, sym: int) -> None:
    bw.write(*reversed(_code(sym)))


def _flush_eobrun(bw: _BitWriter, eobrun: int) -> int:
    """Emit an EOBn symbol covering ``eobrun`` blocks (T.81 G.1.2.2)."""
    if eobrun:
        r = eobrun.bit_length() - 1
        _emit_symbol(bw, r << 4)
        if r:
            bw.write(eobrun - (1 << r), r)
    return 0


def _encode_ac_first(bw: _BitWriter, blocks, al: int) -> None:
    """Progressive first AC pass (band 1..63, point transform ``al``)
    with EOB-run accumulation across blocks."""
    eobrun = 0
    for q in blocks:
        v = [int(q[k]) // 2**al if q[k] >= 0 else -((-int(q[k])) // 2**al)
             for k in range(64)]
        nz = [k for k in range(1, 64) if v[k]]
        if not nz:
            eobrun += 1
            if eobrun == 0x7FFF:
                eobrun = _flush_eobrun(bw, eobrun)
            continue
        eobrun = _flush_eobrun(bw, eobrun)
        run = 0
        for k in range(1, nz[-1] + 1):
            if v[k] == 0:
                run += 1
                continue
            while run > 15:
                _emit_symbol(bw, 0xF0)  # ZRL
                run -= 16
            s = _category(v[k])
            _emit_symbol(bw, (run << 4) | s)
            _emit_coeff(bw, v[k], s)
            run = 0
        if nz[-1] < 63:
            eobrun += 1
    _flush_eobrun(bw, eobrun)


def _encode_ac_refine(bw: _BitWriter, blocks, al: int) -> None:
    """Progressive AC refinement (Ah = al+1 -> Al = al): newly
    significant coefficients as run+size-1 symbols, correction bits for
    already-significant ones emitted span-exactly in decoder read
    order. EOB0 terminates every block (a legal degenerate EOB run), so
    no cross-block correction buffering is needed."""
    for q in blocks:
        # history: the value the decoder holds after the Ah pass
        events = []  # since last symbol: ("c", bit) | "z"
        run = 0
        for k in range(1, 64):
            val = int(q[k])
            prior = val // 2 ** (al + 1) if val >= 0 else -((-val) // 2 ** (al + 1))
            if prior != 0:
                events.append(("c", (abs(val) >> al) & 1))
            elif (abs(val) >> al) == 0:
                run += 1
                events.append("z")
            else:  # newly significant (must be ±1<<al)
                while run > 15:
                    _emit_symbol(bw, 0xF0)  # ZRL spans 16 zero-history slots
                    seen_z = 0
                    while events and seen_z < 16:
                        ev = events.pop(0)
                        if ev == "z":
                            seen_z += 1
                        else:
                            bw.write(ev[1], 1)
                    run -= 16
                _emit_symbol(bw, (run << 4) | 1)
                bw.write(1 if val > 0 else 0, 1)
                for ev in events:
                    if ev != "z":
                        bw.write(ev[1], 1)
                events = []
                run = 0
        # close the block: EOB0 + corrections for the rest of the band
        _emit_symbol(bw, 0x00)
        for ev in events:
            if ev != "z":
                bw.write(ev[1], 1)


def encode_jpeg(
    img: np.ndarray,
    subsample: bool = False,
    restart_interval: int = 0,
    progressive: bool = False,
    ycck: bool = False,
    arithmetic: bool = False,
) -> bytes:
    """img: (h, w) grayscale, (h, w, 3) RGB, or (h, w, 4) CMYK uint8.
    ``subsample=True`` writes 4:2:0 (chroma averaged 2x2, 3-comp only);
    else 4:4:4 / single-component. 4-component input emits the Adobe
    APP14 marker — transform 0 (direct CMYK) or, with ``ycck=True``,
    transform 2 (first three planes rotated through RGB→YCbCr).
    ``progressive=True`` writes SOF2 with a four-stage scan script —
    DC first at Al=1, DC refinement, per-component AC first at Al=1,
    per-component AC refinement — exercising spectral selection,
    successive approximation and EOB runs. ``arithmetic=True`` writes
    arithmetic entropy coding (QM coder per T.81 Annexes D/F/G,
    sources/arithcode.py) with a DAC conditioning segment at the spec
    defaults (L=0, U=1, Kx=5): SOF9 (extended sequential) alone, or —
    combined with ``progressive`` — SOF10 with the SAME four-stage
    scan script (every scan re-inits the coder and statistics)."""
    gray = img.ndim == 2
    cmyk = img.ndim == 3 and img.shape[2] == 4
    h, w = img.shape[:2]
    if gray:
        planes = [img.astype(np.float64)]
        samplings = [(1, 1)]
    elif cmyk:
        comps = img.astype(np.float64)
        if ycck:  # rotate the first three planes through RGB→YCbCr
            c0, c1, c2 = comps[:, :, 0], comps[:, :, 1], comps[:, :, 2]
            yy = 0.299 * c0 + 0.587 * c1 + 0.114 * c2
            cb = 128.0 - 0.168736 * c0 - 0.331264 * c1 + 0.5 * c2
            cr = 128.0 + 0.5 * c0 - 0.418688 * c1 - 0.081312 * c2
            planes = [yy, cb, cr, comps[:, :, 3]]
        else:
            planes = [comps[:, :, i] for i in range(4)]
        samplings = [(1, 1)] * 4
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
    if cmyk:  # APP14 Adobe marker carries the color-transform flag
        out += _seg(
            0xEE,
            b"Adobe" + bytes([0, 100]) + bytes(4) + bytes([2 if ycck else 0]),
        )
    out += _seg(0xDB, bytes([0x00]) + bytes([1] * 64))  # DQT 0: all ones
    sof = bytearray(struct.pack(">BHHB", 8, h, w, len(planes)))
    for ci, (hi, vi) in enumerate(samplings):
        sof += bytes([ci + 1, (hi << 4) | vi, 0])
    if arithmetic:
        sof_marker = 0xCA if progressive else 0xC9
    else:
        sof_marker = 0xC2 if progressive else 0xC0
    out += _seg(sof_marker, bytes(sof))
    if arithmetic:
        # DAC: DC table 0 conditioning (U<<4)|L = 0x10, AC table 0 Kx=5
        out += _seg(0xCC, bytes([0x00, 0x10, 0x10, 0x05]))
    else:
        out += _seg(0xC4, bytes([0x00]) + _HUFF_DC_COUNTS + _HUFF_DC_SYMBOLS)  # DC 0
        out += _seg(0xC4, bytes([0x10]) + _HUFF_COUNTS + _HUFF_SYMBOLS)  # AC 0

    if arithmetic and progressive:
        from . import arithcode as ARC

        qblocks = [
            [_quantize_block(b) for b in arr] for arr, _ in blocks
        ]

        def sos_header(comp_ids, ss, se, ah, al):
            hdr = bytearray([len(comp_ids)])
            for cid in comp_ids:
                hdr += bytes([cid + 1, 0x00])
            hdr += bytes([ss, se, (ah << 4) | al])
            return _seg(0xDA, bytes(hdr))

        def mcu_blocks():
            for mcu in range(mcus_x * mcus_y):
                my, mx = divmod(mcu, mcus_x)
                for ci, (hi, vi) in enumerate(samplings):
                    bwb = blocks[ci][1]
                    for by in range(vi):
                        for bx in range(hi):
                            yield ci, qblocks[ci][
                                (my * vi + by) * bwb + (mx * hi + bx)
                            ]

        all_ids = list(range(len(planes)))
        # scan 1: DC first, interleaved, Al=1 (floor-shift transform,
        # predictors tracked in the shifted domain)
        out += sos_header(all_ids, 0, 0, 0, 1)
        enc = ARC.ArithEncoder()
        dstats = bytearray(ARC.DC_STAT_BINS)
        dctx, pred = [0] * len(planes), [0] * len(planes)
        for ci, q in mcu_blocks():
            v = int(q[0]) >> 1
            ARC.encode_dc(enc, dstats, dctx, ci, v - pred[ci], 0, 1)
            pred[ci] = v
        out += enc.finish()
        # scan 2: DC refinement — one fixed-bin bit per block
        out += sos_header(all_ids, 0, 0, 1, 0)
        enc = ARC.ArithEncoder()
        fixed = bytearray([ARC.FIXED_BIN])
        for _ci, q in mcu_blocks():
            ARC.encode_dc_refine(enc, fixed, int(q[0]) & 1)
        out += enc.finish()
        # per component: AC first (Al=1) then AC refinement, walking
        # the TRUE block grid (non-interleaved scans)
        for ci, (hi, vi) in enumerate(samplings):
            bwb = blocks[ci][1]
            comp_w = -(-(w * hi) // hmax)
            comp_h = -(-(h * vi) // vmax)
            cbw, cbh = -(-comp_w // 8), -(-comp_h // 8)
            order = [
                qblocks[ci][by * bwb + bx]
                for by in range(cbh)
                for bx in range(cbw)
            ]
            out += sos_header([ci], 1, 63, 0, 1)
            enc = ARC.ArithEncoder()
            astats = bytearray(ARC.AC_STAT_BINS)
            fixed = bytearray([ARC.FIXED_BIN])
            for q in order:
                # AC point transform truncates toward zero (T.81 G.1.2.1)
                shifted = [
                    int(q[k]) // 2 if q[k] >= 0 else -((-int(q[k])) // 2)
                    for k in range(64)
                ]
                ARC.encode_ac(enc, astats, fixed, shifted, 5, ss=1, se=63)
            out += enc.finish()
            out += sos_header([ci], 1, 63, 1, 0)
            enc = ARC.ArithEncoder()
            astats = bytearray(ARC.AC_STAT_BINS)
            fixed = bytearray([ARC.FIXED_BIN])
            for q in order:
                full = [int(q[k]) for k in range(64)]
                # what the decoder holds after the Al=1 pass, at full
                # scale: trunc(v/2) * 2 with sign
                prev = [
                    (v // 2 if v >= 0 else -((-v) // 2)) * 2 for v in full
                ]
                ARC.encode_ac_refine(
                    enc, astats, fixed, prev, full, 1, 63, 0
                )
            out += enc.finish()
        out += b"\xff\xd9"
        return bytes(out)

    if arithmetic:
        from . import arithcode as ARC

        if restart_interval:
            out += _seg(0xDD, struct.pack(">H", restart_interval))
        sos = bytearray([len(planes)])
        for ci in range(len(planes)):
            sos += bytes([ci + 1, 0x00])
        sos += bytes([0, 63, 0])
        out += _seg(0xDA, bytes(sos))

        def fresh_state():
            return (
                ARC.ArithEncoder(),
                bytearray(ARC.DC_STAT_BINS),
                bytearray(ARC.AC_STAT_BINS),
                bytearray([ARC.FIXED_BIN]),
                [0] * len(planes),  # DC conditioning category per comp
                [0] * len(planes),  # DC predictor per comp
            )

        enc, dstats, astats, fixed, dctx, pred = fresh_state()
        rst = 0
        since_restart = 0
        for mcu in range(mcus_x * mcus_y):
            if restart_interval and since_restart == restart_interval:
                out += enc.finish()
                out += bytes([0xFF, 0xD0 + (rst % 8)])
                rst += 1
                enc, dstats, astats, fixed, dctx, pred = fresh_state()
                since_restart = 0
            my, mx = divmod(mcu, mcus_x)
            for ci, (hi, vi) in enumerate(samplings):
                arr, bwb = blocks[ci]
                for by in range(vi):
                    for bx in range(hi):
                        idx = (my * vi + by) * bwb + (mx * hi + bx)
                        q = _quantize_block(arr[idx])
                        dc = int(q[0])
                        ARC.encode_dc(
                            enc, dstats, dctx, ci, dc - pred[ci], 0, 1
                        )
                        pred[ci] = dc
                        ARC.encode_ac(enc, astats, fixed, q, 5)
            since_restart += 1
        out += enc.finish()
        out += b"\xff\xd9"
        return bytes(out)

    if progressive:
        qblocks = [
            [_quantize_block(b) for b in arr] for arr, _ in blocks
        ]

        def sos_header(comp_ids, ss, se, ah, al):
            hdr = bytearray([len(comp_ids)])
            for cid in comp_ids:
                hdr += bytes([cid + 1, 0x00])
            hdr += bytes([ss, se, (ah << 4) | al])
            return _seg(0xDA, bytes(hdr))

        all_ids = list(range(len(planes)))
        # scan 1: DC first, interleaved, Al=1 (arithmetic-shift transform)
        out += sos_header(all_ids, 0, 0, 0, 1)
        bw = _BitWriter()
        pred = [0] * len(planes)
        for mcu in range(mcus_x * mcus_y):
            my, mx = divmod(mcu, mcus_x)
            for ci, (hi, vi) in enumerate(samplings):
                bwb = blocks[ci][1]
                for by in range(vi):
                    for bx in range(hi):
                        dc = int(qblocks[ci][(my * vi + by) * bwb + (mx * hi + bx)][0])
                        v = dc >> 1
                        diff = v - pred[ci]
                        pred[ci] = v
                        t = _category(diff)
                        _emit_symbol(bw, t)
                        _emit_coeff(bw, diff, t)
        bw.flush()
        out += bw.out
        # scan 2: DC refinement (one raw bit per block, same order)
        out += sos_header(all_ids, 0, 0, 1, 0)
        bw = _BitWriter()
        for mcu in range(mcus_x * mcus_y):
            my, mx = divmod(mcu, mcus_x)
            for ci, (hi, vi) in enumerate(samplings):
                bwb = blocks[ci][1]
                for by in range(vi):
                    for bx in range(hi):
                        dc = int(qblocks[ci][(my * vi + by) * bwb + (mx * hi + bx)][0])
                        bw.write(dc & 1, 1)
        bw.flush()
        out += bw.out
        # per component: AC first (Al=1) then AC refinement — walking
        # the component's TRUE block grid (≠ the MCU-padded grid when
        # subsampled), as non-interleaved scans must
        hmax2 = max(s[0] for s in samplings)
        vmax2 = max(s[1] for s in samplings)
        for ci, (hi, vi) in enumerate(samplings):
            bwb = blocks[ci][1]
            comp_w = -(-(w * hi) // hmax2)
            comp_h = -(-(h * vi) // vmax2)
            cbw, cbh = -(-comp_w // 8), -(-comp_h // 8)
            order = [
                qblocks[ci][by * bwb + bx]
                for by in range(cbh)
                for bx in range(cbw)
            ]
            out += sos_header([ci], 1, 63, 0, 1)
            bw = _BitWriter()
            _encode_ac_first(bw, order, 1)
            bw.flush()
            out += bw.out
            out += sos_header([ci], 1, 63, 1, 0)
            bw = _BitWriter()
            _encode_ac_refine(bw, order, 0)
            bw.flush()
            out += bw.out
        out += b"\xff\xd9"
        return bytes(out)

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


def _mp4_box(btype: bytes, payload: bytes) -> bytes:
    return struct.pack(">I", 8 + len(payload)) + btype + payload


def encode_mjpeg_mp4(frames: list, frame_ms: int = 500, codec: bytes = b"jpeg") -> bytes:
    """MP4 with a real MJPEG video track: stsd fourcc ``codec`` (default
    'jpeg'), per-sample stsz, two chunks (2 samples then the rest) so
    the stsc mapping is non-trivial, stts at a constant frame duration.
    Frame payloads are standalone JPEGs laid into mdat. Used by the
    multimodal self-check gate and the decoder tests; a non-default
    ``codec`` synthesizes compressed-codec-shaped tracks for the
    pluggable frame-codec seam tests."""
    timescale = 1000

    def full(btype, payload):
        return _mp4_box(btype, b"\x00\x00\x00\x00" + payload)

    def build_moov(chunk_offsets):
        dur = frame_ms * len(frames)
        mvhd = full(b"mvhd", struct.pack(">II", 0, 0)
                    + struct.pack(">II", timescale, dur) + b"\x00" * 80)
        tkhd = _mp4_box(b"tkhd", b"\x00\x00\x00\x07" + struct.pack(">II", 0, 0)
                        + struct.pack(">I", 1) + b"\x00" * 4
                        + struct.pack(">I", dur) + b"\x00" * 52
                        + struct.pack(">II", 32 << 16, 24 << 16))
        mdhd = full(b"mdhd", struct.pack(">IIII", 0, 0, timescale, dur)
                    + b"\x00" * 4)
        entry = struct.pack(">I", 16) + codec[:4].ljust(4, b"\x00") + b"\x00" * 8
        stsd = full(b"stsd", struct.pack(">I", 1) + entry)
        stsz = full(b"stsz", struct.pack(">II", 0, len(frames))
                    + b"".join(struct.pack(">I", len(f)) for f in frames))
        if len(frames) > 2:
            stsc_rows = [(1, 2, 1), (2, len(frames) - 2, 1)]
        else:
            stsc_rows = [(1, len(frames), 1)]
        stsc = full(b"stsc", struct.pack(">I", len(stsc_rows))
                    + b"".join(struct.pack(">III", *r) for r in stsc_rows))
        stco = full(b"stco", struct.pack(">I", len(chunk_offsets))
                    + b"".join(struct.pack(">I", o) for o in chunk_offsets))
        stts = full(b"stts", struct.pack(">I", 1)
                    + struct.pack(">II", len(frames), frame_ms))
        stbl = _mp4_box(b"stbl", stsd + stsz + stsc + stco + stts)
        minf = _mp4_box(b"minf", stbl)
        mdia = _mp4_box(b"mdia", mdhd + minf)
        trak = _mp4_box(b"trak", tkhd + mdia)
        return _mp4_box(b"moov", mvhd + trak)

    ftyp = _mp4_box(b"ftyp", b"isom\x00\x00\x02\x00")
    n_chunks = 2 if len(frames) > 2 else 1
    moov_len = len(build_moov([0] * n_chunks))  # sizing probe, same layout
    mdat_body_off = len(ftyp) + moov_len + 8
    c1 = mdat_body_off
    c2 = c1 + sum(len(f) for f in frames[:2])
    offsets = [c1, c2][:n_chunks]
    moov = build_moov(offsets)
    assert len(moov) == moov_len
    return ftyp + moov + _mp4_box(b"mdat", b"".join(frames))


def encode_lossless_jpeg(
    img: np.ndarray,
    predictor: int = 1,
    precision: int | None = None,
    pt: int = 0,
    restart_interval: int = 0,
    arithmetic: bool = False,
) -> bytes:
    """LOSSLESS JPEG (T.81 Annex H) reference encoder for the decoder
    tests: ``img`` is (h, w) or (h, w, C≤3) uint8/uint16; components
    interleave at 1×1 sampling. Huffman (SOF3) by default: one DC-class
    table (17 difference categories at code length 5 — canonical, the
    all-ones code stays unused as the spec requires).
    ``arithmetic=True`` writes SOF11 instead: QM-coded differences
    under the Annex H.2 two-dimensional (Da, Db) conditioning
    (sources/arithcode.encode_lossless_diff), DAC defaults L=0, U=1.
    ``pt`` point-transform shifts samples right before prediction;
    ``restart_interval`` (in MCUs) emits RSTn markers and resets
    prediction (and, under arithmetic, the coder, statistics, and the
    difference-context history), exercising the decoder's restart
    path."""
    arr = np.asarray(img)
    h, w = arr.shape[:2]
    planes = [arr] if arr.ndim == 2 else [arr[:, :, c] for c in range(arr.shape[2])]
    nc = len(planes)
    if precision is None:
        precision = 16 if arr.dtype.itemsize > 1 else 8
    shifted = [
        (p.astype(np.int64) >> pt) for p in planes
    ]
    default_pred = 1 << (precision - pt - 1)

    out = bytearray(b"\xff\xd8")
    if arithmetic:
        out += _seg(0xCC, bytes([0x00, 0x10]))  # DAC: DC table 0, L=0 U=1
    else:
        counts = bytes([0, 0, 0, 0, 17] + [0] * 11)
        out += _seg(0xC4, bytes([0x00]) + counts + bytes(range(17)))
    sof = bytes([precision]) + struct.pack(">HH", h, w) + bytes([nc])
    for ci in range(nc):
        sof += bytes([ci + 1, 0x11, 0])
    out += _seg(0xCB if arithmetic else 0xC3, sof)
    if restart_interval:
        out += _seg(0xDD, struct.pack(">H", restart_interval))
    sos = bytes([nc])
    for ci in range(nc):
        sos += bytes([ci + 1, 0x00])
    sos += bytes([predictor, 0, pt])
    out += _seg(0xDA, sos)

    if arithmetic:
        from . import arithcode as ARC

        n_mcus = h * w
        per = restart_interval or n_mcus
        rst = 0
        mcu = 0
        while mcu < n_mcus:
            enc = ARC.ArithEncoder()
            stats = bytearray(ARC.LOSSLESS_STAT_BINS)
            # per-component Da/Db history resets with the interval
            diff_rows = [np.zeros(w, dtype=np.int64) for _ in range(nc)]
            first = mcu
            end = min(mcu + per, n_mcus)
            for m in range(mcu, end):
                y, x = divmod(m, w)
                for ci in range(nc):
                    pl = shifted[ci]
                    if m == first:
                        pred = default_pred
                    elif y == 0:
                        pred = pl[0, x - 1]
                    elif x == 0:
                        pred = pl[y - 1, 0]
                    else:
                        ra, rb, rc = pl[y, x - 1], pl[y - 1, x], pl[y - 1, x - 1]
                        pred = [
                            ra, rb, rc, ra + rb - rc,
                            ra + ((rb - rc) >> 1), rb + ((ra - rc) >> 1),
                            (ra + rb) >> 1,
                        ][predictor - 1]
                    m16 = int(pl[y, x] - pred) & 0xFFFF
                    diff = m16 - 65536 if m16 >= 32768 else m16
                    dr = diff_rows[ci]
                    da = 0 if (x == 0 or m == first) else int(dr[x - 1])
                    db = int(dr[x])  # zeros until a row exists above
                    ARC.encode_lossless_diff(enc, stats, da, db, diff, 0, 1)
                    dr[x] = diff
            mcu = end
            out += enc.finish()
            if mcu < n_mcus:
                out += bytes([0xFF, 0xD0 + (rst & 7)])
                rst += 1
        out += b"\xff\xd9"
        return bytes(out)

    bw = _BitWriter()
    n_mcus = h * w
    per = restart_interval or n_mcus
    rst = 0
    mcu = 0
    while mcu < n_mcus:
        end = min(mcu + per, n_mcus)
        for m in range(mcu, end):
            y, x = divmod(m, w)
            for ci in range(nc):
                pl = shifted[ci]
                if m == mcu:
                    pred = default_pred
                elif y == 0:
                    pred = pl[0, x - 1]
                elif x == 0:
                    pred = pl[y - 1, 0]
                else:
                    ra, rb, rc = pl[y, x - 1], pl[y - 1, x], pl[y - 1, x - 1]
                    pred = [
                        ra, rb, rc, ra + rb - rc,
                        ra + ((rb - rc) >> 1), rb + ((ra - rc) >> 1),
                        (ra + rb) >> 1,
                    ][predictor - 1]
                m16 = int(pl[y, x] - pred) & 0xFFFF
                if m16 == 32768:
                    bw.write(16, 5)  # SSSS=16: diff 32768, no extra bits
                    continue
                signed = m16 - 65536 if m16 > 32768 else m16
                s = int(abs(signed)).bit_length()
                bw.write(s, 5)
                _emit_coeff(bw, signed, s)
        mcu = end
        if mcu < n_mcus:
            bw.flush()
            out += bw.out + bytes([0xFF, 0xD0 + (rst & 7)])
            rst += 1
            bw = _BitWriter()
    bw.flush()
    out += bw.out + b"\xff\xd9"
    return bytes(out)


def _recon_plane(p: np.ndarray, bw_blocks: int, bh_blocks: int, h: int, w: int):
    """The exact plane the DECODER holds after a non-differential
    sequential frame of ``p`` with the all-ones quantizer: per-block
    round(DCT(p-128)) → round(IDCT)+128, clamped, cropped."""
    blocks = _plane_blocks(p, bw_blocks, bh_blocks)
    coeff = _T_MAT @ (blocks.astype(np.float64) - 128.0) @ _T_MAT.T
    q = np.round(coeff)
    spatial = _T_MAT.T @ q @ _T_MAT
    recon = np.clip(np.round(spatial) + 128, 0, 255).astype(np.int32)
    plane = (
        recon.reshape(bh_blocks, bw_blocks, 8, 8)
        .transpose(0, 2, 1, 3)
        .reshape(bh_blocks * 8, bw_blocks * 8)
    )
    return plane[:h, :w]


def _write_seq_frame(out: bytearray, marker: int, planes, h: int, w: int,
                     shift: float) -> None:
    """One interleaved sequential frame (1×1 sampling, shared DC/AC
    table 0) for the hierarchical pyramid: SOFn + SOS + entropy data."""
    nc = len(planes)
    sof = struct.pack(">BHHB", 8, h, w, nc)
    for ci in range(nc):
        sof += bytes([ci + 1, 0x11, 0])
    out += _seg(marker, sof)
    sos = bytes([nc])
    for ci in range(nc):
        sos += bytes([ci + 1, 0x00])
    out += _seg(0xDA, sos + bytes([0, 63, 0]))
    bw_blocks, bh_blocks = -(-w // 8), -(-h // 8)
    blocks = [_plane_blocks(p, bw_blocks, bh_blocks) for p in planes]
    bw = _BitWriter()
    preds = [0] * nc
    for bi in range(bw_blocks * bh_blocks):
        for ci in range(nc):
            preds[ci] = _encode_block(bw, blocks[ci][bi], preds[ci], shift=shift)
    bw.flush()
    out += bw.out


def _write_prog_diff_frame(out: bytearray, planes, h: int, w: int) -> None:
    """SOF6 (progressive DIFFERENTIAL) frame: interleaved DC scan then
    one full-band AC scan per component — exercises the decoder's
    progressive scan machinery on difference data (no level shift)."""
    nc = len(planes)
    sof = struct.pack(">BHHB", 8, h, w, nc)
    for ci in range(nc):
        sof += bytes([ci + 1, 0x11, 0])
    out += _seg(0xC6, sof)
    bw_blocks, bh_blocks = -(-w // 8), -(-h // 8)
    qblocks = []
    for p in planes:
        blocks = _plane_blocks(p, bw_blocks, bh_blocks)
        coeff = _T_MAT @ blocks.astype(np.float64) @ _T_MAT.T  # shift 0
        qblocks.append(
            [np.round(c).astype(np.int64).reshape(64)[_JPEG_ZIGZAG] for c in coeff]
        )
    # scan 1: DC, interleaved, Ss=Se=0, Ah=Al=0
    sos = bytes([nc])
    for ci in range(nc):
        sos += bytes([ci + 1, 0x00])
    out += _seg(0xDA, sos + bytes([0, 0, 0]))
    bw = _BitWriter()
    preds = [0] * nc
    for bi in range(bw_blocks * bh_blocks):
        for ci in range(nc):
            dc = int(qblocks[ci][bi][0])
            diff = dc - preds[ci]
            preds[ci] = dc
            t = _category(diff)
            _emit_symbol(bw, t)
            _emit_coeff(bw, diff, t)
    bw.flush()
    out += bw.out
    # scans 2..: per-component full AC band, first pass
    for ci in range(nc):
        out += _seg(0xDA, bytes([1, ci + 1, 0x00, 1, 63, 0]))
        bw = _BitWriter()
        _encode_ac_first(bw, qblocks[ci], 0)
        bw.flush()
        out += bw.out


def _write_lossless_diff_frame(out: bytearray, diffs, h: int, w: int) -> None:
    """SOF7 (differential LOSSLESS) frame: every correction sample is
    coded directly — category + extend bits, mod 2^16, no predictor
    (T.81 H.2 differential mode) — so the pyramid reconstructs the
    input EXACTLY. Reuses the universal table 0 (symbols 0-16 exist)."""
    nc = len(diffs)
    sof = struct.pack(">BHHB", 8, h, w, nc)
    for ci in range(nc):
        sof += bytes([ci + 1, 0x11, 0])
    out += _seg(0xC7, sof)
    sos = bytes([nc])
    for ci in range(nc):
        sos += bytes([ci + 1, 0x00])
    out += _seg(0xDA, sos + bytes([0, 0, 0]))  # Ss=0: no predictor
    bw = _BitWriter()
    for m in range(h * w):
        y, x = divmod(m, w)
        for ci in range(nc):
            m16 = int(diffs[ci][y, x]) & 0xFFFF
            if m16 == 32768:
                _emit_symbol(bw, 16)
                continue
            signed = m16 - 65536 if m16 > 32768 else m16
            s = int(abs(signed)).bit_length()
            _emit_symbol(bw, s)
            _emit_coeff(bw, signed, s)
    bw.flush()
    out += bw.out


def encode_hierarchical_jpeg(img: np.ndarray, progressive_diff: bool = False,
                             lossless_diff: bool = False) -> bytes:
    """HIERARCHICAL JPEG (T.81 Annex J) reference encoder for the
    decoder tests: a two-level pyramid — half-resolution SOF0 base
    frame, EXP ×2 expansion, SOF5 differential correction frame coded
    against the decoder-exact upsampled reconstruction (the base
    frame's reconstruction is recomputed with the decoder's own
    arithmetic and expanded with the same J.1.1.2 filter, so the
    correction is exact up to DCT rounding). Grayscale (h, w) or RGB
    (h, w, 3) — color pyramids operate in YCbCr component space, the
    space the decoder accumulates references in. ``progressive_diff``
    writes the correction as a SOF6 progressive differential frame
    (DC scan + per-component AC scans) instead of SOF5 sequential."""
    from . import mediadecode as MD

    h, w = img.shape[:2]
    h2, w2 = -(-h // 2), -(-w // 2)
    arr = img.astype(np.float64)
    pad = np.pad(
        arr,
        ((0, h2 * 2 - h), (0, w2 * 2 - w)) + (((0, 0),) if arr.ndim == 3 else ()),
        mode="edge",
    )
    if arr.ndim == 2:
        full_planes = [arr]
        base_planes = [np.round(pad.reshape(h2, 2, w2, 2).mean(axis=(1, 3)))]
    else:
        def ycbcr(a):
            r, g, b = a[:, :, 0], a[:, :, 1], a[:, :, 2]
            return [
                np.round(0.299 * r + 0.587 * g + 0.114 * b),
                np.round(128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b),
                np.round(128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b),
            ]
        full_planes = ycbcr(arr)
        base_rgb = pad.reshape(h2, 2, w2, 2, 3).mean(axis=(1, 3))
        base_planes = ycbcr(base_rgb)
    base_planes = [np.clip(p, 0, 255) for p in base_planes]
    full_planes = [np.clip(p, 0, 255).astype(np.int32) for p in full_planes]
    nc = len(full_planes)

    out = bytearray(b"\xff\xd8")  # SOI
    dhp = struct.pack(">BHHB", 8, h, w, nc)
    for ci in range(nc):
        dhp += bytes([ci + 1, 0x11, 0])
    out += _seg(0xDE, dhp)
    out += _seg(0xDB, bytes([0x00]) + bytes([1] * 64))  # DQT 0: all ones
    out += _seg(0xC4, bytes([0x00]) + _HUFF_DC_COUNTS + _HUFF_DC_SYMBOLS)  # DC 0
    out += _seg(0xC4, bytes([0x10]) + _HUFF_COUNTS + _HUFF_SYMBOLS)  # AC 0
    _write_seq_frame(out, 0xC0, base_planes, h2, w2, shift=128.0)
    out += _seg(0xDF, bytes([0x11]))  # EXP: expand both dimensions
    bwb, bhb = -(-w2 // 8), -(-h2 // 8)
    diffs = []
    for ci in range(nc):
        ref = _recon_plane(base_planes[ci], bwb, bhb, h2, w2)
        up = MD._jpeg_exp2(ref, True, True)
        diffs.append(full_planes[ci] - up[:h, :w])
    if lossless_diff:
        _write_lossless_diff_frame(out, diffs, h, w)
    elif progressive_diff:
        _write_prog_diff_frame(out, diffs, h, w)
    else:
        _write_seq_frame(out, 0xC5, diffs, h, w, shift=0.0)
    out += b"\xff\xd9"
    return bytes(out)


def encode_bmp(img: "np.ndarray", top_down: bool = False) -> bytes:
    """Uncompressed 24/32-bit BMP from an (H, W, 3|4) uint8 RGB(A)
    array — the transcode target for decoded video frames (BMP is the
    cheapest payload image_features can pixel-decode)."""
    h, w, nch = img.shape
    bpp = nch * 8
    bgr = img[:, :, [2, 1, 0]] if nch == 3 else img[:, :, [2, 1, 0, 3]]
    rows = bgr if top_down else bgr[::-1]
    row_bytes = (w * nch + 3) & ~3
    pad = row_bytes - w * nch
    pixel_data = b"".join(bytes(rows[y]) + b"\x00" * pad for y in range(h))
    dib = struct.pack("<IiiHHIIiiII", 40, w, -h if top_down else h, 1, bpp,
                      0, len(pixel_data), 2835, 2835, 0, 0)
    offset = 14 + 40
    hdr = b"BM" + struct.pack("<IHHI", offset + len(pixel_data), 0, 0, offset)
    return hdr + dib + pixel_data
