"""Pure-stdlib media header decoders — the real (non-stub) kernels
behind the multimodal stages, same approach as ``minidecode.py`` for
PDF/DOCX: parse the container format directly instead of depending on
PIL/cv2/librosa (not in this environment).

Scope is header/metadata decode plus FULL pixel decode for PNG
(``decode_png_pixels``: IDAT inflate + all five scanline filters +
palette expansion — PNG's pixel layer is zlib, which IS stdlib; JPEG
entropy / GIF LZW / BMP RLE decode are not):

- PNG:  IHDR width/height/bit-depth/color-type → channels
- GIF:  87a/89a logical screen descriptor
- BMP:  BITMAPINFOHEADER (and the legacy BITMAPCOREHEADER)
- JPEG: SOF0/1/2/3/5/6/7/9/10/11/13/14/15 frame header scan
- WAV:  RIFF fmt chunk (channels/rate/bits) + PCM16 data stats
        (n_samples, duration, rms, peak — numpy over the raw buffer)

These cover the formats a metadata/curation pipeline actually filters
on (dimensions, aspect, channel count, duration, loudness) without any
per-pixel work. Everything is called from Arrow-batched ``mapInPandas``
kernels (multimodal.py) — bytes in, small tuples out, no Python in any
per-row Spark expression.

Reference analog: the upload path accepts arbitrary binary
(backend/main.py:332); the reference itself never decodes media — this
is part of the beyond-reference training-data-pipeline surface.
"""

from __future__ import annotations

import struct
from typing import NamedTuple


class ImageInfo(NamedTuple):
    format: str  # "png" | "gif" | "bmp" | "jpeg"
    width: int
    height: int
    channels: int


class AudioInfo(NamedTuple):
    format: str  # "wav"
    channels: int
    sample_rate: int
    bits_per_sample: int
    n_samples: int  # per channel
    duration_ms: int
    rms: float  # 0..1 normalized, PCM16 only (0.0 otherwise)
    peak: float  # 0..1 normalized, PCM16 only (0.0 otherwise)


# ------------------------------------------------------------------ images

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
# color type -> samples per pixel (palette indexes at 1 byte count as 1)
_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}

# SOF markers that carry frame dimensions (C0-CF minus C4/C8/CC which
# are DHT/JPG/DAC)
_JPEG_SOF = {
    0xC0, 0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
    0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF,
}


def decode_png(data: bytes) -> ImageInfo | None:
    if len(data) < 33 or not data.startswith(_PNG_SIG):
        return None
    # first chunk must be IHDR: length(4) type(4) data(13)
    if data[12:16] != b"IHDR":
        return None
    width, height = struct.unpack(">II", data[16:24])
    color_type = data[25]
    channels = _PNG_CHANNELS.get(color_type)
    if channels is None or not (0 < width and 0 < height):
        return None
    return ImageInfo("png", width, height, channels)


def decode_gif(data: bytes) -> ImageInfo | None:
    if len(data) < 10 or data[:6] not in (b"GIF87a", b"GIF89a"):
        return None
    width, height = struct.unpack("<HH", data[6:10])
    if not (width and height):
        return None
    return ImageInfo("gif", width, height, 3)  # palette entries are RGB


def _gif_lzw(min_code_size: int, data: bytes, max_pixels: int) -> bytearray | None:
    """GIF-variant LZW decompress (GIF89a spec, appendix F): variable
    code width starting at min_code_size+1, clear/EOI codes, dictionary
    grows to 12 bits then waits for a clear. ``max_pixels`` bounds the
    output — the header is untrusted and a crafted stream must not
    balloon memory."""
    clear, eoi = 1 << min_code_size, (1 << min_code_size) + 1

    def reset():
        return {i: bytes([i]) for i in range(clear)}, min_code_size + 1

    table, width = reset()
    out = bytearray()
    prev: bytes | None = None
    acc = nbits = 0
    next_code = eoi + 1
    for byte in data:
        acc |= byte << nbits
        nbits += 8
        while nbits >= width:
            code = acc & ((1 << width) - 1)
            acc >>= width
            nbits -= width
            if code == clear:
                table, width = reset()
                next_code = eoi + 1
                prev = None
                continue
            if code == eoi:
                return out
            if prev is None:
                entry = table.get(code)
                if entry is None:
                    return None
            elif code in table:
                entry = table[code]
            elif code == next_code:  # KwKwK case
                entry = prev + prev[:1]
            else:
                return None
            out += entry
            if len(out) > max_pixels:
                return None
            if prev is not None and next_code < 4096:
                table[next_code] = prev + entry[:1]
                next_code += 1
                if next_code == (1 << width) and width < 12:
                    width += 1
            prev = entry
    return out


_GIF_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def decode_gif_pixels(data: bytes):
    """First-frame GIF pixel decode, pure Python LZW + numpy: global or
    local color table, interlacing, sub-block reassembly. Returns a
    (height, width, 3) uint8 RGB array (the logical screen, with the
    frame composited at its offset over the background), or None for
    malformed streams."""
    import numpy as np

    info = decode_gif(data)
    if info is None or len(data) < 14:
        return None
    sw, sh = info.width, info.height
    if sw * sh > 64_000_000:  # untrusted header bound
        return None
    flags = data[10]
    pos = 13
    gct = None
    if flags & 0x80:
        n = 2 << (flags & 0x07)
        if pos + 3 * n > len(data):
            return None
        gct = np.frombuffer(data, dtype=np.uint8, count=3 * n, offset=pos).reshape(n, 3)
        pos += 3 * n
    bg_index = data[11]
    screen = np.zeros((sh, sw, 3), dtype=np.uint8)
    if gct is not None and bg_index < len(gct):
        screen[:, :] = gct[bg_index]

    while pos < len(data):
        b = data[pos]
        if b == 0x21:  # extension: label + sub-blocks
            pos += 2
            while pos < len(data) and data[pos] != 0:
                pos += 1 + data[pos]
            pos += 1
        elif b == 0x2C:  # image descriptor
            if pos + 10 > len(data):
                return None
            x, y, w, h = struct.unpack("<HHHH", data[pos + 1 : pos + 9])
            iflags = data[pos + 9]
            pos += 10
            table = gct
            if iflags & 0x80:  # local color table
                n = 2 << (iflags & 0x07)
                if pos + 3 * n > len(data):
                    return None
                table = np.frombuffer(
                    data, dtype=np.uint8, count=3 * n, offset=pos
                ).reshape(n, 3)
                pos += 3 * n
            if table is None or pos >= len(data):
                return None
            min_code_size = data[pos]
            pos += 1
            if not (2 <= min_code_size <= 8):  # spec: color bits, ≤ 8
                return None
            lzw = bytearray()
            while pos < len(data) and data[pos] != 0:
                ln = data[pos]
                lzw += data[pos + 1 : pos + 1 + ln]
                pos += 1 + ln
            pos += 1
            idx = _gif_lzw(min_code_size, bytes(lzw), w * h)
            if idx is None or len(idx) < w * h:
                return None
            frame = np.frombuffer(bytes(idx[: w * h]), dtype=np.uint8)
            if frame.max(initial=0) >= len(table):
                return None
            frame = frame.reshape(h, w)
            if iflags & 0x40:  # interlaced: rows arrive in 4 passes
                deinter = np.zeros_like(frame)
                src = 0
                for start, step in _GIF_INTERLACE_PASSES:
                    n_rows = len(range(start, h, step))
                    deinter[start::step] = frame[src : src + n_rows]
                    src += n_rows
                frame = deinter
            rgb = table[frame]
            if y >= sh or x >= sw:  # frame entirely off-screen
                return screen
            y2, x2 = min(y + h, sh), min(x + w, sw)
            screen[y:y2, x:x2] = rgb[: y2 - y, : x2 - x]
            return screen  # first frame only (curation needs one)
        elif b == 0x3B:  # trailer
            break
        else:
            return None
    return None


def decode_bmp(data: bytes) -> ImageInfo | None:
    if len(data) < 26 or data[:2] != b"BM":
        return None
    header_size = struct.unpack("<I", data[14:18])[0]
    if header_size == 12:  # BITMAPCOREHEADER: 16-bit dims
        width, height = struct.unpack("<HH", data[18:22])
        bpp = struct.unpack("<H", data[24:26])[0]
    elif header_size >= 40 and len(data) >= 30:  # BITMAPINFOHEADER+
        width, height = struct.unpack("<ii", data[18:26])
        height = abs(height)  # negative = top-down DIB
        bpp = struct.unpack("<H", data[28:30])[0]
    else:
        return None
    if not (0 < width and 0 < height and bpp):
        return None
    channels = 4 if bpp == 32 else (3 if bpp >= 16 else 1)
    return ImageInfo("bmp", width, abs(height), channels)


def _bmp_rle_decode(data: bytes, w: int, h: int, four_bit: bool):
    """RLE8/RLE4 (BI_RLE8/BI_RLE4) -> (h, w) palette indexes, bottom-up
    row order like the uncompressed layouts. Escapes: 0=end-of-line,
    1=end-of-bitmap, 2=delta; other second bytes after a zero start an
    absolute run. Fail-soft: a truncated stream keeps what decoded."""
    import numpy as np

    if w * h > 64_000_000:  # untrusted header bound
        return None
    out = np.zeros((h, w), dtype=np.uint8)
    x = y = pos = 0
    n = len(data)
    while pos + 1 < n and y < h:
        cnt, val = data[pos], data[pos + 1]
        pos += 2
        if cnt:  # encoded run
            if four_bit:
                pair = [(val >> 4) & 0x0F, val & 0x0F]
                run = [pair[i % 2] for i in range(cnt)]
            else:
                run = [val] * cnt
            end = min(x + cnt, w)
            out[y, x:end] = run[: end - x]
            x = end
        elif val == 0:  # end of line
            x, y = 0, y + 1
        elif val == 1:  # end of bitmap
            break
        elif val == 2:  # delta
            if pos + 1 >= n:
                break
            x = min(x + data[pos], w)
            y += data[pos + 1]
            pos += 2
            if y >= h:
                break
        else:  # absolute mode: val literal pixels, word-aligned
            if four_bit:
                nbytes = (val + 1) // 2
                lit = []
                for i in range(val):
                    if pos + i // 2 >= n:
                        break
                    b = data[pos + i // 2]
                    lit.append((b >> 4) & 0x0F if i % 2 == 0 else b & 0x0F)
            else:
                nbytes = val
                lit = list(data[pos : pos + val])
            pos += nbytes + (nbytes & 1)
            end = min(x + len(lit), w)
            out[y, x:end] = lit[: end - x]
            x = end
    return out[::-1]  # RLE bitmaps are always bottom-up


def decode_bmp_pixels(data: bytes):
    """BMP pixel decode for BITMAPINFOHEADER DIBs: uncompressed 24/32
    bit BGR(A), 16-bit packed (X1R5G5B5 default or BI_BITFIELDS masks,
    e.g. RGB565), uncompressed paletted 1/4/8-bit, and RLE8/RLE4. Rows
    are bottom-up (or top-down when height is negative) padded to
    4-byte boundaries; paletted images expand through the BGRA color
    table to (height, width, 3) RGB."""
    import numpy as np

    info = decode_bmp(data)
    if info is None or len(data) < 54:
        return None
    header_size = struct.unpack("<I", data[14:18])[0]
    if header_size < 40:
        return None
    raw_h = struct.unpack("<i", data[22:26])[0]
    top_down = raw_h < 0
    bpp = struct.unpack("<H", data[28:30])[0]
    compression = struct.unpack("<I", data[30:34])[0]
    (pixel_off,) = struct.unpack("<I", data[10:14])
    w, h = info.width, info.height

    if bpp in (24, 32) and compression in (0, 3):  # BI_RGB/BITFIELDS
        nch = bpp // 8
        row_bytes = (w * nch + 3) & ~3  # rows pad to 4-byte boundaries
        if len(data) < pixel_off + row_bytes * h:
            return None
        arr = np.frombuffer(
            data, dtype=np.uint8, count=row_bytes * h, offset=pixel_off
        )
        rows = arr.reshape(h, row_bytes)[:, : w * nch].reshape(h, w, nch)
        if not top_down:
            rows = rows[::-1]
        # BGR(A) -> RGB(A)
        rows = rows[:, :, [2, 1, 0]] if nch == 3 else rows[:, :, [2, 1, 0, 3]]
        return np.ascontiguousarray(rows)

    if bpp == 16 and compression in (0, 3):
        # 16-bit packed: X1R5G5B5 by default, arbitrary contiguous masks
        # under BI_BITFIELDS (the masks follow the info header)
        if compression == 3:
            # masks sit right after the 40 core header bytes (either as
            # the BI_BITFIELDS extension or inside a V4/V5 header)
            mask_off = 14 + 40
            if len(data) < mask_off + 12:
                return None
            masks = struct.unpack("<III", data[mask_off : mask_off + 12])
        else:
            masks = (0x7C00, 0x03E0, 0x001F)
        row_bytes = (w * 2 + 3) & ~3
        if len(data) < pixel_off + row_bytes * h:
            return None
        arr = np.frombuffer(
            data, dtype=np.uint8, count=row_bytes * h, offset=pixel_off
        ).reshape(h, row_bytes)[:, : w * 2]
        px = arr.reshape(h, w, 2).view("<u2").reshape(h, w).astype(np.uint32)
        chans = []
        for mask in masks:
            if not mask:
                return None
            shift = (mask & -mask).bit_length() - 1
            top = mask >> shift
            chans.append(((px & mask) >> shift) * 255 // top)
        out = np.stack(chans, axis=2).astype(np.uint8)
        if not top_down:
            out = out[::-1]
        return np.ascontiguousarray(out)

    if bpp not in (1, 4, 8):
        return None
    # palette: BGRA entries right after the info header
    n_colors = struct.unpack("<I", data[46:50])[0] or (1 << bpp)
    pal_off = 14 + header_size
    if n_colors > 256 or len(data) < pal_off + 4 * n_colors:
        return None
    pal = np.frombuffer(
        data, dtype=np.uint8, count=4 * n_colors, offset=pal_off
    ).reshape(n_colors, 4)[:, [2, 1, 0]]  # BGRA -> RGB

    if compression == 0:
        row_bytes = ((w * bpp + 7) // 8 + 3) & ~3
        if len(data) < pixel_off + row_bytes * h:
            return None
        arr = np.frombuffer(
            data, dtype=np.uint8, count=row_bytes * h, offset=pixel_off
        ).reshape(h, row_bytes)
        if bpp == 8:
            idx = arr[:, :w]
        else:
            bits = np.unpackbits(arr, axis=1)[:, : w * bpp].reshape(h, w, bpp)
            weights = (1 << np.arange(bpp - 1, -1, -1)).astype(np.uint8)
            idx = (bits * weights).sum(axis=2, dtype=np.uint16).astype(np.uint8)
        if not top_down:
            idx = idx[::-1]
    elif (compression, bpp) in ((1, 8), (2, 4)):  # BI_RLE8 / BI_RLE4
        idx = _bmp_rle_decode(data[pixel_off:], w, h, four_bit=(bpp == 4))
        if idx is None:  # oversize / truncated RLE stream — fail closed
            return None
    else:
        return None
    if idx.max(initial=0) >= n_colors:
        return None
    return np.ascontiguousarray(pal[idx])


def decode_jpeg(data: bytes) -> ImageInfo | None:
    if len(data) < 4 or data[:2] != b"\xff\xd8":  # SOI
        return None
    i, n = 2, len(data)
    while i + 4 <= n:
        if data[i] != 0xFF:  # resync on stray bytes
            i += 1
            continue
        marker = data[i + 1]
        if marker == 0xFF:  # fill byte
            i += 1
            continue
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            i += 2  # standalone markers, no length
            continue
        if marker == 0xD9:  # EOI before any SOF
            return None
        if i + 4 > n:
            return None
        seg_len = struct.unpack(">H", data[i + 2 : i + 4])[0]
        if seg_len < 2:
            return None
        if marker in _JPEG_SOF or marker == 0xDE:
            # 0xDE = DHP (hierarchical): SOF syntax carrying the FULL
            # final dims — the pyramid's first SOF frame is smaller
            if i + 2 + seg_len > n or seg_len < 8:
                return None
            height, width = struct.unpack(">HH", data[i + 5 : i + 9])
            channels = data[i + 9]
            if not (width and height and channels):
                return None
            return ImageInfo("jpeg", width, height, channels)
        i += 2 + seg_len
    return None


def _make_zigzag() -> list[int]:
    """JPEG zigzag scan order: index k in scan order -> flat position in
    the 8x8 block (ITU T.81 figure 5)."""
    idx = []
    for d in range(15):
        rng = range(d, -1, -1) if d % 2 == 0 else range(d + 1)
        for r in rng:
            c = d - r
            if r < 8 and c < 8:
                idx.append(r * 8 + c)
    return idx


_JPEG_ZIGZAG = _make_zigzag()


def _jpeg_idct_matrix():
    """8-point DCT-III basis: spatial = T.T @ coeff @ T (T[u,x] =
    0.5*C(u)*cos((2x+1)uπ/16))."""
    import math

    import numpy as np

    t = np.zeros((8, 8))
    for u in range(8):
        cu = (1.0 / math.sqrt(2.0)) if u == 0 else 1.0
        for x in range(8):
            t[u, x] = 0.5 * cu * math.cos((2 * x + 1) * u * math.pi / 16.0)
    return t


class _JpegBits:
    """MSB-first bit reader over one entropy-coded interval (stuffed
    0xFF00 already collapsed to 0xFF by the interval splitter)."""

    __slots__ = ("d", "pos", "buf", "n")

    def __init__(self, data: bytes):
        self.d = data
        self.pos = 0
        self.buf = 0
        self.n = 0

    def bit(self) -> int:
        if self.n == 0:
            if self.pos >= len(self.d):
                raise EOFError
            self.buf = self.d[self.pos]
            self.pos += 1
            self.n = 8
        self.n -= 1
        return (self.buf >> self.n) & 1

    def bits(self, k: int) -> int:
        v = 0
        for _ in range(k):
            v = (v << 1) | self.bit()
        return v


def _jpeg_huff_table(counts: bytes, symbols: bytes) -> dict[tuple[int, int], int]:
    """Canonical Huffman (T.81 annex C): {(code_length, code): symbol}."""
    table: dict[tuple[int, int], int] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(counts[length - 1]):
            if k >= len(symbols):
                raise ValueError("bad DHT")
            table[(length, code)] = symbols[k]
            code += 1
            k += 1
        code <<= 1
    return table


def _jpeg_huff_decode(br: _JpegBits, table: dict[tuple[int, int], int]) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | br.bit()
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("bad huffman code")


def _jpeg_extend(v: int, t: int) -> int:
    """T.81 F.2.2.1 EXTEND: map the t-bit magnitude to its signed value."""
    if t == 0 or v >= (1 << (t - 1)):
        return v
    return v - (1 << t) + 1


def _jpeg_scan_units(
    scan, comps, grids, coeffs, huff_dc, huff_ac,
    mcus_x, mcus_y, restart_interval, progressive,
    differential=False,
):
    """Run one scan (sequential, or any of the four progressive scan
    kinds: DC/AC × first/refinement) over its entropy intervals,
    accumulating coefficients in place. Returns the number of decoded
    units (MCUs, or blocks for non-interleaved scans). ``differential``
    (hierarchical correction frames) widens the DC category cap to 12 —
    difference-image DC values span ±2040 at 8-bit precision."""
    sel, ss, se, ah, al, intervals = scan
    interleaved = len(sel) > 1
    if interleaved:
        units_total = mcus_x * mcus_y
    else:
        ci = sel[0][0]
        cbw, cbh = grids[ci][2], grids[ci][3]
        units_total = cbw * cbh
    per_interval = restart_interval or units_total
    zz = _JPEG_ZIGZAG

    def blocks_of_unit(unit):
        if interleaved:
            my, mx = divmod(unit, mcus_x)
            for ci, td, ta in sel:
                _, hi, vi, _tq = comps[ci]
                bw = grids[ci][0]
                for by in range(vi):
                    for bx in range(hi):
                        yield ci, td, ta, coeffs[ci][
                            (my * vi + by) * bw + (mx * hi + bx)
                        ]
        else:
            ci, td, ta = sel[0]
            bw = grids[ci][0]
            cbw = grids[ci][2]
            by, bx = divmod(unit, cbw)
            yield ci, td, ta, coeffs[ci][by * bw + bx]

    unit = 0
    state = {"eobrun": 0}
    for interval in intervals:
        if unit >= units_total:
            break
        br = _JpegBits(interval)
        pred = [0] * len(comps)
        state["eobrun"] = 0
        try:
            for _ in range(min(per_interval, units_total - unit)):
                for ci, td, ta, blk in blocks_of_unit(unit):
                    if ss == 0 and (not progressive or ah == 0):
                        # DC (first pass, or the whole band sequentially)
                        t = _jpeg_huff_decode(br, huff_dc[td])
                        if t > (12 if differential else 11):
                            raise ValueError("bad DC category")
                        diff = _jpeg_extend(br.bits(t), t) if t else 0
                        pred[ci] += diff
                        blk[0] = pred[ci] << al
                        if not progressive:
                            _jpeg_ac_first(br, blk, huff_ac[ta], 1, 63, 0, state, zz)
                    elif ss == 0:  # DC refinement: one raw bit per block
                        if br.bit():
                            blk[0] |= 1 << al
                    elif ah == 0:  # AC first pass for a band
                        _jpeg_ac_first(br, blk, huff_ac[ta], ss, se, al, state, zz)
                    else:  # AC refinement
                        _jpeg_ac_refine(br, blk, huff_ac[ta], ss, se, al, state, zz)
                unit += 1
        except (EOFError, ValueError, KeyError):
            # truncated/garbled interval (or a scan referencing an
            # undefined table): keep what decoded — fail-soft, like
            # real viewers; a short stream yields a partial image
            break
    return unit


def _jpeg_ac_first(br, blk, table, ss, se, al, state, zz):
    """Sequential AC / progressive first AC pass with EOB-run support
    (T.81 F.2.2.2 / G.1.2.2)."""
    if state["eobrun"] > 0:
        state["eobrun"] -= 1
        return
    k = ss
    while k <= se:
        rs = _jpeg_huff_decode(br, table)
        r, s = rs >> 4, rs & 0x0F
        if s == 0:
            if r == 15:  # ZRL
                k += 16
                continue
            state["eobrun"] = (1 << r) - 1 + (br.bits(r) if r else 0)
            break
        k += r
        if k > se:
            raise ValueError("AC overrun")
        blk[zz[k]] = _jpeg_extend(br.bits(s), s) << al
        k += 1


def _jpeg_ac_refine(br, blk, table, ss, se, al, state, zz):
    """Progressive AC refinement pass (T.81 G.1.2.3): newly significant
    coefficients arrive as ±1<<al; already-significant ones absorb one
    correction bit each as the run skips over them."""
    p1, m1 = 1 << al, -(1 << al)

    def correct(pos):
        if br.bit() and not (blk[pos] & p1):
            blk[pos] += p1 if blk[pos] > 0 else m1

    k = ss
    if state["eobrun"] == 0:
        while k <= se:
            rs = _jpeg_huff_decode(br, table)
            r, s = rs >> 4, rs & 0x0F
            if s == 0:
                if r < 15:
                    state["eobrun"] = (1 << r) - 1 + (br.bits(r) if r else 0) + 1
                    break
                val = 0  # ZRL: skip 16 zero-history positions
            elif s == 1:
                val = p1 if br.bit() else m1
            else:
                raise ValueError("bad refinement size")
            while k <= se:
                pos = zz[k]
                if blk[pos] != 0:
                    correct(pos)
                elif r == 0:
                    if val:
                        blk[pos] = val
                    k += 1
                    break
                else:
                    r -= 1
                k += 1
    if state["eobrun"] > 0:
        while k <= se:  # refine the rest of the band inside the EOB run
            pos = zz[k]
            if blk[pos] != 0:
                correct(pos)
            k += 1
        state["eobrun"] -= 1


def _jpeg_lossless_scan(data: bytes):
    """LOSSLESS JPEG (SOF3, T.81 Annex H): predictive Huffman decode.

    Supports 1-3 components at 1×1 sampling, precision 2-16 bits, all
    seven predictors, point transform, and restart intervals (the
    prediction for each component's first sample after a restart — and
    at scan start — is 2^(P-Pt-1)). Returns (height, width, channels)
    uint8; precision > 8 scales down to the 8-bit output contract.
    None for anything outside that envelope (fail-soft, same contract
    as the DCT paths)."""
    import numpy as np

    huff_dc: dict[int, dict] = {}
    frame = None  # (P, w, h, [comp ids])
    restart_interval = 0
    scan = None
    i, n = 2, len(data)
    while i + 4 <= n:
        if data[i] != 0xFF:
            i += 1
            continue
        marker = data[i + 1]
        if marker == 0xFF:
            i += 1
            continue
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            i += 2
            continue
        if marker == 0xD9:
            break
        seg_len = struct.unpack(">H", data[i + 2 : i + 4])[0]
        if seg_len < 2 or i + 2 + seg_len > n:
            return None
        body = data[i + 4 : i + 2 + seg_len]
        if marker == 0xC4:  # DHT
            p = 0
            while p + 17 <= len(body):
                tc, th = body[p] >> 4, body[p] & 0x0F
                counts = body[p + 1 : p + 17]
                nsym = sum(counts)
                if p + 17 + nsym > len(body) or th > 3:
                    return None
                if tc == 0:  # lossless uses DC-class tables only
                    huff_dc[th] = _jpeg_huff_table(
                        counts, body[p + 17 : p + 17 + nsym]
                    )
                p += 17 + nsym
        elif marker == 0xC3:  # SOF3
            if len(body) < 6:
                return None
            prec = body[0]
            h, w = struct.unpack(">HH", body[1:5])
            nc = body[5]
            if not (2 <= prec <= 16) or nc not in (1, 2, 3) or not (w and h):
                return None
            if w * h > 64_000_000 or len(body) < 6 + 3 * nc:
                return None
            ids = []
            for c in range(nc):
                hv = body[7 + 3 * c]
                if hv != 0x11:  # subsampled lossless: out of envelope
                    return None
                ids.append(body[6 + 3 * c])
            frame = (prec, w, h, ids)
        elif marker in _JPEG_SOF or marker == 0xCC:  # other frames / DAC
            return None
        elif marker == 0xDD:  # DRI
            if len(body) < 2:
                return None
            restart_interval = struct.unpack(">H", body[:2])[0]
        elif marker == 0xDA:  # SOS
            if frame is None or len(body) < 4:
                return None
            ns = body[0]
            if ns != len(frame[3]) or len(body) < 1 + 2 * ns + 3:
                return None  # envelope: all components in one scan
            tds = []
            for s in range(ns):
                if body[1 + 2 * s] != frame[3][s]:
                    return None  # components in frame order only
                tds.append(body[2 + 2 * s] >> 4)
            pred_sel = body[1 + 2 * ns]  # Ss = predictor selector
            pt = body[3 + 2 * ns] & 0x0F  # Al = point transform
            if not (1 <= pred_sel <= 7):
                return None
            # entropy intervals (restart markers split them)
            intervals: list[bytes] = []
            cur = bytearray()
            p = i + 2 + seg_len
            while p < n:
                b = data[p]
                if b != 0xFF:
                    cur.append(b)
                    p += 1
                    continue
                m2 = data[p + 1] if p + 1 < n else 0xD9
                if m2 == 0x00:
                    cur.append(0xFF)
                    p += 2
                elif 0xD0 <= m2 <= 0xD7:
                    intervals.append(bytes(cur))
                    cur = bytearray()
                    p += 2
                else:
                    break
            intervals.append(bytes(cur))
            scan = (tds, pred_sel, pt, intervals)
            break
        i += 2 + seg_len
    if frame is None or scan is None:
        return None

    prec, w, h, ids = frame
    tds, pred_sel, pt, intervals = scan
    nc = len(ids)
    if pt >= prec:
        return None
    default_pred = 1 << (prec - pt - 1)
    planes = [np.zeros((h, w), dtype=np.int64) for _ in range(nc)]

    mcu = 0  # one MCU = one sample per component (1x1 sampling)
    n_mcus = w * h
    per_interval = restart_interval or n_mcus
    br = None
    it = iter(intervals)
    fresh = True
    while mcu < n_mcus:
        try:
            br = _JpegBits(next(it))
        except StopIteration:
            break  # truncated stream: keep what decoded (fail-soft)
        end = min(mcu + per_interval, n_mcus)
        try:
            for m in range(mcu, end):
                y, x = divmod(m, w)
                for ci in range(nc):
                    s = _jpeg_huff_decode(br, huff_dc[tds[ci]])
                    if s == 16:
                        diff = 32768
                    elif s:
                        diff = _jpeg_extend(br.bits(s), s)
                    else:
                        diff = 0
                    pl = planes[ci]
                    if fresh and m == mcu:
                        pred = default_pred
                    elif y == 0:
                        pred = pl[0, x - 1]
                    elif x == 0:
                        pred = pl[y - 1, 0]
                    else:
                        ra = pl[y, x - 1]
                        rb = pl[y - 1, x]
                        rc = pl[y - 1, x - 1]
                        if pred_sel == 1:
                            pred = ra
                        elif pred_sel == 2:
                            pred = rb
                        elif pred_sel == 3:
                            pred = rc
                        elif pred_sel == 4:
                            pred = ra + rb - rc
                        elif pred_sel == 5:
                            pred = ra + ((rb - rc) >> 1)
                        elif pred_sel == 6:
                            pred = rb + ((ra - rc) >> 1)
                        else:
                            pred = (ra + rb) >> 1
                    pl[y, x] = (pred + diff) & 0xFFFF
        except (IndexError, KeyError):
            break  # truncated entropy data: fail-soft
        mcu = end
        fresh = True  # next interval restarts prediction
    # reconstruct: undo point transform, scale precision to 8-bit
    out = []
    for pl in planes:
        v = pl << pt
        if prec > 8:
            v = v >> (prec - 8)
        elif prec < 8:
            v = v << (8 - prec)
        out.append(np.clip(v, 0, 255).astype(np.uint8))
    return np.stack(out, axis=2)


def _jpeg_lossless_arith_scan(data: bytes):
    """LOSSLESS ARITHMETIC JPEG (SOF11, T.81 Annex H.2): predictive
    decode with QM-coded differences under the two-dimensional (Da, Db)
    conditioning model (sources/arithcode.decode_lossless_diff; DAC
    defaults L=0, U=1). Same envelope as :func:`_jpeg_lossless_scan`:
    1-3 components at 1×1 sampling, precision 2-16 bits, all seven
    predictors, point transform, restart intervals (which re-init the
    coder, the statistics, the difference-context history, and the
    prediction). Returns (height, width, channels) uint8; None outside
    the envelope (fail-soft)."""
    import numpy as np

    from . import arithcode as ARC

    try:
        dc_cond: dict[int, tuple[int, int]] = {}  # th -> (L, U)
        frame = None  # (P, w, h, [comp ids])
        restart_interval = 0
        scan = None
        i, n = 2, len(data)
        while i + 4 <= n:
            if data[i] != 0xFF:
                i += 1
                continue
            marker = data[i + 1]
            if marker == 0xFF:
                i += 1
                continue
            if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
                i += 2
                continue
            if marker == 0xD9:
                break
            seg_len = struct.unpack(">H", data[i + 2 : i + 4])[0]
            if seg_len < 2 or i + 2 + seg_len > n:
                return None
            body = data[i + 4 : i + 2 + seg_len]
            if marker == 0xCC:  # DAC conditioning
                p = 0
                while p + 2 <= len(body):
                    tc, th = body[p] >> 4, body[p] & 0x0F
                    v = body[p + 1]
                    if tc == 0:
                        dc_cond[th] = (v & 0x0F, v >> 4)  # (L, U)
                    p += 2
            elif marker == 0xCB:  # SOF11
                if len(body) < 6:
                    return None
                prec = body[0]
                h, w = struct.unpack(">HH", body[1:5])
                nc = body[5]
                if not (2 <= prec <= 16) or nc not in (1, 2, 3) or not (w and h):
                    return None
                if w * h > 64_000_000 or len(body) < 6 + 3 * nc:
                    return None
                ids = []
                for c in range(nc):
                    hv = body[7 + 3 * c]
                    if hv != 0x11:  # subsampled lossless: out of envelope
                        return None
                    ids.append(body[6 + 3 * c])
                frame = (prec, w, h, ids)
            elif marker in _JPEG_SOF or marker == 0xC4:  # other frames
                return None
            elif marker == 0xDD:  # DRI
                if len(body) < 2:
                    return None
                restart_interval = struct.unpack(">H", body[:2])[0]
            elif marker == 0xDA:  # SOS
                if frame is None or len(body) < 4:
                    return None
                ns = body[0]
                if ns != len(frame[3]) or len(body) < 1 + 2 * ns + 3:
                    return None  # envelope: all components in one scan
                tds = []
                for s in range(ns):
                    if body[1 + 2 * s] != frame[3][s]:
                        return None  # components in frame order only
                    tds.append(body[2 + 2 * s] >> 4)
                pred_sel = body[1 + 2 * ns]  # Ss = predictor selector
                pt = body[3 + 2 * ns] & 0x0F  # Al = point transform
                if not (1 <= pred_sel <= 7):
                    return None
                scan = (tds, pred_sel, pt, i + 2 + seg_len)
                break
            i += 2 + seg_len
        if frame is None or scan is None:
            return None

        prec, w, h, ids = frame
        tds, pred_sel, pt, start = scan
        nc = len(ids)
        if pt >= prec:
            return None
        default_pred = 1 << (prec - pt - 1)
        planes = [np.zeros((h, w), dtype=np.int64) for _ in range(nc)]
        conds = [dc_cond.get(td, (0, 1)) for td in tds]

        def fresh(pos):
            # one statistics area PER CONDITIONING TABLE (components
            # sharing a Td share adaptation, as in the sequential path)
            return (
                ARC.ArithDecoder(data, pos),
                {td: bytearray(ARC.LOSSLESS_STAT_BINS) for td in tds},
                [np.zeros(w, dtype=np.int64) for _ in range(nc)],
            )

        mcu = 0  # one MCU = one sample per component (1x1 sampling)
        n_mcus = w * h
        per_interval = restart_interval or n_mcus
        dec, stats, diff_rows = fresh(start)
        while mcu < n_mcus:
            first = mcu
            end = min(mcu + per_interval, n_mcus)
            for m in range(mcu, end):
                y, x = divmod(m, w)
                for ci in range(nc):
                    pl = planes[ci]
                    if m == first:
                        pred = default_pred
                    elif y == 0:
                        pred = pl[0, x - 1]
                    elif x == 0:
                        pred = pl[y - 1, 0]
                    else:
                        ra = pl[y, x - 1]
                        rb = pl[y - 1, x]
                        rc = pl[y - 1, x - 1]
                        if pred_sel == 1:
                            pred = ra
                        elif pred_sel == 2:
                            pred = rb
                        elif pred_sel == 3:
                            pred = rc
                        elif pred_sel == 4:
                            pred = ra + rb - rc
                        elif pred_sel == 5:
                            pred = ra + ((rb - rc) >> 1)
                        elif pred_sel == 6:
                            pred = rb + ((ra - rc) >> 1)
                        else:
                            pred = (ra + rb) >> 1
                    dr = diff_rows[ci]
                    da = 0 if (x == 0 or m == first) else int(dr[x - 1])
                    db = int(dr[x])
                    L, U = conds[ci]
                    diff = ARC.decode_lossless_diff(
                        dec, stats[tds[ci]], da, db, L, U
                    )
                    dr[x] = diff
                    pl[y, x] = (pred + diff) & 0xFFFF
            mcu = end
            if mcu < n_mcus:
                # skip to the RST marker, re-init everything
                p = dec.pos
                while p + 1 < n and not (
                    data[p] == 0xFF and 0xD0 <= data[p + 1] <= 0xD7
                ):
                    p += 1
                if p + 1 >= n:
                    break  # truncated: keep what decoded (fail-soft)
                dec, stats, diff_rows = fresh(p + 2)
        # reconstruct: undo point transform, scale precision to 8-bit
        out = []
        for pl in planes:
            v = pl << pt
            if prec > 8:
                v = v >> (prec - 8)
            elif prec < 8:
                v = v << (8 - prec)
            out.append(np.clip(v, 0, 255).astype(np.uint8))
        return np.stack(out, axis=2)
    except Exception:
        return None  # fail-closed, same contract as the other paths


def _jpeg_exp2(plane, horiz: bool, vert: bool):
    """T.81 J.1.1.2 reference-image expansion: doubled axes take the
    input on even positions and the rounded two-point average on odd
    positions (edge replicated)."""
    import numpy as np

    p = plane
    if horiz:
        h, w = p.shape
        out = np.empty((h, 2 * w), dtype=p.dtype)
        out[:, 0::2] = p
        nxt = np.concatenate([p[:, 1:], p[:, -1:]], axis=1)
        out[:, 1::2] = (p + nxt + 1) >> 1
        p = out
    if vert:
        h, w = p.shape
        out = np.empty((2 * h, w), dtype=p.dtype)
        out[0::2, :] = p
        nxt = np.concatenate([p[1:, :], p[-1:, :]], axis=0)
        out[1::2, :] = (p + nxt + 1) >> 1
        p = out
    return p


def _jpeg_hierarchical(data: bytes):
    """HIERARCHICAL JPEG (DHP + frame pyramid, T.81 Annex J): decode a
    sequence of frames — a non-differential first frame (SOF0/1/2)
    followed by EXP reference expansions and differential correction
    frames: DCT (SOF5/6) or LOSSLESS (SOF7 — corrections coded
    directly, mod 2^16, making the pyramid reconstruction exact) —
    into per-component reference planes. Arithmetic or non-differential
    lossless members return None (fail-soft). 1-3 components; tables
    persist across frames per the spec."""
    import numpy as np

    qt: dict[int, "np.ndarray"] = {}
    huff_dc: dict[int, dict] = {}
    huff_ac: dict[int, dict] = {}
    restart_interval = 0
    final = None  # DHP dims: (w, h, ncomp)
    refs: list | None = None  # per-component int32 planes (unclamped)
    cur = None  # (w, h, comps, progressive, differential, lossless)
    cur_scans: list = []

    def _lossless_diff_planes(w, h, nc, tds, intervals):
        """Differential LOSSLESS frame (SOF7): each sample codes the
        correction directly (no predictor, T.81 H.2 differential mode),
        mod 2^16 — merging onto the reference is exact."""
        planes = [np.zeros((h, w), dtype=np.int64) for _ in range(nc)]
        n_mcus = w * h
        per = restart_interval or n_mcus
        it = iter(intervals)
        mcu = 0
        while mcu < n_mcus:
            try:
                br = _JpegBits(next(it))
            except StopIteration:
                break
            end = min(mcu + per, n_mcus)
            try:
                for m in range(mcu, end):
                    yy, xx = divmod(m, w)
                    for ci in range(nc):
                        s = _jpeg_huff_decode(br, huff_dc[tds[ci]])
                        if s == 16:
                            d = 32768
                        elif s:
                            d = _jpeg_extend(br.bits(s), s)
                        else:
                            d = 0
                        planes[ci][yy, xx] = d & 0xFFFF
            except (IndexError, KeyError):
                break
            mcu = end
        return planes

    def flush_frame():
        """Decode the pending frame's scans and merge into refs."""
        nonlocal refs, cur, cur_scans
        if cur is None:
            return True
        if not cur_scans:
            return False
        w, h, comps, progressive, differential, lossless = cur
        if lossless:
            # only DIFFERENTIAL lossless inside a pyramid is supported
            if not differential or refs is None or len(refs) != len(comps):
                return False
            sel, pss, _se, _ah, _al, intervals = cur_scans[0]
            if len(sel) != len(comps) or pss != 0:
                return False  # differential lossless codes Ss = 0
            tds = [td for _, td, _ta in sel]
            planes = _lossless_diff_planes(w, h, len(comps), tds, intervals)
            merged = []
            for r, d in zip(refs, planes):
                if r.shape[0] < h or r.shape[1] < w:
                    return False
                merged.append(np.clip((r[:h, :w] + d) & 0xFFFF, 0, 255))
            refs = merged
            cur, cur_scans = None, []
            return True
        for c in comps:
            if c[3] not in qt or not (1 <= c[1] <= 2 and 1 <= c[2] <= 2):
                return False
        hmax = max(c[1] for c in comps)
        vmax = max(c[2] for c in comps)
        mcus_x = -(-w // (8 * hmax))
        mcus_y = -(-h // (8 * vmax))
        grids, coeffs = [], []
        for _, hi, vi, _tq in comps:
            bw, bh = mcus_x * hi, mcus_y * vi
            comp_w = -(-(w * hi) // hmax)
            comp_h = -(-(h * vi) // vmax)
            grids.append((bw, bh, -(-comp_w // 8), -(-comp_h // 8)))
            coeffs.append(np.zeros((bh * bw, 64), dtype=np.int32))
        decoded = 0
        for scan in cur_scans:
            decoded += _jpeg_scan_units(
                scan, comps, grids, coeffs, huff_dc, huff_ac,
                mcus_x, mcus_y, restart_interval, progressive,
                differential=differential,
            )
        if decoded == 0:
            return False
        t_mat = _jpeg_idct_matrix()
        planes = []
        for ci, (_, hi, vi, tq) in enumerate(comps):
            bw, bh = grids[ci][0], grids[ci][1]
            deq = coeffs[ci].reshape(-1, 8, 8) * qt[tq][None, :, :]
            spatial = np.einsum(
                "ux,nuv,vy->nxy", t_mat, deq.astype(np.float64), t_mat
            )
            shift = 0 if differential else 128
            blocks = (np.round(spatial) + shift).astype(np.int32)
            plane = (
                blocks.reshape(bh, bw, 8, 8)
                .transpose(0, 2, 1, 3)
                .reshape(bh * 8, bw * 8)
            )
            if hi < hmax:
                plane = np.repeat(plane, hmax // hi, axis=1)
            if vi < vmax:
                plane = np.repeat(plane, vmax // vi, axis=0)
            planes.append(plane[:h, :w])
        # every stage's reference output clamps to the sample range
        # (T.81 J: reference components are stored at 0..2^P-1)
        if differential:
            if refs is None or len(refs) != len(planes):
                return False
            merged = []
            for r, d in zip(refs, planes):
                if r.shape[0] < h or r.shape[1] < w:
                    return False
                merged.append(np.clip(r[:h, :w] + d, 0, 255))
            refs = merged
        else:
            if refs is not None:
                return False  # second non-differential frame: invalid
            refs = [np.clip(p, 0, 255) for p in planes]
        cur, cur_scans = None, []
        return True

    i, n = 2, len(data)
    while i + 4 <= n:
        if data[i] != 0xFF:
            i += 1
            continue
        marker = data[i + 1]
        if marker == 0xFF:
            i += 1
            continue
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            i += 2
            continue
        if marker == 0xD9:
            break
        seg_len = struct.unpack(">H", data[i + 2 : i + 4])[0]
        if seg_len < 2 or i + 2 + seg_len > n:
            return None
        body = data[i + 4 : i + 2 + seg_len]
        if marker == 0xDE:  # DHP: final dims, SOF syntax, no entropy
            if len(body) < 6 or body[0] != 8:
                return None
            fh, fw = struct.unpack(">HH", body[1:5])
            nc = body[5]
            if nc not in (1, 3) or not (fw and fh) or fw * fh > 64_000_000:
                return None
            final = (fw, fh, nc)
        elif marker == 0xDB:  # DQT (persists across frames)
            p = 0
            while p < len(body):
                pq, tq = body[p] >> 4, body[p] & 0x0F
                p += 1
                m = 64 * (2 if pq else 1)
                if p + m > len(body) or tq > 3:
                    return None
                raw = (
                    np.frombuffer(body[p : p + m], dtype=">u2")
                    if pq
                    else np.frombuffer(body[p : p + m], dtype=np.uint8)
                ).astype(np.int32)
                tbl = np.zeros(64, dtype=np.int32)
                tbl[_JPEG_ZIGZAG] = raw
                qt[tq] = tbl.reshape(8, 8)
                p += m
        elif marker == 0xC4:  # DHT (persists)
            p = 0
            while p + 17 <= len(body):
                tc, th = body[p] >> 4, body[p] & 0x0F
                counts = body[p + 1 : p + 17]
                nsym = sum(counts)
                if p + 17 + nsym > len(body) or th > 3:
                    return None
                table = _jpeg_huff_table(counts, body[p + 17 : p + 17 + nsym])
                (huff_ac if tc else huff_dc)[th] = table
                p += 17 + nsym
        elif marker in (0xC0, 0xC1, 0xC2, 0xC5, 0xC6, 0xC7):  # pyramid frames
            if not flush_frame():
                return None
            if len(body) < 6 or body[0] != 8:
                return None
            h, w = struct.unpack(">HH", body[1:5])
            nc = body[5]
            if nc not in (1, 3) or len(body) < 6 + 3 * nc or not (w and h):
                return None
            if w * h > 64_000_000:
                return None
            comps = []
            for c in range(nc):
                cid = body[6 + 3 * c]
                hv = body[7 + 3 * c]
                comps.append((cid, hv >> 4, hv & 0x0F, body[8 + 3 * c]))
            cur = (
                w, h, comps,
                marker in (0xC2, 0xC6),
                marker in (0xC5, 0xC6, 0xC7),
                marker == 0xC7,
            )
        elif marker in _JPEG_SOF or marker == 0xCC:
            return None  # non-diff lossless / arithmetic members, DAC
        elif marker == 0xDF:  # EXP: expand the reference image
            if not flush_frame():
                return None
            if refs is None or len(body) < 1:
                return None
            eh, ev = body[0] >> 4, body[0] & 0x0F
            if eh > 1 or ev > 1:
                return None
            refs = [_jpeg_exp2(r, bool(eh), bool(ev)) for r in refs]
        elif marker == 0xDD:  # DRI
            if len(body) < 2:
                return None
            restart_interval = struct.unpack(">H", body[:2])[0]
        elif marker == 0xDA:  # SOS for the current frame
            if cur is None or len(body) < 4:
                return None
            ns = body[0]
            comps = cur[2]
            if not (1 <= ns <= len(comps)) or len(body) < 1 + 2 * ns + 3:
                return None
            ids = [c[0] for c in comps]
            sel = []
            for s in range(ns):
                cs = body[1 + 2 * s]
                if cs not in ids:
                    return None
                td, ta = body[2 + 2 * s] >> 4, body[2 + 2 * s] & 0x0F
                sel.append((ids.index(cs), td, ta))
            ss, se = body[1 + 2 * ns], body[2 + 2 * ns]
            ah, al = body[3 + 2 * ns] >> 4, body[3 + 2 * ns] & 0x0F
            if ss > se or se > 63:
                return None
            intervals: list[bytes] = []
            curb = bytearray()
            p = i + 2 + seg_len
            while p < n:
                b = data[p]
                if b != 0xFF:
                    curb.append(b)
                    p += 1
                    continue
                m2 = data[p + 1] if p + 1 < n else 0xD9
                if m2 == 0x00:
                    curb.append(0xFF)
                    p += 2
                elif 0xD0 <= m2 <= 0xD7:
                    intervals.append(bytes(curb))
                    curb = bytearray()
                    p += 2
                else:
                    break
            intervals.append(bytes(curb))
            cur_scans.append((sel, ss, se, ah, al, intervals))
            i = p
            continue
        i += 2 + seg_len
    if not flush_frame() or refs is None or final is None:
        return None
    fw, fh, nc = final
    if len(refs) != nc:
        return None
    for r in refs:
        if r.shape[0] < fh or r.shape[1] < fw:
            return None
    planes = [
        np.clip(r[:fh, :fw], 0, 255).astype(np.uint8) for r in refs
    ]
    if nc == 1:
        return planes[0][:, :, None].copy()
    y, cb, cr = (p.astype(np.float64) for p in planes)
    r = y + 1.402 * (cr - 128)
    g = y - 0.344136 * (cb - 128) - 0.714136 * (cr - 128)
    b = y + 1.772 * (cb - 128)
    return np.clip(
        np.round(np.stack([r, g, b], axis=2)), 0, 255
    ).astype(np.uint8)


def decode_jpeg_pixels(data: bytes):
    """JPEG pixel decode (T.81, public spec), pure Python entropy
    decode + numpy dequant/IDCT: baseline/extended-sequential (SOF0/1)
    AND progressive (SOF2 — spectral selection, successive
    approximation, DC+AC refinement scans, EOB runs), 8-bit samples,
    grayscale or 3-component YCbCr, sampling factors 1-2 with chroma
    upsampling, restart markers, 8/16-bit DQT, per-scan DHT
    redefinition; plus LOSSLESS (SOF3) predictive frames via
    :func:`_jpeg_lossless_scan`, HIERARCHICAL pyramids (DHP + EXP +
    SOF5/6 differential frames via :func:`_jpeg_hierarchical`) and
    4-COMPONENT (CMYK/YCCK) frames — returned as 4 channels exactly as
    the codestream encodes them (APP14 transform 2 un-rotates YCCK
    back to CMY; ink interpretation is producer-dependent and stays
    with the caller); plus ARITHMETIC entropy coding in all three
    shapes — sequential (SOF9) and progressive (SOF10) via
    :func:`_jpeg_arith` (QM coder + Annex F/G conditioning,
    sources/arithcode.py) and lossless (SOF11) via
    :func:`_jpeg_lossless_arith_scan` (Annex H.2 two-dimensional
    difference conditioning). Only differential frames outside a
    hierarchical pyramid return None (metadata-only fallback).
    Returns (height, width, channels) uint8.

    Per-block work is one einsum over all blocks per component; only
    the inherently serial Huffman bitstream walks in Python — fine for
    the thumbnail/preview sizes a curation pipeline decodes, and the
    64 MP bound caps untrusted headers."""
    import numpy as np

    try:
        if len(data) < 4 or data[:2] != b"\xff\xd8":
            return None
        qt: dict[int, "np.ndarray"] = {}
        huff_dc: dict[int, dict] = {}
        huff_ac: dict[int, dict] = {}
        frame = None  # (w, h, [(comp_id, hi, vi, tq), ...], progressive)
        restart_interval = 0
        adobe_transform = None  # APP14 color-transform flag (None=absent)
        scans = []  # (sel, Ss, Se, Ah, Al, intervals)

        i, n = 2, len(data)
        while i + 4 <= n:
            if data[i] != 0xFF:
                i += 1
                continue
            marker = data[i + 1]
            if marker == 0xFF:
                i += 1
                continue
            if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
                i += 2
                continue
            if marker == 0xD9:
                break
            seg_len = struct.unpack(">H", data[i + 2 : i + 4])[0]
            if seg_len < 2 or i + 2 + seg_len > n:
                return None
            body = data[i + 4 : i + 2 + seg_len]
            if marker == 0xDB:  # DQT
                p = 0
                while p < len(body):
                    pq, tq = body[p] >> 4, body[p] & 0x0F
                    p += 1
                    m = 64 * (2 if pq else 1)
                    if p + m > len(body) or tq > 3:
                        return None
                    raw = (
                        np.frombuffer(body[p : p + m], dtype=">u2")
                        if pq
                        else np.frombuffer(body[p : p + m], dtype=np.uint8)
                    ).astype(np.int32)
                    tbl = np.zeros(64, dtype=np.int32)
                    tbl[_JPEG_ZIGZAG] = raw
                    qt[tq] = tbl.reshape(8, 8)
                    p += m
            elif marker == 0xC4:  # DHT (tables may be redefined per scan)
                p = 0
                while p + 17 <= len(body):
                    tc, th = body[p] >> 4, body[p] & 0x0F
                    counts = body[p + 1 : p + 17]
                    nsym = sum(counts)
                    if p + 17 + nsym > len(body) or th > 3:
                        return None
                    table = _jpeg_huff_table(counts, body[p + 17 : p + 17 + nsym])
                    (huff_ac if tc else huff_dc)[th] = table
                    p += 17 + nsym
            elif marker in (0xC0, 0xC1, 0xC2):  # sequential / progressive
                if len(body) < 6 or body[0] != 8:
                    return None
                h, w = struct.unpack(">HH", body[1:5])
                nc = body[5]
                if nc not in (1, 3, 4) or len(body) < 6 + 3 * nc or not (w and h):
                    return None
                if w * h > 64_000_000:
                    return None
                comps = []
                for c in range(nc):
                    cid = body[6 + 3 * c]
                    hv = body[7 + 3 * c]
                    comps.append((cid, hv >> 4, hv & 0x0F, body[8 + 3 * c]))
                frame = (w, h, comps, marker == 0xC2)
            elif marker == 0xC3:  # lossless: own predictive scan walk
                return _jpeg_lossless_scan(data)
            elif marker == 0xDE:  # DHP: hierarchical pyramid walk
                return _jpeg_hierarchical(data)
            elif marker in (0xC9, 0xCA):  # arithmetic: own walker
                return _jpeg_arith(data)
            elif marker == 0xCB:  # lossless arithmetic: own walker
                return _jpeg_lossless_arith_scan(data)
            elif marker in _JPEG_SOF:  # stray differential frames
                return None  # metadata-only
            elif marker == 0xEE:  # APP14 (Adobe): color-transform flag
                if len(body) >= 12 and body[:5] == b"Adobe":
                    adobe_transform = body[11]
            elif marker == 0xDD:  # DRI
                if len(body) < 2:
                    return None
                restart_interval = struct.unpack(">H", body[:2])[0]
            elif marker == 0xDA:  # SOS
                if frame is None or len(body) < 4:
                    return None
                ns = body[0]
                if not (1 <= ns <= len(frame[2])) or len(body) < 1 + 2 * ns + 3:
                    return None
                ids = [c[0] for c in frame[2]]
                sel = []
                for s in range(ns):
                    cs = body[1 + 2 * s]
                    if cs not in ids:
                        return None
                    td, ta = body[2 + 2 * s] >> 4, body[2 + 2 * s] & 0x0F
                    sel.append((ids.index(cs), td, ta))
                ss, se = body[1 + 2 * ns], body[2 + 2 * ns]
                ah, al = body[3 + 2 * ns] >> 4, body[3 + 2 * ns] & 0x0F
                if ss > se or se > 63:
                    return None
                if frame[3]:  # progressive scan-header rules (T.81 G.1)
                    if ss == 0 and se != 0:
                        return None  # DC scans carry only coefficient 0
                    if ss > 0 and ns != 1:
                        return None  # AC scans are single-component
                elif (ss, se, ah) != (0, 63, 0):
                    return None  # sequential scans span the full band
                # (missing Huffman tables surface as a fail-soft KeyError
                # at decode time, matching the truncation contract)
                # gather the entropy intervals for this scan
                intervals: list[bytes] = []
                cur = bytearray()
                p = i + 2 + seg_len
                while p < n:
                    b = data[p]
                    if b != 0xFF:
                        cur.append(b)
                        p += 1
                        continue
                    m2 = data[p + 1] if p + 1 < n else 0xD9
                    if m2 == 0x00:
                        cur.append(0xFF)
                        p += 2
                    elif 0xD0 <= m2 <= 0xD7:
                        intervals.append(bytes(cur))
                        cur = bytearray()
                        p += 2
                    else:
                        break
                intervals.append(bytes(cur))
                scans.append((list(sel), ss, se, ah, al, intervals))
                i = p
                continue
            i += 2 + seg_len
        if not scans or frame is None:
            return None

        w, h, comps, progressive = frame
        for hi, vi in ((c[1], c[2]) for c in comps):
            if not (1 <= hi <= 2 and 1 <= vi <= 2):
                return None
        for c in comps:
            if c[3] not in qt:
                return None

        hmax = max(c[1] for c in comps)
        vmax = max(c[2] for c in comps)
        mcus_x = -(-w // (8 * hmax))
        mcus_y = -(-h // (8 * vmax))

        # per component: MCU-padded coefficient grid (bw, bh) plus the
        # tighter true block dims (cbw, cbh) non-interleaved scans walk
        grids = []
        coeffs = []
        for _, hi, vi, _tq in comps:
            bw, bh = mcus_x * hi, mcus_y * vi
            comp_w = -(-(w * hi) // hmax)
            comp_h = -(-(h * vi) // vmax)
            grids.append((bw, bh, -(-comp_w // 8), -(-comp_h // 8)))
            coeffs.append(np.zeros((bh * bw, 64), dtype=np.int32))

        decoded_units = 0
        for scan in scans:
            decoded_units += _jpeg_scan_units(
                scan, comps, grids, coeffs, huff_dc, huff_ac,
                mcus_x, mcus_y, restart_interval, progressive,
            )
        if decoded_units == 0:
            return None

        return _jpeg_reconstruct(
            w, h, comps, grids, coeffs, qt, adobe_transform, hmax, vmax
        )
    except Exception:
        # fail-closed: a malformed payload must never kill the Spark
        # task — unrecognized/corrupt streams degrade to metadata-only
        return None


def _jpeg_arith(data: bytes):
    """ARITHMETIC-coded JPEG pixel decode — sequential (SOF9) AND
    progressive (SOF10): QM coder + Annex F/G conditioning models
    (sources/arithcode.py), DAC conditioning segments (defaults L=0,
    U=1, Kx=5), restart markers (full stats + coder re-init per
    interval; every scan re-inits regardless), progressive scan
    dispatch (DC first/refine, per-component AC first/refine with
    spectral selection + successive approximation), then the shared
    dequant/IDCT/color assembly. Lossless arithmetic (SOF11) routes to
    :func:`_jpeg_lossless_arith_scan` instead."""
    import numpy as np

    from . import arithcode as ARC

    try:
        qt: dict[int, "np.ndarray"] = {}
        dc_cond: dict[int, tuple[int, int]] = {}  # th -> (L, U)
        ac_cond: dict[int, int] = {}  # th -> Kx
        frame = None
        restart_interval = 0
        adobe_transform = None
        scans = []  # (sel, entropy_start, dc_cond, ac_cond, dri)

        i, n = 2, len(data)
        while i + 4 <= n:
            if data[i] != 0xFF:
                i += 1
                continue
            marker = data[i + 1]
            if marker == 0xFF:
                i += 1
                continue
            if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
                i += 2
                continue
            if marker == 0xD9:
                break
            seg_len = struct.unpack(">H", data[i + 2 : i + 4])[0]
            if seg_len < 2 or i + 2 + seg_len > n:
                return None
            body = data[i + 4 : i + 2 + seg_len]
            if marker == 0xDB:  # DQT
                p = 0
                while p < len(body):
                    pq, tq = body[p] >> 4, body[p] & 0x0F
                    p += 1
                    m = 64 * (2 if pq else 1)
                    if p + m > len(body) or tq > 3:
                        return None
                    raw = (
                        np.frombuffer(body[p : p + m], dtype=">u2")
                        if pq
                        else np.frombuffer(body[p : p + m], dtype=np.uint8)
                    ).astype(np.int32)
                    tbl = np.zeros(64, dtype=np.int32)
                    tbl[_JPEG_ZIGZAG] = raw
                    qt[tq] = tbl.reshape(8, 8)
                    p += m
            elif marker == 0xCC:  # DAC conditioning
                p = 0
                while p + 2 <= len(body):
                    tc, th = body[p] >> 4, body[p] & 0x0F
                    v = body[p + 1]
                    if tc == 0:
                        dc_cond[th] = (v & 0x0F, v >> 4)  # (L, U)
                    else:
                        ac_cond[th] = v  # Kx
                    p += 2
            elif marker in (0xC9, 0xCA):  # sequential / progressive arith
                if len(body) < 6 or body[0] != 8:
                    return None
                h, w = struct.unpack(">HH", body[1:5])
                nc = body[5]
                if nc not in (1, 3, 4) or len(body) < 6 + 3 * nc or not (w and h):
                    return None
                if w * h > 64_000_000:
                    return None
                comps = []
                for c in range(nc):
                    cid = body[6 + 3 * c]
                    hv = body[7 + 3 * c]
                    comps.append((cid, hv >> 4, hv & 0x0F, body[8 + 3 * c]))
                frame = (w, h, comps, marker == 0xCA)
            elif marker in _JPEG_SOF:
                return None  # progressive/lossless arithmetic: metadata-only
            elif marker == 0xEE:
                if len(body) >= 12 and body[:5] == b"Adobe":
                    adobe_transform = body[11]
            elif marker == 0xDD:
                if len(body) < 2:
                    return None
                restart_interval = struct.unpack(">H", body[:2])[0]
            elif marker == 0xDA:  # SOS (interleaved when ns > 1,
                # per-component block walk when ns == 1); every scan
                # re-inits the coder and its statistics
                if frame is None or len(body) < 4:
                    return None
                ns = body[0]
                if not (1 <= ns <= len(frame[2])) or len(body) < 1 + 2 * ns + 3:
                    return None
                ids = [c[0] for c in frame[2]]
                sel = []
                for s in range(ns):
                    cs = body[1 + 2 * s]
                    if cs not in ids:
                        return None
                    td, ta = body[2 + 2 * s] >> 4, body[2 + 2 * s] & 0x0F
                    sel.append((ids.index(cs), td, ta))
                ss, se = body[1 + 2 * ns], body[2 + 2 * ns]
                ah, al = body[3 + 2 * ns] >> 4, body[3 + 2 * ns] & 0x0F
                if frame[3]:  # progressive scan-header rules (G.1)
                    if ss > se or se > 63:
                        return None
                    if ss == 0 and se != 0:
                        return None  # DC scans carry only coefficient 0
                    if ss > 0 and ns != 1:
                        return None  # AC scans are single-component
                elif (ss, se, ah) != (0, 63, 0):
                    return None  # sequential scans span the full band
                scans.append((sel, i + 2 + seg_len, dict(dc_cond),
                              dict(ac_cond), restart_interval,
                              (ss, se, ah, al)))
                # skip the entropy data: markers terminate it, 0xFF00
                # is a stuffed data byte, RSTn continues the scan
                p = i + 2 + seg_len
                while p + 1 < n:
                    if data[p] != 0xFF:
                        p += 1
                    elif data[p + 1] == 0x00 or data[p + 1] == 0xFF:
                        p += 2 if data[p + 1] == 0x00 else 1
                    elif 0xD0 <= data[p + 1] <= 0xD7:
                        p += 2
                    else:
                        break
                i = p
                continue
            i += 2 + seg_len
        if frame is None or not scans:
            return None

        w, h, comps, _progressive = frame
        for hi, vi in ((c[1], c[2]) for c in comps):
            if not (1 <= hi <= 2 and 1 <= vi <= 2):
                return None
        for c in comps:
            if c[3] not in qt:
                return None

        hmax = max(c[1] for c in comps)
        vmax = max(c[2] for c in comps)
        mcus_x = -(-w // (8 * hmax))
        mcus_y = -(-h // (8 * vmax))
        grids = []
        coeffs = []
        for _, hi, vi, _tq in comps:
            bw, bh = mcus_x * hi, mcus_y * vi
            comp_w = -(-(w * hi) // hmax)
            comp_h = -(-(h * vi) // vmax)
            grids.append((bw, bh, -(-comp_w // 8), -(-comp_h // 8)))
            coeffs.append(np.zeros((bh * bw, 64), dtype=np.int32))

        nc = len(comps)
        zz = _JPEG_ZIGZAG

        for sel, pos, sdc_cond, sac_cond, dri, (ss, se, ah, al) in scans:

            def fresh(start):
                dec = ARC.ArithDecoder(data, start)
                dstats = {td: bytearray(ARC.DC_STAT_BINS) for _, td, _ in sel}
                astats = {ta: bytearray(ARC.AC_STAT_BINS) for _, _, ta in sel}
                fixed = bytearray([ARC.FIXED_BIN])
                return dec, dstats, astats, fixed, [0] * nc, [0] * nc

            def decode_block(dec, dstats, astats, fixed, dctx, pred,
                             ci, td, ta, idx):
                """One block of THIS scan: sequential scans decode
                DC+AC; progressive scans dispatch on (ss, ah)."""
                row = coeffs[ci][idx]
                if ss == 0:
                    if ah == 0:  # DC first (sequential when se == 63)
                        L, U = sdc_cond.get(td, (0, 1))
                        diff = ARC.decode_dc(dec, dstats[td], dctx, ci, L, U)
                        pred[ci] += diff
                        row[0] = pred[ci] << al
                    else:  # DC refinement: one fixed-bin bit
                        if ARC.decode_dc_refine(dec, fixed):
                            row[0] |= 1 << al
                    if se == 0:
                        return
                Kx = sac_cond.get(ta, 5)
                lo = max(ss, 1)
                if ah == 0:  # AC first (or the sequential AC band)
                    blk_zz = [0] * 64
                    ARC.decode_ac(
                        dec, astats[ta], fixed, blk_zz, Kx, lo, se, al
                    )
                    row[zz[lo : se + 1]] = blk_zz[lo : se + 1]
                else:  # AC refinement over the band, in place
                    blk_zz = [0] * 64
                    blk_zz[lo : se + 1] = [
                        int(v) for v in row[zz[lo : se + 1]]
                    ]
                    ARC.decode_ac_refine(
                        dec, astats[ta], fixed, blk_zz, lo, se, al
                    )
                    row[zz[lo : se + 1]] = blk_zz[lo : se + 1]

            def restart(dec):
                # skip to the RST marker, re-init coder + ALL stats
                p = dec.pos
                while p + 1 < n and not (
                    data[p] == 0xFF and 0xD0 <= data[p + 1] <= 0xD7
                ):
                    p += 1
                if p + 1 >= n:
                    raise ValueError("missing restart marker")
                return fresh(p + 2)

            state = fresh(pos)
            since_restart = 0
            if len(sel) == 1:
                # non-interleaved: walk the component's TRUE block grid
                ci, td, ta = sel[0]
                bwb, _bh, cbw, cbh = grids[ci]
                for unit in range(cbw * cbh):
                    if dri and since_restart == dri:
                        state = restart(state[0])
                        since_restart = 0
                    by, bx = divmod(unit, cbw)
                    decode_block(*state, ci, td, ta, by * bwb + bx)
                    since_restart += 1
            else:
                for mcu in range(mcus_x * mcus_y):
                    if dri and since_restart == dri:
                        state = restart(state[0])
                        since_restart = 0
                    my, mx = divmod(mcu, mcus_x)
                    for ci, td, ta in sel:
                        _, hi, vi, _tq = comps[ci]
                        bwb = grids[ci][0]
                        for by in range(vi):
                            for bx in range(hi):
                                idx = (my * vi + by) * bwb + (mx * hi + bx)
                                decode_block(*state, ci, td, ta, idx)
                    since_restart += 1

        return _jpeg_reconstruct(
            w, h, comps, grids, coeffs, qt, adobe_transform, hmax, vmax
        )
    except Exception:
        return None  # fail-closed, same contract as the Huffman path


def _jpeg_reconstruct(w, h, comps, grids, coeffs, qt, adobe_transform,
                      hmax, vmax):
    """Dequant + IDCT + upsample + color-transform assembly shared by
    the Huffman and arithmetic (SOF9) sequential paths."""
    import numpy as np

    t_mat = _jpeg_idct_matrix()
    planes = []
    for ci, (_, hi, vi, tq) in enumerate(comps):
        bw, bh = grids[ci][0], grids[ci][1]
        deq = coeffs[ci].reshape(-1, 8, 8) * qt[tq][None, :, :]
        spatial = np.einsum(
            "ux,nuv,vy->nxy", t_mat, deq.astype(np.float64), t_mat
        )
        blocks = np.clip(np.round(spatial) + 128, 0, 255).astype(np.uint8)
        plane = (
            blocks.reshape(bh, bw, 8, 8)
            .transpose(0, 2, 1, 3)
            .reshape(bh * 8, bw * 8)
        )
        # upsample to full resolution (nearest, the baseline norm)
        if hi < hmax:
            plane = np.repeat(plane, hmax // hi, axis=1)
        if vi < vmax:
            plane = np.repeat(plane, vmax // vi, axis=0)
        planes.append(plane[:h, :w])

    if len(planes) == 1:
        return planes[0][:, :, None].copy()
    if len(planes) == 4:
        # CMYK output AS THE CODESTREAM ENCODES IT (4 channels) —
        # ink interpretation (Adobe inversion etc.) is
        # producer-dependent and stays with the caller. YCCK
        # (APP14 transform 2) un-rotates the first three planes
        # through the YCbCr inverse back to CMY; transform 0 or no
        # APP14 is direct CMYK.
        if adobe_transform == 2:
            y, cb, cr = (p.astype(np.float64) for p in planes[:3])
            c0 = y + 1.402 * (cr - 128)
            c1 = y - 0.344136 * (cb - 128) - 0.714136 * (cr - 128)
            c2 = y + 1.772 * (cb - 128)
            cmy = [
                np.clip(np.round(c), 0, 255).astype(np.uint8)
                for c in (c0, c1, c2)
            ]
            return np.stack(cmy + [planes[3]], axis=2)
        return np.stack(planes, axis=2)
    y, cb, cr = (p.astype(np.float64) for p in planes)
    r = y + 1.402 * (cr - 128)
    g = y - 0.344136 * (cb - 128) - 0.714136 * (cr - 128)
    b = y + 1.772 * (cb - 128)
    return np.clip(
        np.round(np.stack([r, g, b], axis=2)), 0, 255
    ).astype(np.uint8)


def decode_image(data: bytes) -> ImageInfo | None:
    """Sniff + decode any supported image container; None if none match
    (caller decides: strict raise vs deterministic stub)."""
    if not data:
        return None
    for dec in (decode_png, decode_jpeg, decode_gif, decode_bmp):
        info = dec(data)
        if info is not None:
            return info
    return None


# Adam7 interlace passes: (row_start, row_step, col_start, col_step)
_PNG_ADAM7 = (
    (0, 8, 0, 8), (0, 8, 4, 8), (4, 8, 0, 4), (0, 4, 2, 4),
    (2, 4, 0, 2), (0, 2, 1, 2), (1, 2, 0, 1),
)


def _png_unfilter(raw: bytes, h: int, stride: int, bpp: int):
    """Reconstruct ``h`` scanlines of ``stride`` bytes from the
    filtered stream (filter byte + data per line, filters 0-4, T.81—er,
    RFC 2083 §6). ``bpp`` is the filter distance in bytes. Returns the
    (h, stride) uint8 array or None. Filters None/Sub/Up are whole-row
    numpy ops (Sub is a cumsum over bpp-strided groups mod 256);
    Average/Paeth loop over pixel groups within the row only."""
    import numpy as np

    if len(raw) != h * (stride + 1) or stride % bpp:
        return None
    rows = np.frombuffer(raw, dtype=np.uint8).reshape(h, stride + 1)
    filters, lines = rows[:, 0], rows[:, 1:].astype(np.int32)
    recon = np.zeros((h, stride), dtype=np.uint8)
    zero = np.zeros(stride, dtype=np.int32)
    groups = stride // bpp
    for y in range(h):
        f, line = filters[y], lines[y]
        prev = recon[y - 1].astype(np.int32) if y else zero
        if f == 0:
            out = line % 256
        elif f == 1:  # Sub: recon[x] = line[x] + recon[x-bpp]
            out = (np.cumsum(line.reshape(groups, bpp), axis=0) % 256).reshape(stride)
        elif f == 2:  # Up
            out = (line + prev) % 256
        elif f in (3, 4):  # Average / Paeth: left-neighbor dependency
            out = np.zeros(stride, dtype=np.int32)
            left = np.zeros(bpp, dtype=np.int32)
            upleft = np.zeros(bpp, dtype=np.int32)
            for x in range(groups):
                seg = slice(x * bpp, (x + 1) * bpp)
                up = prev[seg]
                if f == 3:
                    pred = (left + up) // 2
                else:
                    p = left + up - upleft
                    pa, pb, pc = (
                        np.abs(p - left), np.abs(p - up), np.abs(p - upleft)
                    )
                    pred = np.where(
                        (pa <= pb) & (pa <= pc), left, np.where(pb <= pc, up, upleft)
                    )
                out[seg] = (line[seg] + pred) % 256
                left, upleft = out[seg], up
        else:
            return None
        recon[y] = out.astype(np.uint8)
    return recon


def _png_samples(recon, w: int, h: int, ch: int, depth: int):
    """(h, stride) filtered-out bytes -> (h, w, ch) uint8 samples.
    16-bit takes the high byte (the standard 8-bit downscale); 1/2/4-bit
    unpack MSB-first within each scanline."""
    import numpy as np

    if depth == 8:
        return recon.reshape(h, w, ch)
    if depth == 16:
        return recon.reshape(h, w, ch, 2)[:, :, :, 0].copy()
    bits = np.unpackbits(recon, axis=1)[:, : w * ch * depth]
    vals = bits.reshape(h, w * ch, depth)
    weights = (1 << np.arange(depth - 1, -1, -1)).astype(np.uint8)
    return (vals * weights).sum(axis=2, dtype=np.uint16).astype(np.uint8).reshape(
        h, w, ch
    )


def decode_png_pixels(data: bytes):
    """Full PNG pixel decode, pure stdlib (zlib) + numpy: concatenated
    IDAT inflate, per-scanline unfilter (all five filter types 0-4),
    every legal bit depth (1/2/4/8/16 — 16-bit downscales to 8), Adam7
    interlace, palette expansion via PLTE. Returns a (height, width,
    channels) uint8 ndarray, or None for corrupt streams."""
    import zlib

    import numpy as np

    info = decode_png(data)
    if info is None:
        return None
    if info.width * info.height > 64_000_000:  # untrusted header bound
        return None
    depth, color_type, interlace = data[24], data[25], data[28]
    if depth not in (1, 2, 4, 8, 16) or interlace not in (0, 1):
        return None
    if depth < 8 and color_type not in (0, 3):
        return None  # sub-byte depths are gray/palette only (spec)
    if depth == 16 and color_type == 3:
        return None

    idat = bytearray()
    plte = None
    pos = 8
    while pos + 8 <= len(data):
        (ln,) = struct.unpack(">I", data[pos : pos + 4])
        ctype = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + ln]
        if ctype == b"IDAT":
            idat += body
        elif ctype == b"PLTE":
            plte = body
        elif ctype == b"IEND":
            break
        pos += 12 + ln
    w, h, ch = info.width, info.height, info.channels
    bpp = max(1, ch * depth // 8)

    def pass_stride(pw: int) -> int:
        return (pw * ch * depth + 7) // 8

    # exact expected filtered size bounds the inflate — a tiny
    # zip-bomb IDAT must not balloon memory past what the (already
    # pixel-capped) header promises
    if interlace == 0:
        expected = h * (pass_stride(w) + 1)
    else:
        expected = sum(
            ph * (pass_stride(pw) + 1)
            for y0, dy, x0, dx in _PNG_ADAM7
            for pw in [(w - x0 + dx - 1) // dx]
            for ph in [(h - y0 + dy - 1) // dy]
            if pw and ph
        )
    try:
        raw = zlib.decompressobj().decompress(bytes(idat), expected + 1)
    except zlib.error:
        return None
    if len(raw) > expected:
        return None

    if interlace == 0:
        recon = _png_unfilter(raw, h, pass_stride(w), bpp)
        if recon is None:
            return None
        img = _png_samples(recon, w, h, ch, depth)
    else:  # Adam7: seven independently-filtered sub-images
        img = np.zeros((h, w, ch), dtype=np.uint8)
        off = 0
        for y0, dy, x0, dx in _PNG_ADAM7:
            pw = (w - x0 + dx - 1) // dx
            ph = (h - y0 + dy - 1) // dy
            if not pw or not ph:
                continue
            stride = pass_stride(pw)
            seg = raw[off : off + ph * (stride + 1)]
            off += ph * (stride + 1)
            recon = _png_unfilter(seg, ph, stride, bpp)
            if recon is None:
                return None
            img[y0::dy, x0::dx] = _png_samples(recon, pw, ph, ch, depth)
        if off != len(raw):
            return None

    if color_type == 3:  # palette indexes -> RGB
        if plte is None or len(plte) < 3:
            return None
        pal = np.frombuffer(plte, dtype=np.uint8)
        pal = pal[: (len(pal) // 3) * 3].reshape(-1, 3)
        idx = img[:, :, 0]
        if idx.max() >= len(pal):
            return None
        return pal[idx]
    if depth < 8:  # grayscale at sub-byte depth: scale to full range
        return (img.astype(np.uint16) * (255 // ((1 << depth) - 1))).astype(
            np.uint8
        )
    return img


# ------------------------------------------------------------------- audio


def decode_wav(data: bytes) -> AudioInfo | None:
    """RIFF/WAVE fmt + data chunk walk. Stats (rms/peak, normalized to
    [0,1]) are computed for integer PCM at 8 (unsigned), 16, 24 and 32
    bits and IEEE-float at 32/64 bits; other encodings (ADPCM, µ-law)
    return header fields with zero stats rather than failing."""
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        return None
    pos, n = 12, len(data)
    channels = rate = bits = None
    audio_fmt = None
    pcm = None
    while pos + 8 <= n:
        cid = data[pos : pos + 4]
        size = struct.unpack("<I", data[pos + 4 : pos + 8])[0]
        body = data[pos + 8 : pos + 8 + size]
        if cid == b"fmt " and len(body) >= 16:
            audio_fmt, channels, rate = struct.unpack("<HHI", body[:8])
            bits = struct.unpack("<H", body[14:16])[0]
        elif cid == b"data":
            pcm = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if not (channels and rate and bits is not None) or pcm is None:
        return None
    bytes_per_frame = channels * max(bits, 8) // 8
    n_samples = len(pcm) // bytes_per_frame if bytes_per_frame else 0
    duration_ms = int(n_samples * 1000 // rate) if rate else 0
    rms = peak = 0.0
    if n_samples:
        import numpy as np

        x = _pcm_to_float(pcm[: n_samples * bytes_per_frame], audio_fmt, bits)
        if x is not None and len(x) and np.isfinite(x).all():
            rms = float(np.sqrt(np.mean(x * x)))
            peak = float(np.max(np.abs(x)))
    return AudioInfo("wav", channels, rate, bits, n_samples, duration_ms, rms, peak)


def _pcm_to_float(buf: bytes, audio_fmt: int, bits: int):
    """Raw PCM frames -> float64 samples in [-1, 1] (interleaved across
    channels); None for encodings outside integer/float PCM."""
    import numpy as np

    if audio_fmt == 1 and bits == 16:
        return np.frombuffer(buf, dtype="<i2").astype(np.float64) / 32768.0
    if audio_fmt == 1 and bits == 8:  # 8-bit PCM is unsigned
        return (np.frombuffer(buf, dtype=np.uint8).astype(np.float64) - 128.0) / 128.0
    if audio_fmt == 1 and bits == 24:
        b = np.frombuffer(buf, dtype=np.uint8)
        b = b[: len(b) // 3 * 3].reshape(-1, 3).astype(np.int64)
        v = b[:, 0] | (b[:, 1] << 8) | (b[:, 2] << 16)
        v = np.where(v >= 1 << 23, v - (1 << 24), v)
        return v.astype(np.float64) / float(1 << 23)
    if audio_fmt == 1 and bits == 32:
        return np.frombuffer(buf, dtype="<i4").astype(np.float64) / float(1 << 31)
    if audio_fmt == 3 and bits == 32:  # IEEE float
        return np.frombuffer(buf, dtype="<f4").astype(np.float64)
    if audio_fmt == 3 and bits == 64:
        return np.frombuffer(buf, dtype="<f8")
    return None


def decode_wav_samples(data: bytes):
    """(AudioInfo, float64 samples averaged to mono) for integer/float
    PCM WAVs — the raw material for windowed segment features; None for
    non-WAV or non-PCM payloads."""
    import numpy as np

    info = decode_wav(data)
    if info is None or not info.n_samples:
        return None
    if len(data) < 12:
        return None
    # re-walk for the data chunk (decode_wav validated the layout)
    pos, n = 12, len(data)
    audio_fmt = None
    pcm = None
    while pos + 8 <= n:
        cid = data[pos : pos + 4]
        size = struct.unpack("<I", data[pos + 4 : pos + 8])[0]
        if cid == b"fmt " and size >= 16 and pos + 10 <= n:
            # mirror decode_wav's guard: ignore short/trailing fmt chunks
            audio_fmt = struct.unpack("<H", data[pos + 8 : pos + 10])[0]
        elif cid == b"data":
            pcm = data[pos + 8 : pos + 8 + size]
        pos += 8 + size + (size & 1)
    if pcm is None or audio_fmt is None:
        return None
    frame_bytes = info.channels * max(info.bits_per_sample, 8) // 8
    x = _pcm_to_float(pcm[: info.n_samples * frame_bytes], audio_fmt, info.bits_per_sample)
    if x is None or not len(x) or not np.isfinite(x).all():
        return None
    if info.channels > 1:
        x = x[: len(x) // info.channels * info.channels]
        x = x.reshape(-1, info.channels).mean(axis=1)
    return info, x


def _flac_info_samples(data: bytes):
    """(AudioInfo, per-channel int samples, bps) for a FLAC payload, or
    None for non-FLAC/corrupt bytes (lax — the fuzz contract)."""
    if len(data) < 4 or data[:4] != b"fLaC":
        return None
    from . import flac as FL

    import numpy as np

    try:
        fi, s = FL.decode_flac(data)
    except FL.FlacError:
        return None
    if not len(s):
        return None
    x = s.astype(np.float64) / float(1 << (fi.bits_per_sample - 1))
    rms = float(np.sqrt(np.mean(x * x)))
    peak = float(np.max(np.abs(x)))
    dur = int(len(s) * 1000 // fi.sample_rate) if fi.sample_rate else 0
    info = AudioInfo(
        "flac", fi.channels, fi.sample_rate, fi.bits_per_sample,
        len(s), dur, rms, peak,
    )
    return info, x


def decode_image_pixels(data: bytes):
    """(format, pixels (h, w, c) uint8 | None) for any recognized image
    payload — the dispatch image_features applies inline (PNG decodes
    every legal layout; BMP/GIF/JPEG variants outside the pixel
    decoders return metadata-format with None pixels). Never raises."""
    info = decode_image(data)
    if info is None:
        return None, None
    img = None
    if info.format == "png":
        img = decode_png_pixels(data)
    elif info.format == "bmp":
        img = decode_bmp_pixels(data)
    elif info.format == "gif":
        img = decode_gif_pixels(data)
    elif info.format == "jpeg":
        img = decode_jpeg_pixels(data)
    return info.format, img


# MPEG-1 Layer III (ISO 11172-3) header tables: bitrate kbps by index,
# sample rate by index
_MP3_BITRATES = (0, 32, 40, 48, 56, 64, 80, 96, 112, 128,
                 160, 192, 224, 256, 320)
_MP3_RATES = (44100, 48000, 32000)


def decode_mp3(data: bytes) -> AudioInfo | None:
    """MPEG-1 Layer III METADATA-ONLY decode: ID3v2 skip + frame-header
    walk (sync, bitrate/sample-rate tables, padding, mode) → channels,
    sample rate, sample count (1152/frame) and duration. No PCM
    synthesis (the polyphase window is out of container scope — same
    boundary as h264 video), so rms/peak are 0. None for non-MP3 bytes;
    lax on truncation (keeps the valid frame prefix). Never raises."""
    pos = 0
    n = len(data)
    if n >= 10 and data[:3] == b"ID3":
        size = 0
        for b in data[6:10]:
            size = (size << 7) | (b & 0x7F)  # syncsafe
        pos = 10 + size
    frames = 0
    rate = channels = 0
    while pos + 4 <= n:
        h = struct.unpack(">I", data[pos : pos + 4])[0]
        if (h >> 21) != 0x7FF:
            break
        if (h >> 19) & 3 != 3 or (h >> 17) & 3 != 1:
            break  # not MPEG-1 Layer III
        br_idx = (h >> 12) & 0xF
        sr_idx = (h >> 10) & 3
        if br_idx in (0, 15) or sr_idx == 3:
            break  # free-format/invalid
        bitrate = _MP3_BITRATES[br_idx]
        rate = _MP3_RATES[sr_idx]
        padding = (h >> 9) & 1
        mode = (h >> 6) & 3
        channels = 1 if mode == 3 else 2
        flen = 144 * bitrate * 1000 // rate + padding
        if flen < 4 or pos + flen > n:
            break  # truncated final frame: keep the prefix
        frames += 1
        pos += flen
    if not frames:
        return None
    n_samples = frames * 1152
    return AudioInfo(
        "mp3", channels, rate, 0, n_samples,
        int(n_samples * 1000 // rate) if rate else 0, 0.0, 0.0,
    )


def decode_audio(data: bytes) -> AudioInfo | None:
    """Audio metadata + loudness for any supported codec: RIFF/WAV
    (PCM int/float), FLAC (full decode) or MP3 (header metadata).
    None for anything else — never raises."""
    if len(data) >= 4 and data[:4] == b"fLaC":
        out = _flac_info_samples(data)
        return out[0] if out else None
    wav = decode_wav(data)
    if wav is not None:
        return wav
    return decode_mp3(data)


def decode_audio_samples(data: bytes):
    """(AudioInfo, float64 mono samples in [-1, 1]) for WAV or FLAC
    payloads; None otherwise — never raises."""
    if len(data) >= 4 and data[:4] == b"fLaC":
        out = _flac_info_samples(data)
        if out is None:
            return None
        info, x = out
        return info, x.mean(axis=1)
    return decode_wav_samples(data)


# ------------------------------------------------------------------- video


class VideoInfo(NamedTuple):
    format: str  # "mp4"
    duration_ms: int
    width: int  # 0 when no video track header found
    height: int
    n_tracks: int


def _mp4_boxes(data: bytes, lo: int, hi: int):
    """Yield (type, body_lo, body_hi) for the boxes in data[lo:hi]."""
    pos = lo
    while pos + 8 <= hi:
        size = struct.unpack(">I", data[pos : pos + 4])[0]
        btype = data[pos + 4 : pos + 8]
        body = pos + 8
        if size == 1:  # 64-bit largesize
            if pos + 16 > hi:
                return
            size = struct.unpack(">Q", data[pos + 8 : pos + 16])[0]
            body = pos + 16
        elif size == 0:  # box extends to end
            size = hi - pos
        if size < 8 or pos + size > hi:
            return
        yield btype, body, pos + size
        pos += size


class Mp4Sample(NamedTuple):
    offset: int  # absolute file offset of the sample payload
    size: int
    ts_ms: int  # decode timestamp


class Mp4Track(NamedTuple):
    codec: str  # stsd first-entry fourcc, e.g. "jpeg"
    samples: list  # list[Mp4Sample]


def _mp4_child(data: bytes, lo: int, hi: int, btype: bytes):
    for t, clo, chi in _mp4_boxes(data, lo, hi):
        if t == btype:
            return clo, chi
    return None


def mp4_video_track(data: bytes, max_samples: int = 100_000) -> Mp4Track | None:
    """Walk the first video track's sample tables (stsd codec, stsz
    sizes, stsc sample→chunk mapping, stco/co64 chunk offsets, stts
    decode times) and return absolute byte ranges + timestamps for its
    samples — the real plumbing frame extraction needs. Pure box math;
    no codec work. Returns None when any table is missing/garbled
    (fail-closed like the other decoders)."""
    try:
        if len(data) < 12 or data[4:8] != b"ftyp":
            return None
        moov = _mp4_child(data, 0, len(data), b"moov")
        if moov is None:
            return None
        fallback_track: Mp4Track | None = None
        for ttype, tlo, thi in _mp4_boxes(data, *moov):
            if ttype != b"trak":
                continue
            mdia = _mp4_child(data, tlo, thi, b"mdia")
            if mdia is None:
                continue
            mdhd = _mp4_child(data, *mdia, b"mdhd")
            minf = _mp4_child(data, *mdia, b"minf")
            if mdhd is None or minf is None:
                continue
            version = data[mdhd[0]]
            if version == 1:
                timescale = struct.unpack(">I", data[mdhd[0] + 20 : mdhd[0] + 24])[0]
            else:
                timescale = struct.unpack(">I", data[mdhd[0] + 12 : mdhd[0] + 16])[0]
            stbl = _mp4_child(data, *minf, b"stbl")
            if stbl is None or not timescale:
                continue
            boxes = {t: (lo2, hi2) for t, lo2, hi2 in _mp4_boxes(data, *stbl)}
            stsd = boxes.get(b"stsd")
            if stsd is None or stsd[1] - stsd[0] < 16:
                continue
            codec = data[stsd[0] + 12 : stsd[0] + 16].decode("latin1")
            stsz = boxes.get(b"stsz")
            stsc = boxes.get(b"stsc")
            stco = boxes.get(b"stco") or boxes.get(b"co64")
            co64 = b"co64" in boxes
            stts = boxes.get(b"stts")
            if stsz is None or stsc is None or stco is None:
                continue
            fixed, n_samples = struct.unpack(
                ">II", data[stsz[0] + 4 : stsz[0] + 12]
            )
            n_samples = min(n_samples, max_samples)
            if fixed:
                sizes = [fixed] * n_samples
            else:
                sizes = [
                    struct.unpack(
                        ">I", data[stsz[0] + 12 + 4 * i : stsz[0] + 16 + 4 * i]
                    )[0]
                    for i in range(n_samples)
                ]
            (n_chunks,) = struct.unpack(">I", data[stco[0] + 4 : stco[0] + 8])
            width = 8 if co64 else 4
            fmt = ">Q" if co64 else ">I"
            chunk_offsets = [
                struct.unpack(
                    fmt,
                    data[stco[0] + 8 + width * i : stco[0] + 8 + width * (i + 1)],
                )[0]
                for i in range(min(n_chunks, max_samples))
            ]
            (n_stsc,) = struct.unpack(">I", data[stsc[0] + 4 : stsc[0] + 8])
            stsc_rows = [
                struct.unpack(
                    ">III", data[stsc[0] + 8 + 12 * i : stsc[0] + 20 + 12 * i]
                )
                for i in range(min(n_stsc, max_samples))
            ]
            # decode timestamps from stts (durations in timescale units)
            ts: list[int] = []
            if stts is not None:
                (n_stts,) = struct.unpack(">I", data[stts[0] + 4 : stts[0] + 8])
                t = 0
                for i in range(min(n_stts, max_samples)):
                    cnt, dur = struct.unpack(
                        ">II", data[stts[0] + 8 + 8 * i : stts[0] + 16 + 8 * i]
                    )
                    for _ in range(min(cnt, n_samples - len(ts))):
                        ts.append(t * 1000 // timescale)
                        t += dur
                    if len(ts) >= n_samples:
                        break
            while len(ts) < n_samples:
                ts.append(ts[-1] if ts else 0)

            samples: list[Mp4Sample] = []
            si = 0
            for ci, coff in enumerate(chunk_offsets):
                per = 1
                for first_chunk, spc, _desc in stsc_rows:
                    if first_chunk <= ci + 1:  # stsc chunks are 1-based
                        per = spc
                    else:
                        break
                off = coff
                for _ in range(per):
                    if si >= n_samples:
                        break
                    if off + sizes[si] > len(data):
                        return None
                    samples.append(Mp4Sample(off, sizes[si], ts[si]))
                    off += sizes[si]
                    si += 1
            if samples:
                track = Mp4Track(codec, samples)
                if codec in MJPEG_CODECS:  # decodable: prefer outright
                    return track
                if fallback_track is None:
                    fallback_track = track
        return fallback_track
    except Exception:
        return None


# stsd fourccs whose samples are standalone JPEG images
MJPEG_CODECS = ("jpeg", "mjpa", "mjpb")


def decode_mp4(data: bytes) -> VideoInfo | None:
    """ISO BMFF (MP4/MOV) metadata: mvhd timescale+duration and the
    first video track's tkhd 16.16-fixed width/height. Box walk only —
    no sample/codec decode (that stays a stub in multimodal.py)."""
    if len(data) < 12 or data[4:8] != b"ftyp":
        return None
    duration_ms = width = height = n_tracks = 0
    found_moov = False
    for btype, lo, hi in _mp4_boxes(data, 0, len(data)):
        if btype != b"moov":
            continue
        found_moov = True
        for ctype, clo, chi in _mp4_boxes(data, lo, hi):
            if ctype == b"mvhd" and chi - clo >= 20:
                version = data[clo]
                if version == 1 and chi - clo >= 32:
                    timescale = struct.unpack(">I", data[clo + 20 : clo + 24])[0]
                    duration = struct.unpack(">Q", data[clo + 24 : clo + 32])[0]
                else:
                    timescale = struct.unpack(">I", data[clo + 12 : clo + 16])[0]
                    duration = struct.unpack(">I", data[clo + 16 : clo + 20])[0]
                if timescale:
                    duration_ms = int(duration * 1000 // timescale)
            elif ctype == b"trak":
                n_tracks += 1
                for ttype, tlo, thi in _mp4_boxes(data, clo, chi):
                    if ttype == b"tkhd" and thi - tlo >= 84:
                        w = struct.unpack(">I", data[thi - 8 : thi - 4])[0] >> 16
                        h = struct.unpack(">I", data[thi - 4 : thi])[0] >> 16
                        if w and h and not width:
                            width, height = w, h
    if not found_moov:
        return None
    return VideoInfo("mp4", duration_ms, width, height, n_tracks)
