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


def decode_bmp_pixels(data: bytes):
    """Uncompressed BMP pixel decode (24/32-bit BITMAPINFOHEADER DIBs —
    the overwhelmingly common on-disk layouts): raw bottom-up BGR(A)
    rows padded to 4-byte boundaries, returned as (height, width,
    channels) uint8 in RGB(A) order. Compressed (RLE) or paletted BMPs
    return None."""
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
    if bpp not in (24, 32) or compression not in (0, 3):  # BI_RGB/BITFIELDS
        return None
    (pixel_off,) = struct.unpack("<I", data[10:14])
    w, h = info.width, info.height
    nch = bpp // 8
    row_bytes = (w * nch + 3) & ~3  # rows pad to 4-byte boundaries
    need = pixel_off + row_bytes * h
    if len(data) < need:
        return None
    arr = np.frombuffer(data, dtype=np.uint8, count=row_bytes * h, offset=pixel_off)
    rows = arr.reshape(h, row_bytes)[:, : w * nch].reshape(h, w, nch)
    if not top_down:
        rows = rows[::-1]
    # BGR(A) -> RGB(A)
    if nch == 3:
        rows = rows[:, :, [2, 1, 0]]
    else:
        rows = rows[:, :, [2, 1, 0, 3]]
    return np.ascontiguousarray(rows)


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
        if marker in _JPEG_SOF:
            if i + 2 + seg_len > n or seg_len < 8:
                return None
            height, width = struct.unpack(">HH", data[i + 5 : i + 9])
            channels = data[i + 9]
            if not (width and height and channels):
                return None
            return ImageInfo("jpeg", width, height, channels)
        i += 2 + seg_len
    return None


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


def decode_png_pixels(data: bytes):
    """Full PNG pixel decode, pure stdlib (zlib) + numpy: concatenated
    IDAT inflate, per-scanline unfilter (all five filter types 0-4),
    palette expansion via PLTE. Returns a (height, width, channels)
    uint8 ndarray, or None when the payload isn't a PNG this decoder
    covers (bit depth != 8, interlaced, or a corrupt stream).

    Vectorization: filters None/Sub/Up reconstruct as whole-row numpy
    ops (Sub is a cumulative sum over bpp-strided groups mod 256);
    Average/Paeth carry a per-pixel dependency on the left neighbor and
    loop over pixels within the row only — rows stay numpy.
    """
    import zlib

    import numpy as np

    info = decode_png(data)
    if info is None:
        return None
    bit_depth, color_type, interlace = data[24], data[25], data[28]
    if bit_depth != 8 or interlace != 0:
        return None  # 16-bit and Adam7 out of scope (rare in corpora)

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
    try:
        raw = zlib.decompress(bytes(idat))
    except zlib.error:
        return None

    w, h, ch = info.width, info.height, info.channels
    stride = w * ch
    if len(raw) != h * (stride + 1):
        return None
    rows = np.frombuffer(raw, dtype=np.uint8).reshape(h, stride + 1)
    filters, lines = rows[:, 0], rows[:, 1:].astype(np.int32)
    recon = np.zeros((h, stride), dtype=np.uint8)
    zero = np.zeros(stride, dtype=np.int32)
    for y in range(h):
        f, line = filters[y], lines[y]
        prev = recon[y - 1].astype(np.int32) if y else zero
        if f == 0:
            out = line % 256
        elif f == 1:  # Sub: recon[x] = line[x] + recon[x-bpp]
            out = (np.cumsum(line.reshape(w, ch), axis=0) % 256).reshape(stride)
        elif f == 2:  # Up
            out = (line + prev) % 256
        elif f in (3, 4):  # Average / Paeth: left-neighbor dependency
            out = np.zeros(stride, dtype=np.int32)
            left = np.zeros(ch, dtype=np.int32)
            upleft = np.zeros(ch, dtype=np.int32)
            for x in range(w):
                seg = slice(x * ch, (x + 1) * ch)
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

    img = recon.reshape(h, w, ch)
    if color_type == 3:  # palette indexes -> RGB
        if plte is None or len(plte) < 3:
            return None
        pal = np.frombuffer(plte, dtype=np.uint8)
        pal = pal[: (len(pal) // 3) * 3].reshape(-1, 3)
        idx = img[:, :, 0]
        if idx.max() >= len(pal):
            return None
        img = pal[idx]
    return img


# ------------------------------------------------------------------- audio


def decode_wav(data: bytes) -> AudioInfo | None:
    """RIFF/WAVE fmt + data chunk walk. Stats (rms/peak, normalized to
    [0,1]) are computed for 16-bit PCM; other encodings return header
    fields with zero stats rather than failing."""
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
    if audio_fmt == 1 and bits == 16 and n_samples:
        import numpy as np

        x = np.frombuffer(pcm[: n_samples * bytes_per_frame], dtype="<i2")
        x = x.astype(np.float64) / 32768.0
        rms = float(np.sqrt(np.mean(x * x)))
        peak = float(np.max(np.abs(x)))
    return AudioInfo("wav", channels, rate, bits, n_samples, duration_ms, rms, peak)


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
