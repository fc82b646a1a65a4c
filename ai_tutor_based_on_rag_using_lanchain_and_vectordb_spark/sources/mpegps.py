"""MPEG-1 Program Stream (ISO 11172-1 system layer) mux + demux.

Real-world MPEG-1 video almost never travels as a bare elementary
stream: it is wrapped in the system layer (.mpg) — packs with a system
clock reference, a system header, and PES packets that interleave the
elementary streams. This module completes the MPEG-1 stack next to
:mod:`mpeg1` (the video ES codec): the multimodal video stages
recognize the 0x000001BA pack signature, demux the video PES payloads,
and feed the reassembled ES to the existing picture decoder.

Demux is fail-closed and lax by default (the fuzz contract: garbage →
None, truncation → the valid prefix); ``strict=True`` raises
``MpegPsError`` on any malformation. The mux produces spec-shaped
streams (valid marker bits, SCR/PTS layouts, bounded PES packet sizes)
so every demux path is exercised by in-repo bytes — the same
encode-to-test-decode move as the rest of the codec stack.
"""

from __future__ import annotations

import struct

PACK_START = b"\x00\x00\x01\xba"
SYSTEM_START = b"\x00\x00\x01\xbb"
END_CODE = b"\x00\x00\x01\xb9"
PADDING_SID = 0xBE


class MpegPsError(ValueError):
    pass


def is_mpeg_ps(data: bytes) -> bool:
    return data[:4] == PACK_START


# --------------------------------------------------------------- mux


def _scr_bytes(scr: int, mux_rate: int) -> bytes:
    """MPEG-1 pack header body: '0010' + SCR(33, marker-split 3/15/15)
    + '11' + mux_rate(22) + '1' — 8 bytes."""
    hi3 = (scr >> 30) & 0x7
    mid15 = (scr >> 15) & 0x7FFF
    lo15 = scr & 0x7FFF
    bits = (
        (0b0010 << 60)
        | (hi3 << 57)
        | (1 << 56)
        | (mid15 << 41)
        | (1 << 40)
        | (lo15 << 25)
        | (1 << 24)
        | (1 << 23)
        | ((mux_rate & 0x3FFFFF) << 1)
        | 1
    )
    return bits.to_bytes(8, "big")


def _pts_bytes(prefix: int, ts: int) -> bytes:
    """5-byte timestamp field: prefix(4) + ts(33, marker-split)."""
    b0 = (prefix << 4) | (((ts >> 30) & 0x7) << 1) | 1
    b12 = (((ts >> 15) & 0x7FFF) << 1) | 1
    b34 = ((ts & 0x7FFF) << 1) | 1
    return bytes([b0]) + struct.pack(">HH", b12, b34)


def encode_mpeg_ps(
    video_es: bytes,
    pes_size: int = 2048,
    mux_rate: int = 3500,
    pts_start: int = 0,
    stream_id: int = 0xE0,
    with_system_header: bool = True,
    padding: int = 0,
) -> bytes:
    """Wrap a video elementary stream in an ISO 11172-1 program stream:
    one pack, an optional system header, PES packets of at most
    ``pes_size`` payload bytes (the first carries a PTS, the rest the
    1-byte no-timestamp flag), an optional padding-stream packet, and
    the ISO end code."""
    if not 0xE0 <= stream_id <= 0xEF:
        raise MpegPsError("video stream id must be 0xE0-0xEF")
    out = bytearray()
    out += PACK_START + _scr_bytes(0, max(1, mux_rate))
    if with_system_header:
        # rate_bound(22, markers) + audio_bound(6)+fixed(1)+CSPS(1) +
        # flags + video_bound + reserved + one stream entry
        body = bytearray()
        body.append(0x80 | ((max(1, mux_rate) >> 15) & 0x7F))
        body += bytes([((max(1, mux_rate) >> 7) & 0xFF)])
        body.append(((max(1, mux_rate) & 0x7F) << 1) | 1)
        body.append(0x00)  # audio_bound(6) + fixed + CSPS
        body.append(0x21)  # system_audio_lock=0 video_lock=0, video_bound=1
        body.append(0xFF)  # reserved
        body += bytes([stream_id, 0xE0, 0x00])  # STD buffer entry
        out += SYSTEM_START + struct.pack(">H", len(body)) + bytes(body)
    pos = 0
    first = True
    while pos < len(video_es) or first:
        chunk = video_es[pos : pos + pes_size]
        pos += len(chunk)
        hdr = _pts_bytes(0b0010, pts_start) if first else b"\x0f"
        out += bytes([0, 0, 1, stream_id])
        out += struct.pack(">H", len(hdr) + len(chunk))
        out += hdr + chunk
        first = False
    if padding:
        out += bytes([0, 0, 1, PADDING_SID])
        out += struct.pack(">H", padding)
        out += b"\xff" * padding
    out += END_CODE
    return bytes(out)


# -------------------------------------------------------------- demux


def _parse_pes_payload(body: bytes, strict: bool):
    """MPEG-1 PES header inside a packet body → (pts|None, es_bytes).
    Layout: 0xFF stuffing*, optional '01'+STD(2), then '0010'+PTS(5) |
    '0011'+PTS+DTS(10) | 0x0F (none)."""
    i = 0
    while i < len(body) and body[i] == 0xFF:
        i += 1
        if i > 16 and strict:
            raise MpegPsError("more than 16 PES stuffing bytes")
    if i + 1 < len(body) and body[i] >> 6 == 0b01:
        i += 2  # STD buffer scale/size
    if i >= len(body):
        if strict:
            raise MpegPsError("PES header truncated")
        return None, b""
    pts = None
    tag = body[i] >> 4
    if tag == 0b0010 or tag == 0b0011:
        nbytes = 5 if tag == 0b0010 else 10
        if i + nbytes > len(body):
            if strict:
                raise MpegPsError("PES timestamp truncated")
            return None, b""
        b = body[i : i + 5]
        pts = (
            (((b[0] >> 1) & 0x7) << 30)
            | ((struct.unpack(">H", b[1:3])[0] >> 1) << 15)
            | (struct.unpack(">H", b[3:5])[0] >> 1)
        )
        if strict and not (b[0] & 1 and b[2] & 1 and b[4] & 1):
            raise MpegPsError("PES timestamp marker bits unset")
        i += nbytes
    elif body[i] == 0x0F:
        i += 1
    elif strict:
        raise MpegPsError(f"bad PES header flag byte {body[i]:#x}")
    else:
        i += 1  # tolerate: treat the rest as payload start
    return pts, body[i:]


def demux_mpeg_ps(data: bytes, strict: bool = False) -> dict | None:
    """Program stream → {stream_id: reassembled ES bytes} plus
    ``"_pts"``: {stream_id: first PTS}. None when ``data`` is not a
    program stream; lax mode keeps everything up to the first
    malformation."""
    if not is_mpeg_ps(data):
        return None
    streams: dict = {}
    pts_map: dict = {}
    pos = 0
    n = len(data)
    try:
        while pos + 4 <= n:
            code = data[pos : pos + 4]
            if code == END_CODE:
                pos += 4
                break
            if code == PACK_START:
                if pos + 12 > n:
                    raise MpegPsError("truncated pack header")
                if strict and data[pos + 4] >> 4 != 0b0010:
                    raise MpegPsError("bad pack header marker")
                pos += 12
                continue
            if code[:3] != b"\x00\x00\x01":
                raise MpegPsError(f"bad start code at byte {pos}")
            sid = code[3]
            if pos + 6 > n:
                raise MpegPsError("truncated packet length")
            plen = struct.unpack(">H", data[pos + 4 : pos + 6])[0]
            body = data[pos + 6 : pos + 6 + plen]
            if len(body) < plen:
                raise MpegPsError("truncated packet body")
            pos += 6 + plen
            if sid == SYSTEM_START[3] or sid == PADDING_SID:
                continue
            if sid < 0xBC:
                raise MpegPsError(f"reserved stream id {sid:#x}")
            pts, es = _parse_pes_payload(body, strict)
            streams[sid] = streams.get(sid, b"") + es
            if pts is not None and sid not in pts_map:
                pts_map[sid] = pts
        else:
            if strict and pos != n:
                raise MpegPsError("stream ends without ISO end code")
        if strict and pos != n:
            raise MpegPsError("trailing bytes after ISO end code")
    except MpegPsError:
        if strict:
            raise
    if not streams and strict:
        raise MpegPsError("no PES payloads")
    streams["_pts"] = pts_map
    return streams


def ps_video_es(data: bytes) -> bytes | None:
    """The first video (0xE0-0xEF) elementary stream of a program
    stream, or None — the multimodal video stages' entry point."""
    streams = demux_mpeg_ps(data)
    if streams is None:
        return None
    for sid in sorted(s for s in streams if isinstance(s, int)):
        if 0xE0 <= sid <= 0xEF and streams[sid]:
            return streams[sid]
    return None
