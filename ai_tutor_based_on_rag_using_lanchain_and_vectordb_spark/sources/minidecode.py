"""Minimal pure-stdlib PDF and DOCX text extractors.

The reference's primary ingest path is PyPDFLoader / Docx2txtLoader
(backend/chroma_utils.py:60-74). This container has neither pypdf nor
docx2txt, so these small extractors make the decode step REAL for the
common cases instead of a stub:

- DOCX is a zip container (ECMA-376): ``word/document.xml`` holds the
  body; text lives in ``<w:t>`` runs, paragraphs in ``<w:p>`` elements.
  ``zipfile`` + ``xml.etree`` cover it completely — this is the same
  approach docx2txt takes.
- PDF (ISO 32000): page text is drawn by ``Tj`` / ``'`` / ``"`` / ``TJ``
  operators inside (usually Flate-compressed) content streams. The
  extractor scans ``<<dict>> stream…endstream`` objects, inflates
  ``/FlateDecode`` streams with ``zlib``, and collects the literal
  strings shown by text operators. Handled: escape sequences
  (``\\n \\( \\) \\\\``, octal), line continuations, hex strings
  ``<…> Tj``, uncompressed streams. Not handled (falls back to the
  caller's stub): encrypted PDFs, CID/Type0 composite fonts with
  non-ASCII encodings, object streams (``/ObjStm``), cross-stream page
  segmentation — each stream with a ``BT`` text block is treated as one
  page, which matches simple single-stream-per-page documents.

Both return ``[]`` when the payload yields nothing, so callers can
fall back (loaders.decode_pdf / decode_docx keep their import-gated
pypdf/docx2txt fast path and the deterministic stub as last resort).
"""

from __future__ import annotations

import io
import re
import zipfile
import zlib
from xml.etree import ElementTree

# ------------------------------------------------------------------ DOCX

_W_NS = "{http://schemas.openxmlformats.org/wordprocessingml/2006/main}"


def docx_pages(data: bytes) -> list[str]:
    """DOCX body text: one pseudo-page (the whole document) like
    Docx2txtLoader — paragraphs separated by newlines."""
    try:
        with zipfile.ZipFile(io.BytesIO(data)) as zf:
            with zf.open("word/document.xml") as fh:
                root = ElementTree.parse(fh).getroot()
    except (zipfile.BadZipFile, KeyError, ElementTree.ParseError, OSError):
        return []
    paragraphs: list[str] = []
    for p in root.iter(f"{_W_NS}p"):
        runs: list[str] = []
        for node in p.iter():
            if node.tag == f"{_W_NS}t" and node.text:
                runs.append(node.text)
            elif node.tag in (f"{_W_NS}tab",):
                runs.append("\t")
            elif node.tag in (f"{_W_NS}br", f"{_W_NS}cr"):
                runs.append("\n")
        paragraphs.append("".join(runs))
    text = "\n".join(paragraphs).strip()
    return [text] if text else []


# ------------------------------------------------------------------- PDF

_STREAM_RE = re.compile(rb"<<(.*?)>>\s*stream\r?\n(.*?)\s*endstream", re.S)
# literal string (escaped chars allowed) followed by a show operator
_TJ_RE = re.compile(rb"\(((?:\\.|[^\\()])*)\)\s*(?:Tj|')")
# hex string shown directly
_HEX_TJ_RE = re.compile(rb"<([0-9A-Fa-f\s]+)>\s*(?:Tj|')")
# array-of-strings show operator: [(a) -120 (b)] TJ
_TJ_ARRAY_RE = re.compile(rb"\[((?:\((?:\\.|[^\\()])*\)|[^\]])*)\]\s*TJ")
_STR_IN_ARRAY_RE = re.compile(rb"\(((?:\\.|[^\\()])*)\)")

_ESCAPES = {
    ord("n"): "\n",
    ord("r"): "\r",
    ord("t"): "\t",
    ord("b"): "\b",
    ord("f"): "\f",
}


def _decode_pdf_string(raw: bytes) -> str:
    out: list[str] = []
    i = 0
    while i < len(raw):
        c = raw[i]
        if c == 0x5C and i + 1 < len(raw):  # backslash escape
            e = raw[i + 1]
            if e in _ESCAPES:
                out.append(_ESCAPES[e])
                i += 2
            elif 0x30 <= e <= 0x37:  # up to 3 octal digits
                j = i + 1
                while j < min(i + 4, len(raw)) and 0x30 <= raw[j] <= 0x37:
                    j += 1
                out.append(chr(int(raw[i + 1 : j], 8)))
                i = j
            elif e in (0x0A, 0x0D):  # line continuation
                i += 2
            else:  # \( \) \\ and any other escaped literal
                out.append(chr(e))
                i += 2
        else:
            out.append(chr(c))
            i += 1
    return "".join(out)


def _stream_text(content: bytes) -> str:
    """Shown strings of one content stream, in operator order."""
    shows: list[tuple[int, str]] = []
    for m in _TJ_RE.finditer(content):
        shows.append((m.start(), _decode_pdf_string(m.group(1))))
    for m in _HEX_TJ_RE.finditer(content):
        hx = re.sub(rb"\s", b"", m.group(1))
        if len(hx) % 2:
            hx += b"0"
        shows.append((m.start(), bytes.fromhex(hx.decode("ascii")).decode("latin-1")))
    for m in _TJ_ARRAY_RE.finditer(content):
        parts = [
            _decode_pdf_string(s.group(1)) for s in _STR_IN_ARRAY_RE.finditer(m.group(1))
        ]
        shows.append((m.start(), "".join(parts)))
    shows.sort(key=lambda t: t[0])
    return "\n".join(s for _, s in shows if s)


def pdf_pages(data: bytes) -> list[str]:
    """Page texts, one entry per content stream containing a BT text
    block (the single-stream-per-page approximation). ``[]`` when the
    document has no parseable text streams."""
    if not data.startswith(b"%PDF"):
        return []
    pages: list[str] = []
    for m in _STREAM_RE.finditer(data):
        params, body = m.group(1), m.group(2)
        if b"/FlateDecode" in params:
            try:
                body = zlib.decompress(body)
            except zlib.error:
                continue
        elif b"/Filter" in params:
            continue  # unsupported filter (DCT, LZW, ...)
        if b"BT" not in body:
            continue  # not a text content stream (image, font program)
        pages.append(_stream_text(body))
    return pages
