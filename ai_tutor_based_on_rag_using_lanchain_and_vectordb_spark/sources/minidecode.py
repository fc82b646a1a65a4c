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
  ``<…> Tj``, uncompressed streams, object streams (``/ObjStm`` are
  inflated and their packed objects merged into the object table), and
  REAL page segmentation: the ``/Root → /Pages → /Kids`` tree is walked
  and each ``/Type/Page``'s ``/Contents`` refs (single or array) are
  concatenated into that page's text — PyPDFLoader's page-per-Document
  semantics (reference backend/chroma_utils.py:61-63). When no page
  tree resolves (damaged xref, exotic layouts) the extractor falls back
  to the previous stream heuristic: each content stream with a ``BT``
  block is one pseudo-page. Not handled (falls back to the caller's
  stub): encrypted PDFs and CID/Type0 composite fonts with non-ASCII
  encodings.

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


# indirect objects: "N G obj ... endobj". Non-greedy body; stream
# payloads containing the literal "endobj" would truncate — acceptable
# for the text-bearing documents this targets (pypdf handles the rest).
_OBJ_RE = re.compile(rb"(\d+)\s+\d+\s+obj\b(.*?)endobj", re.S)
_OBJ_STREAM_RE = re.compile(rb"<<(.*?)>>\s*stream\r?\n(.*?)\s*endstream", re.S)
_REF_RE = re.compile(rb"(\d+)\s+\d+\s+R\b")
_NUM_VAL_RE = {
    name: re.compile(rb"/" + name + rb"\s+(\d+)\b") for name in (b"N", b"First")
}


def _inflate(params: bytes, body: bytes) -> bytes | None:
    if b"/FlateDecode" in params:
        try:
            return zlib.decompress(body)
        except zlib.error:
            return None
    if b"/Filter" in params:
        return None  # unsupported filter (DCT, LZW, ...)
    return body


def _object_table(data: bytes) -> dict[int, bytes]:
    """objnum → object body, with /ObjStm packed objects inflated and
    merged in (their bodies are plain dicts — never nested streams)."""
    table: dict[int, bytes] = {}
    objstms: list[tuple[int, int, bytes]] = []
    for m in _OBJ_RE.finditer(data):
        num, body = int(m.group(1)), m.group(2)
        table[num] = body
        sm = _OBJ_STREAM_RE.search(body)
        if sm and b"/ObjStm" in sm.group(1):
            inflated = _inflate(sm.group(1), sm.group(2))
            if inflated is not None:
                n_m = _NUM_VAL_RE[b"N"].search(sm.group(1))
                first_m = _NUM_VAL_RE[b"First"].search(sm.group(1))
                if n_m and first_m:
                    objstms.append((int(n_m.group(1)), int(first_m.group(1)), inflated))
    for n, first, payload in objstms:
        header = payload[:first].split()
        # header: N pairs of "objnum offset" (offsets relative to First)
        pairs = [
            (int(header[i]), int(header[i + 1]))
            for i in range(0, min(len(header), 2 * n), 2)
        ]
        for idx, (objnum, off) in enumerate(pairs):
            end = pairs[idx + 1][1] if idx + 1 < len(pairs) else len(payload) - first
            table.setdefault(objnum, payload[first + off : first + end])
    return table


def _page_content_objs(table: dict[int, bytes]) -> list[list[int]] | None:
    """Depth-first /Pages-tree walk → per-page lists of /Contents object
    numbers, or None when no catalog/page tree resolves."""
    pages_root = None
    for body in table.values():
        if b"/Type" in body and b"/Catalog" in body:
            root_m = re.search(rb"/Pages\s+(\d+)\s+\d+\s+R", body)
            if root_m:
                pages_root = int(root_m.group(1))
                break
    if pages_root is None or pages_root not in table:
        return None
    out: list[list[int]] = []
    seen: set[int] = set()

    def walk(num: int) -> None:
        if num in seen or num not in table:  # cycles / dangling refs
            return
        seen.add(num)
        body = table[num]
        if b"/Page" in body and b"/Pages" not in body:
            cm = re.search(rb"/Contents\s*(\[[^\]]*\]|\d+\s+\d+\s+R)", body)
            if cm:
                refs = [int(r.group(1)) for r in _REF_RE.finditer(cm.group(1))]
                # indirect array: /Contents N 0 R where object N is
                # itself `[a 0 R b 0 R]` (no stream) — expand it
                if (
                    len(refs) == 1
                    and refs[0] in table
                    and b"stream" not in table[refs[0]]
                ):
                    arr = re.search(rb"\[([^\]]*)\]", table[refs[0]])
                    if arr:
                        refs = [int(r.group(1)) for r in _REF_RE.finditer(arr.group(1))]
                out.append(refs)
            else:
                out.append([])
            return
        kids_m = re.search(rb"/Kids\s*\[([^\]]*)\]", body)
        if kids_m:
            for r in _REF_RE.finditer(kids_m.group(1)):
                walk(int(r.group(1)))

    walk(pages_root)
    return out if out else None


def _content_stream(body: bytes) -> bytes | None:
    sm = _OBJ_STREAM_RE.search(body)
    if sm is None:
        return None
    return _inflate(sm.group(1), sm.group(2))


def pdf_pages(data: bytes) -> list[str]:
    """Page texts. Primary path: walk the /Pages tree and concatenate
    each page's /Contents streams (one output entry per real page, in
    tree order — empty pages stay as empty strings so page numbering
    matches the document). Fallback when no tree resolves: one entry
    per content stream containing a BT text block. ``[]`` when the
    document has no parseable text streams."""
    if not data.startswith(b"%PDF"):
        return []
    table = _object_table(data)
    page_refs = _page_content_objs(table)
    if page_refs is not None:
        pages: list[str] = []
        any_stream = False
        for refs in page_refs:
            parts: list[str] = []
            for num in refs:
                body = table.get(num)
                if body is None:
                    continue
                content = _content_stream(body)
                if content is None:
                    continue
                any_stream = True
                if b"BT" in content:
                    txt = _stream_text(content)
                    if txt:
                        parts.append(txt)
            pages.append("\n".join(parts))
        if any_stream:
            return pages
    # heuristic fallback: stream-per-page
    pages = []
    for m in _STREAM_RE.finditer(data):
        body = _inflate(m.group(1), m.group(2))
        if body is None or b"BT" not in body:
            continue
        pages.append(_stream_text(body))
    return pages
