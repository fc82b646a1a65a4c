"""Document loaders (SURVEY.md §2.1 S1-S3): binary files → text pages.

The reference uses PyPDFLoader / Docx2txtLoader / UnstructuredHTMLLoader
(backend/chroma_utils.py:60-71). Spark-first shape:

    spark.read.format("binaryFile") → decode pandas_udf → posexplode pages

Decoders: HTML and plain text are real (regex strip-tags — no external
deps). PDF/DOCX use a three-step chain: pypdf/docx2txt when installed
(import-gated) → the pure-stdlib extractors in ``minidecode.py`` (real
decode for Flate/uncompressed PDF text streams and ECMA-376 DOCX XML)
→ ``_decode_stub`` as a last resort for payloads neither path can read
(encrypted/exotic PDFs), keeping the pipeline shape intact.

MIME sniffing (P8, backend/file_utils.py:73-121) checks magic bytes on
the binary head — fail-open like the reference.
"""

from __future__ import annotations

import re
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

PAGES_TYPE = T.ArrayType(T.StringType())

# magic-number → mime (reference backend/file_utils.py:91-100)
MAGIC_MIME = {
    b"%PDF": "application/pdf",
    b"PK\x03\x04": "application/zip",  # docx is a zip container
    b"<!DO": "text/html",
    b"<htm": "text/html",
    b"fLaC": "audio/flac",
    b"\x1f\x8b": "application/gzip",
}

EXPECTED_MIME = {
    ".pdf": ("application/pdf",),
    ".docx": ("application/zip",),
    ".html": ("text/html", "text/plain"),
}


def sniff_mime(head: bytes | None) -> str:
    if not head:
        return "application/octet-stream"
    for magic, mime in MAGIC_MIME.items():
        if head.startswith(magic):
            return mime
    lowered = head[:64].lstrip().lower()
    if lowered.startswith(b"<html") or lowered.startswith(b"<!doctype"):
        return "text/html"
    return "text/plain"


def _html_to_text(data: bytes) -> list[str]:
    text = data.decode("utf-8", errors="replace")
    text = re.sub(r"(?is)<(script|style)[^>]*>.*?</\1>", " ", text)
    text = re.sub(r"(?s)<[^>]+>", " ", text)
    text = re.sub(r"\s+", " ", text).strip()
    return [text] if text else []


def _text_passthrough(data: bytes) -> list[str]:
    text = data.decode("utf-8", errors="replace").strip()
    return [text] if text else []


def _decode_stub(data: bytes, kind: str) -> list[str]:
    """STUB decoder for formats whose libraries aren't in this container
    (pypdf / docx2txt). Deterministic fake: one pseudo-page per 1024
    bytes, each page a printable-byte projection of its slice — keeps
    page counts, ordering, and schema realistic for pipeline tests."""
    pages = []
    for off in range(0, max(len(data), 1), 1024):
        chunk = data[off : off + 1024]
        printable = bytes(b for b in chunk if 32 <= b < 127)
        pages.append(f"[{kind}-page-{off // 1024}] " + printable.decode("ascii", "ignore"))
    return pages


def decode_pdf(data: bytes, password: str | bytes | None = None) -> list[str]:
    """``password`` is the user password for encrypted documents (blank
    assumed when omitted — the PyPDFLoader behavior the reference relies
    on, backend/chroma_utils.py:61-63)."""
    try:  # full-featured decoder when available
        import io

        from pypdf import PdfReader  # type: ignore

        reader = PdfReader(io.BytesIO(data))
        if reader.is_encrypted:
            pw = password.decode("latin-1") if isinstance(password, bytes) else password
            reader.decrypt(pw or "")
        return [p.extract_text() or "" for p in reader.pages]
    except ImportError:
        pass
    from .minidecode import pdf_pages

    # real stdlib extractor (zlib + text ops)
    pages = pdf_pages(data, password=password)
    return pages if pages else _decode_stub(data, "pdf")


def decode_docx(data: bytes) -> list[str]:
    try:
        import io

        import docx2txt  # type: ignore

        return [docx2txt.process(io.BytesIO(data))]
    except ImportError:
        pass
    from .minidecode import docx_pages

    pages = docx_pages(data)  # real stdlib extractor (zipfile + etree)
    return pages if pages else _decode_stub(data, "docx")


DECODERS = {
    ".pdf": decode_pdf,
    ".docx": decode_docx,
    ".html": _html_to_text,
    ".txt": _text_passthrough,
}


def _gunzip_transparent(path: str, data: bytes) -> tuple:
    """Crawl corpora ship documents gzip-member-compressed (.pdf.gz,
    .html.gz): peel the gzip layer and the .gz suffix so the inner
    decoder dispatches on the real type. Lax: corrupt gzip keeps the
    original bytes (the fail-closed decoder contract)."""
    if len(data) >= 2 and data[:2] == b"\x1f\x8b":
        import gzip

        try:
            data = gzip.decompress(data)
            if path.lower().endswith(".gz"):
                path = path[:-3]
        except Exception:
            pass
    return path, data


@F.pandas_udf(PAGES_TYPE)
def decode_pages_udf(paths: pd.Series, contents: pd.Series) -> pd.Series:
    """S1-S3 as one Arrow-batched UDTF-shaped decoder: suffix-dispatched
    binary → list of page texts (one Document per page for PDFs, single
    blob for DOCX/HTML — matching backend/chroma_utils.py:61-69).
    Gzip-compressed payloads (.txt.gz etc.) are peeled transparently."""
    out = []
    for path, data in zip(paths, contents):
        path, data = _gunzip_transparent(
            path, bytes(data) if data is not None else b""
        )
        suffix = ("." + path.rsplit(".", 1)[-1].lower()) if "." in path else ""
        decoder = DECODERS.get(suffix, _text_passthrough)
        out.append(decoder(data))
    return pd.Series(out)


@F.pandas_udf(T.StringType())
def sniff_mime_udf(heads: pd.Series) -> pd.Series:
    return heads.map(lambda h: sniff_mime(bytes(h) if h is not None else None))


def read_binary_documents(spark: SparkSession, path_glob: str) -> DataFrame:
    """S8 front end: binaryFile scan. At scale, pathGlobFilter +
    modifiedAfter handle incremental pickup; content stays off-heap in
    Arrow until the decode UDF touches it."""
    return (
        spark.read.format("binaryFile")
        .load(path_glob)
        .select(
            F.col("path"),
            F.col("length").alias("file_size"),
            F.col("modificationTime").alias("upload_timestamp"),
            F.col("content"),
        )
    )


def load_documents(spark: SparkSession, path_glob: str) -> DataFrame:
    """Files → one row per page with ordinals (posexplode = the per-page
    Document fan-out of PyPDFLoader, chroma_utils.py:74)."""
    files = read_binary_documents(spark, path_glob)
    return (
        files.withColumn("pages", decode_pages_udf(F.col("path"), F.col("content")))
        .select(
            "path",
            "file_size",
            "upload_timestamp",
            F.posexplode("pages").alias("page_no", "page_text"),
        )
    )
