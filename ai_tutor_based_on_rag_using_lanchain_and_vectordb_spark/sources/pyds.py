"""`corpusdir` — a Spark 4 Python DataSource for document-directory
ingestion: ``spark.read.format("corpusdir").option("path", dir)`` yields
one row per extracted page, decoding PDF/DOCX/HTML/TXT with the in-repo
stdlib extractors (sources/minidecode.py) INSIDE the partitions.

Why a custom source instead of binaryFile + UDF (loaders.py keeps that
path too): the DataSource API moves file listing, partition planning and
filter-based pruning in front of the scan —

- ``partitions()`` plans one InputPartition per file (a 100 TB corpus
  of many small uploads parallelizes by file; co-group tiny files
  upstream if file count explodes — the partition count here is the
  task count).
- ``pushFilters`` accepts EqualTo/In on ``kind`` (the extension-derived
  format) and prunes WHOLE FILES at planning time: a query for
  kind='pdf' never opens the .docx payloads — scan-level pruning the
  UDF path cannot express.
- The streaming side (SimpleDataSourceStreamReader) turns the same
  directory into an incremental source: the offset is the count of
  files processed from the deterministically-sorted listing, so each
  micro-batch decodes only newly-arrived files and replays exactly on
  recovery (readBetweenOffsets re-reads a committed range).

Local-filesystem listing matches this container; the seams (``_list``,
``_read_file``) are where an object-store lister drops in.
"""

from __future__ import annotations

import os
from typing import Iterator, Tuple

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    EqualTo,
    In,
    InputPartition,
    SimpleDataSourceStreamReader,
)
from pyspark.sql.types import StructType

SCHEMA = (
    "path string, kind string, file_size long, page_no int, page_text string"
)

_KINDS = ("pdf", "docx", "html", "txt")


def _kind_of(path: str) -> str:
    """Extension-derived format. Unknown extensions map to a distinct
    'other' kind (NOT 'txt'): aliasing them to txt would make
    kind='txt' queries open arbitrary binary payloads as text, and
    unknown files could never be pruned out of a scan."""
    suffix = path.rsplit(".", 1)[-1].lower() if "." in path else ""
    return suffix if suffix in _KINDS else "other"


def _list(root: str) -> list[str]:
    """Deterministic recursive listing (sorted: the stream offset
    indexes into this order)."""
    out = []
    for base, _dirs, files in os.walk(root):
        for f in files:
            out.append(os.path.join(base, f))
    return sorted(out)


def _read_file(path: str) -> Iterator[Tuple]:
    from .loaders import DECODERS, _text_passthrough

    with open(path, "rb") as fh:
        data = fh.read()
    decoder = DECODERS.get("." + _kind_of(path), _text_passthrough)
    for i, text in enumerate(decoder(data)):
        yield (path, _kind_of(path), len(data), i, text)


class _FilePartition(InputPartition):
    def __init__(self, path: str):
        self.path = path


class CorpusDirReader(DataSourceReader):
    def __init__(self, options):
        self.root = options.get("path")
        if not self.root:
            raise ValueError("corpusdir: option 'path' is required")
        self.kinds: set[str] | None = None  # None = all

    def pushFilters(self, filters):
        """Keep kind-equality filters for file-level pruning; everything
        else goes back to Spark (returned = unsupported). Multiple kind
        predicates INTERSECT — a consumed filter is never re-applied by
        Spark, so keeping only the last one would drop constraints."""
        for f in filters:
            if isinstance(f, EqualTo) and f.attribute == ("kind",):
                got = {f.value}
            elif isinstance(f, In) and f.attribute == ("kind",):
                # pyspark 4.1's In dataclass names its tuple field `value`
                got = set(f.value)
            else:
                yield f
                continue
            self.kinds = got if self.kinds is None else (self.kinds & got)

    def partitions(self):
        paths = _list(self.root)
        if self.kinds is not None:
            paths = [p for p in paths if _kind_of(p) in self.kinds]
        return [_FilePartition(p) for p in paths]

    def read(self, partition: _FilePartition):
        return _read_file(partition.path)


class CorpusDirStreamReader(SimpleDataSourceStreamReader):
    """Offset = files consumed from the sorted listing, VALIDATED by
    path: the offset also records the last consumed path, and every
    read asserts the listing still has that path at the recorded
    boundary. New files must sort AFTER already-consumed ones to be
    picked up (upload with monotonic names — timestamps/sequence ids —
    the standard drop-directory contract); a violation (a deleted
    consumed file, or a new file sorting before the watermark, which
    would silently shift indices and skip/re-read documents) FAILS the
    batch instead of being trusted."""

    def __init__(self, options):
        self.root = options.get("path")
        if not self.root:
            raise ValueError("corpusdir: option 'path' is required")

    def initialOffset(self) -> dict:
        return {"index": 0, "last": None}

    @staticmethod
    def _check_boundary(paths: list[str], index: int, last) -> None:
        """The consumed prefix ends exactly at `last`: sorted order
        guarantees everything before it is <= last, so one positional
        equality detects both deletions inside the prefix and
        insertions that sort before the watermark."""
        if index == 0 or last is None:  # None: pre-upgrade checkpoint
            return
        if index > len(paths) or paths[index - 1] != last:
            raise RuntimeError(
                f"corpusdir: directory listing no longer matches the "
                f"committed offset (expected {last!r} at position "
                f"{index - 1}); a consumed file was deleted or a new "
                f"file sorted before the watermark — refusing to "
                f"skip/re-read documents"
            )

    def read(self, start: dict):
        paths = _list(self.root)
        self._check_boundary(paths, start["index"], start.get("last"))
        end = {
            "index": len(paths),
            "last": paths[-1] if paths else start.get("last"),
        }
        # A list-backed iterator is REQUIRED here: Spark's prefetching
        # cache replays this batch via copy.copy(iterator), which fails
        # on a generator (datasource_internal.getCache). The driver-side
        # materialization this implies is the simple-reader trade-off —
        # a backlog too big for driver memory belongs on the partitioned
        # batch reader (one availableNow catch-up run), not this API.
        rows = [
            row for p in paths[start["index"]:] for row in _read_file(p)
        ]
        return iter(rows), end

    def readBetweenOffsets(self, start: dict, end: dict):
        paths = _list(self.root)
        self._check_boundary(paths, start["index"], start.get("last"))
        self._check_boundary(paths, end["index"], end.get("last"))
        chunk = paths[start["index"]: end["index"]]
        return (row for p in chunk for row in _read_file(p))

    def commit(self, end: dict) -> None:
        pass  # nothing to clean up: the directory is the source of truth


class CorpusDirDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "corpusdir"

    def schema(self) -> str:
        return SCHEMA

    def reader(self, schema: StructType) -> CorpusDirReader:
        return CorpusDirReader(self.options)

    def simpleStreamReader(self, schema: StructType) -> CorpusDirStreamReader:
        return CorpusDirStreamReader(self.options)


def register(spark) -> None:
    # pushFilters is rejected at reader init unless the engine-side
    # pushdown flag is on (runtime-settable)
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(CorpusDirDataSource)
