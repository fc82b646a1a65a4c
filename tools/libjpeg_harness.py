"""Cross-validate the in-repo JPEG codecs against the SYSTEM libjpeg
(binary-only, loaded via ctypes) — the external ground truth the r7
verdict asked for: our QM arithmetic coder (sources/arithcode.py) is
otherwise only ever checked against itself.

The libjpeg ABI (struct jpeg_decompress_struct layout) is
version-dependent, so everything runs in SUBPROCESSES and touches no
struct field except the error-manager pointer at offset 0 (fixed by
the jpeg_common_fields contract):

- probe mode: call jpeg_CreateDecompress with a deliberately wrong
  structsize; the default error handler prints "library thinks size is
  N" to stderr before exiting — parse N. One probe per interpreter.
- decode mode: std error mgr, jpeg_CreateDecompress with the probed
  size, jpeg_mem_src, read exactly the caller-known (h, w, ncomp)
  scanlines to stdout. Any libjpeg error exits the subprocess (the
  default handler calls exit), which the parent reports as None.

Callers (tests/test_libjpeg_crossval.py) therefore always know the
expected geometry a priori and compare pixels with a small IDCT
tolerance — entropy-coder desync produces garbage, not off-by-one."""

from __future__ import annotations

import re
import subprocess
import sys

_LIB_CANDIDATES = ("libjpeg.so.62", "libjpeg.so", "libjpeg.so.8")

_PROBE_SRC = r"""
import ctypes, sys
lib = None
for name in {cands!r}:
    try:
        lib = ctypes.CDLL(name)
        break
    except OSError:
        pass
if lib is None:
    sys.exit(9)
jerr = ctypes.create_string_buffer(1024)
lib.jpeg_std_error.restype = ctypes.c_void_p
lib.jpeg_std_error.argtypes = [ctypes.c_void_p]
err = lib.jpeg_std_error(ctypes.addressof(jerr))
cinfo = ctypes.create_string_buffer(8192)
ctypes.cast(cinfo, ctypes.POINTER(ctypes.c_void_p))[0] = err
lib.jpeg_CreateDecompress.argtypes = [
    ctypes.c_void_p, ctypes.c_int, ctypes.c_size_t]
lib.jpeg_CreateDecompress(ctypes.addressof(cinfo), 62, 1)
sys.exit(8)  # unexpectedly accepted size 1
"""

_DECODE_SRC = r"""
import ctypes, sys
w, h, nc, size = (int(a) for a in sys.argv[1:5])
lib = None
for name in {cands!r}:
    try:
        lib = ctypes.CDLL(name)
        break
    except OSError:
        pass
if lib is None:
    sys.exit(9)
data = sys.stdin.buffer.read()
jerr = ctypes.create_string_buffer(1024)
lib.jpeg_std_error.restype = ctypes.c_void_p
lib.jpeg_std_error.argtypes = [ctypes.c_void_p]
err = lib.jpeg_std_error(ctypes.addressof(jerr))
cinfo = ctypes.create_string_buffer(max(size, 16) + 64)
ctypes.cast(cinfo, ctypes.POINTER(ctypes.c_void_p))[0] = err
lib.jpeg_CreateDecompress.argtypes = [
    ctypes.c_void_p, ctypes.c_int, ctypes.c_size_t]
lib.jpeg_CreateDecompress(ctypes.addressof(cinfo), 62, size)
src = ctypes.create_string_buffer(data, len(data))
lib.jpeg_mem_src.argtypes = [
    ctypes.c_void_p, ctypes.c_void_p, ctypes.c_ulong]
lib.jpeg_mem_src(ctypes.addressof(cinfo), ctypes.addressof(src), len(data))
lib.jpeg_read_header.argtypes = [ctypes.c_void_p, ctypes.c_int]
if lib.jpeg_read_header(ctypes.addressof(cinfo), 1) != 1:
    sys.exit(7)
lib.jpeg_start_decompress.argtypes = [ctypes.c_void_p]
lib.jpeg_start_decompress(ctypes.addressof(cinfo))
row = ctypes.create_string_buffer(w * nc)
rowpp = (ctypes.c_void_p * 1)(ctypes.addressof(row))
lib.jpeg_read_scanlines.argtypes = [
    ctypes.c_void_p, ctypes.c_void_p, ctypes.c_uint]
out = bytearray()
for _ in range(h):
    if lib.jpeg_read_scanlines(ctypes.addressof(cinfo), rowpp, 1) != 1:
        sys.exit(6)
    out += row.raw
sys.stdout.buffer.write(bytes(out))
"""

_probed_size: int | None | bool = False  # False = not probed yet


def probe_struct_size() -> int | None:
    """The library's sizeof(struct jpeg_decompress_struct), parsed from
    the size-mismatch error message. None when libjpeg is unusable."""
    global _probed_size
    if _probed_size is not False:
        return _probed_size
    try:
        r = subprocess.run(
            [sys.executable, "-c", _PROBE_SRC.format(cands=_LIB_CANDIDATES)],
            capture_output=True, timeout=30,
        )
    except Exception:
        _probed_size = None
        return None
    m = re.search(rb"size is (\d+)", r.stderr)
    _probed_size = int(m.group(1)) if m else None
    return _probed_size


def libjpeg_decode(data: bytes, w: int, h: int, ncomp: int):
    """Decode ``data`` with the system libjpeg; returns an (h, w,
    ncomp) uint8 array or None when the library is absent, rejects the
    stream, or lacks the coding mode (e.g. a build without arithmetic
    support)."""
    import numpy as np

    size = probe_struct_size()
    if size is None:
        return None
    try:
        r = subprocess.run(
            [sys.executable, "-c", _DECODE_SRC.format(cands=_LIB_CANDIDATES),
             str(w), str(h), str(ncomp), str(size)],
            input=data, capture_output=True, timeout=60,
        )
    except Exception:
        return None
    if r.returncode != 0 or len(r.stdout) != w * h * ncomp:
        return None
    return np.frombuffer(r.stdout, dtype=np.uint8).reshape(h, w, ncomp)
