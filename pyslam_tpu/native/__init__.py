"""Native (C++) runtime components, loaded via ctypes.

The reference is pure Python end to end (SURVEY.md §2.2); at this
framework's target scales the Python tokenisers in ``io/`` dominate load
time (a Venice-class BAL file is ~25M float tokens).  ``fastio.cpp``
implements the two tokenisation kernels; this module compiles it with g++
on first use (cached by source hash next to the package), loads it with
ctypes, and exposes numpy-facing wrappers.

Everything degrades gracefully: if g++ is unavailable or compilation
fails, :func:`available` returns False and the IO readers keep their pure
Python paths (tests cover both).  No pip/pybind11 — the environment bakes
in the toolchain but not bindings generators, so the surface is a C ABI.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import tempfile

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "fastio.cpp")

_lib = None
_tried = False


def _build_and_load():
    """Compile fastio.cpp (content-hash cached .so) and bind signatures."""
    with open(_SRC, "rb") as f:
        src = f.read()
    tag = hashlib.sha256(src).hexdigest()[:16]
    so_path = os.path.join(_HERE, f"_fastio_{tag}.so")
    if not os.path.exists(so_path):
        for old in os.listdir(_HERE):  # drop builds of superseded sources
            if old.startswith("_fastio_") and old.endswith(".so"):
                try:
                    os.unlink(os.path.join(_HERE, old))
                except OSError:
                    pass
        # Build into a temp file then atomically rename so concurrent
        # importers never load a half-written .so.
        fd, tmp = tempfile.mkstemp(suffix=".so", dir=_HERE)
        os.close(fd)
        try:
            subprocess.run(
                ["g++", "-O3", "-std=c++17", "-shared", "-fPIC", _SRC, "-o", tmp],
                check=True,
                capture_output=True,
                timeout=120,
            )
            os.replace(tmp, so_path)
        finally:
            if os.path.exists(tmp):
                os.unlink(tmp)
    lib = ctypes.CDLL(so_path)
    LL, D, I = ctypes.c_longlong, ctypes.c_double, ctypes.c_int
    lib.ps_count_tokens.restype = None
    lib.ps_count_tokens.argtypes = [
        ctypes.c_char_p, LL, ctypes.POINTER(LL), ctypes.POINTER(LL)]
    lib.ps_parse_doubles.restype = LL
    lib.ps_parse_doubles.argtypes = [
        ctypes.c_char_p, LL, ctypes.POINTER(D), LL]
    lib.ps_scan_tagged.restype = LL
    lib.ps_scan_tagged.argtypes = [
        ctypes.c_char_p, LL, ctypes.c_char_p, LL,
        ctypes.POINTER(I), ctypes.POINTER(LL), ctypes.POINTER(I), LL,
        ctypes.POINTER(D), LL]
    return lib


def _get():
    global _lib, _tried
    if not _tried:
        _tried = True
        try:
            _lib = _build_and_load()
        except Exception:
            _lib = None
    return _lib


def available() -> bool:
    """True when the native library compiled and loaded on this host."""
    return _get() is not None


def count_tokens(buf: bytes) -> tuple[int, int]:
    """(token_count, line_count) of ``buf`` in one native pass."""
    lib = _get()
    if lib is None:
        raise RuntimeError("native fastio unavailable")
    toks = ctypes.c_longlong()
    lines = ctypes.c_longlong()
    lib.ps_count_tokens(buf, len(buf), ctypes.byref(toks), ctypes.byref(lines))
    return toks.value, lines.value


def parse_doubles(buf: bytes) -> np.ndarray:
    """All whitespace-separated doubles in ``buf`` as a (N,) f64 array.

    Native equivalent of ``np.array(text.split(), dtype=np.float64)``.
    Raises ValueError (with byte offset) on malformed numeric text.
    """
    lib = _get()
    if lib is None:
        raise RuntimeError("native fastio unavailable")
    n = len(buf)
    # Exact-size allocation: one count pass beats the copy + page-fault
    # churn of a conservative n/2 cap at Venice scale.
    cap, _ = count_tokens(buf)
    out = np.empty(cap, np.float64)
    k = lib.ps_parse_doubles(
        buf, n, out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), cap)
    if k == cap + 1:
        raise ValueError("parse_doubles: output overflow (corrupt input?)")
    if k < 0:
        raise ValueError(f"parse_doubles: bad token at byte {-k - 1}")
    return out if k == cap else out[:k].copy()


def scan_tagged(buf: bytes, tags: list[str]):
    """Scan g2o-style tagged lines natively.

    Returns ``(tag_ids, offsets, counts, fields)``: for recognised line r,
    ``tags[tag_ids[r]]`` is its record type and
    ``fields[offsets[r] : offsets[r] + counts[r]]`` its numeric payload.
    Unknown tags and comments are skipped, matching the Python reader's
    tolerance. Raises ValueError on malformed numeric text.
    """
    lib = _get()
    if lib is None:
        raise RuntimeError("native fastio unavailable")
    treg = "\n".join(tags).encode()
    n = len(buf)
    # Exact caps from one count pass: fields <= tokens, lines <= lines.
    n_toks, n_lines = count_tokens(buf)
    line_cap = n_lines + 1
    field_cap = n_toks + 1
    tag_ids = np.empty(line_cap, np.int32)
    offs = np.empty(line_cap, np.int64)
    counts = np.empty(line_cap, np.int32)
    fields = np.empty(field_cap, np.float64)
    LL, D, I = ctypes.c_longlong, ctypes.c_double, ctypes.c_int
    r = lib.ps_scan_tagged(
        buf, n, treg, len(treg),
        tag_ids.ctypes.data_as(ctypes.POINTER(I)),
        offs.ctypes.data_as(ctypes.POINTER(LL)),
        counts.ctypes.data_as(ctypes.POINTER(I)),
        line_cap,
        fields.ctypes.data_as(ctypes.POINTER(D)),
        field_cap)
    if r == line_cap + 1 or r == -(field_cap + 2):
        raise ValueError("scan_tagged: output overflow (corrupt input?)")
    if r < 0:
        raise ValueError(f"scan_tagged: bad token at byte {-r - 1}")
    r = int(r)
    return tag_ids[:r].copy(), offs[:r].copy(), counts[:r].copy(), fields
