"""ctypes binding to the native OpenFOAM numeric parser (runtime/foamio.cpp).

The library is built on demand with the repo's Makefile (g++ -O3 -shared) and
cached; when the toolchain or the library is unavailable every entry point
reports ``available() == False`` and callers (``foam_io``) fall back to the
pure-Python path, so the framework never hard-requires the native build.
"""
from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path

import numpy as np

_RUNTIME_DIR = Path(__file__).resolve().parents[2] / "runtime"
_LIB_PATH = _RUNTIME_DIR / "build" / "libfoamio.so"
_lib = None
_tried = False


def _build() -> bool:
    try:
        subprocess.run(["make", "-C", str(_RUNTIME_DIR)], check=True,
                       capture_output=True, timeout=120)
        return _LIB_PATH.exists()
    except (subprocess.SubprocessError, FileNotFoundError):
        return False


def _load():
    global _lib, _tried
    if _tried:
        return _lib
    _tried = True
    if not _LIB_PATH.exists() and not _build():
        return None
    try:
        lib = ctypes.CDLL(str(_LIB_PATH))
    except OSError:
        return None
    lib.foamio_parse_floats.restype = ctypes.c_long
    lib.foamio_parse_floats.argtypes = [
        ctypes.c_char_p, ctypes.c_long,
        ctypes.POINTER(ctypes.c_double), ctypes.c_long]
    lib.foamio_parse_file.restype = ctypes.c_long
    lib.foamio_parse_file.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_double), ctypes.c_long]
    lib.foamio_parse_files.restype = None
    lib.foamio_parse_files.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.c_long,
        ctypes.POINTER(ctypes.POINTER(ctypes.c_double)),
        ctypes.POINTER(ctypes.c_long), ctypes.POINTER(ctypes.c_long),
        ctypes.c_long]
    _lib = lib
    return _lib


def available() -> bool:
    return _load() is not None


def parse_floats(text: str) -> np.ndarray | None:
    """All floats in a text block (comments/identifiers skipped), or None when
    the native library is unavailable."""
    lib = _load()
    if lib is None:
        return None
    raw = text.encode()
    cap = max(16, len(raw) // 2 + 8)  # >= one float per 2 chars is impossible
    out = np.empty(cap, np.float64)
    n = lib.foamio_parse_floats(
        raw, len(raw), out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        cap)
    if n < 0:
        return None
    return out[:n].copy()


def parse_file(path: str | Path) -> np.ndarray | None:
    """All floats in a file after the FoamFile header block."""
    lib = _load()
    if lib is None:
        return None
    size = Path(path).stat().st_size
    cap = max(16, size // 2 + 8)
    out = np.empty(cap, np.float64)
    n = lib.foamio_parse_file(
        str(path).encode(),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), cap)
    if n < 0:
        return None
    return out[:n].copy()


def parse_files(paths: list[str | Path], n_threads: int = 8
                ) -> list[np.ndarray] | None:
    """Parse many files concurrently (native threads; no GIL contention)."""
    lib = _load()
    if lib is None:
        return None
    n = len(paths)
    if n == 0:
        return []
    caps = [max(16, Path(p).stat().st_size // 2 + 8) for p in paths]
    bufs = [np.empty(c, np.float64) for c in caps]
    c_paths = (ctypes.c_char_p * n)(*[str(p).encode() for p in paths])
    c_outs = (ctypes.POINTER(ctypes.c_double) * n)(
        *[b.ctypes.data_as(ctypes.POINTER(ctypes.c_double)) for b in bufs])
    c_caps = (ctypes.c_long * n)(*caps)
    c_results = (ctypes.c_long * n)()
    lib.foamio_parse_files(c_paths, n, c_outs, c_caps, c_results,
                           min(n_threads, n))
    out = []
    for i in range(n):
        if c_results[i] < 0:
            return None
        out.append(bufs[i][:c_results[i]].copy())
    return out
