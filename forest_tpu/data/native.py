"""ctypes bindings for the native C++ chunk decoder (csrc/zarr_decode.cpp).

Builds the shared library on demand (g++ is in the image; no pybind11
needed -- plain C ABI + ctypes). Falls back cleanly when compilation or
dlopen fails: callers check :func:`available` and use the pure-Python path.

API surface:
- decode_chunks(paths, chunk_shape, dtype, fill_value=0, compressed=True,
  nthreads=None) -> [n, *chunk_shape] array, decoding all chunk files in
  parallel native threads (None/missing paths produce fill-valued chunks).
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from pathlib import Path
from typing import List, Optional, Sequence

import numpy as np

_SRC = Path(__file__).resolve().parents[2] / "csrc" / "zarr_decode.cpp"
_BUILD_DIR = _SRC.parent / "build"
_LIB_PATH = _BUILD_DIR / "libftpu_loader.so"

_lock = threading.Lock()
_lib = None
_tried = False


def _build() -> bool:
    # Compile to a unique temp name and atomically rename: concurrent
    # builders (pytest-xdist, multi-host launch) must never cache a
    # half-written .so with a fresh mtime.
    tmp = _BUILD_DIR / f".libftpu_loader.{os.getpid()}.so"
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17",
           "-o", str(tmp), str(_SRC), "-ldl", "-pthread"]
    try:
        _BUILD_DIR.mkdir(parents=True, exist_ok=True)
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        os.replace(tmp, _LIB_PATH)
        return True
    except Exception:
        try:
            tmp.unlink(missing_ok=True)
        except OSError:
            pass
        return False


def _load():
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        try:
            # "Falls back cleanly" covers filesystem surprises too: a
            # prebuilt .so without the source tree (non-editable install)
            # is used as-is; any OSError here means unavailable, never an
            # exception out of available().
            have_lib = _LIB_PATH.exists()
            src_newer = (have_lib and _SRC.exists()
                         and _LIB_PATH.stat().st_mtime
                         < _SRC.stat().st_mtime)
            if not have_lib or src_newer:
                if not _SRC.exists() or not _build():
                    return None
            lib = ctypes.CDLL(str(_LIB_PATH))
        except OSError:
            return None
        lib.ftpu_decode_files.restype = ctypes.c_long
        lib.ftpu_decode_files.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_long,
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.POINTER(ctypes.c_size_t),
            ctypes.POINTER(ctypes.c_size_t),
            ctypes.POINTER(ctypes.c_long),
            ctypes.c_int, ctypes.c_int]
        lib.ftpu_loader_version.restype = ctypes.c_int
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def decode_chunks(paths: Sequence[Optional[str]], chunk_shape, dtype,
                  fill_value=0, compressed: bool = True,
                  nthreads: Optional[int] = None) -> np.ndarray:
    """Decode chunk files in parallel. ``paths[i]`` may be None / missing
    (-> fill-valued chunk). Returns [n, *chunk_shape] of ``dtype``.
    ``nthreads=None`` adapts to min(8, cpu_count)."""
    if nthreads is None:
        nthreads = min(8, os.cpu_count() or 1)
    lib = _load()
    if lib is None:
        raise RuntimeError("native loader unavailable")
    from forest_tpu.data.zarrlite import normalize_fill_value

    dt = np.dtype(dtype)
    n = len(paths)
    chunk_nbytes = int(np.prod(chunk_shape)) * dt.itemsize
    fv = normalize_fill_value(fill_value)

    real = [(i, p) for i, p in enumerate(paths)
            if p is not None and os.path.exists(p)]
    # Only missing slots need the fill memset (hot path keeps np.empty).
    out = np.empty((n,) + tuple(chunk_shape), dtype=dt)
    present = {i for i, _ in real}
    for i in range(n):
        if i not in present:
            out[i] = fv
    buf = out.reshape(n, -1).view(np.uint8)
    if not real:
        return out
    c_paths = (ctypes.c_char_p * len(real))(
        *[str(p).encode() for _, p in real])
    offsets = (ctypes.c_size_t * len(real))(
        *[i * chunk_nbytes for i, _ in real])
    caps = (ctypes.c_size_t * len(real))(
        *([chunk_nbytes] * len(real)))
    results = (ctypes.c_long * len(real))()
    ok = lib.ftpu_decode_files(
        c_paths, len(real),
        buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        offsets, caps, results, 0 if compressed else 1, int(nthreads))
    for k, (i, p) in enumerate(real):
        # Missing files never reach the C call (filtered above), so ANY
        # negative code here -- including -1 -- is a genuine failure;
        # silently substituting fill values would fabricate data. A short
        # decode (wrong chunk shape / corruption) is equally fatal: the
        # Python path raises on reshape, so the native path must too.
        if results[k] < 0:
            raise RuntimeError(
                f"native decode failed for {p}: rc={results[k]}")
        if int(results[k]) != chunk_nbytes:
            raise RuntimeError(
                f"native decode size mismatch for {p}: got "
                f"{int(results[k])} bytes, expected {chunk_nbytes}")
    del ok
    return out


__all__ = ["available", "decode_chunks"]
