"""zarr-lite: a dependency-free Zarr v2 reader/writer.

The environment ships no ``zarr``/``numcodecs``; the reference's cubes are
Zarr v2 directories with blosc-LZ4 chunks (SURVEY.md §1 L1->L2 interface,
/root/reference/zarr_builder/va_vae_dataset_test.yaml:52-70). This module
implements the subset of the v2 spec those cubes use -- C-order chunked
arrays, nested groups, JSON attrs, blosc/zlib/raw compressors -- reading AND
writing, on-disk compatible with zarr-python.

Compression goes through ``libblosc.so.1`` via ctypes using the ``_ctx``
(thread-safe, stateless) entry points, so a thread-pool host loader can decode
chunks concurrently with the GIL released (blosc releases it internally; the
ctypes call itself releases the GIL for the C call).
"""
from __future__ import annotations

import ctypes
import ctypes.util
import json
import os
import threading
import zlib
from pathlib import Path
from typing import Any, Dict, Iterator, List, Optional, Sequence, Tuple

import numpy as np

# ---------------------------------------------------------------------------
# blosc via ctypes
# ---------------------------------------------------------------------------

_BLOSC_MAX_OVERHEAD = 16


class _Blosc:
    _lock = threading.Lock()
    _lib = None

    @classmethod
    def lib(cls):
        if cls._lib is None:
            with cls._lock:
                if cls._lib is None:
                    name = ctypes.util.find_library("blosc") or "libblosc.so.1"
                    lib = ctypes.CDLL(name)
                    lib.blosc_compress_ctx.restype = ctypes.c_int
                    lib.blosc_compress_ctx.argtypes = [
                        ctypes.c_int, ctypes.c_int, ctypes.c_size_t,
                        ctypes.c_size_t, ctypes.c_void_p, ctypes.c_void_p,
                        ctypes.c_size_t, ctypes.c_char_p, ctypes.c_size_t,
                        ctypes.c_int]
                    lib.blosc_decompress_ctx.restype = ctypes.c_int
                    lib.blosc_decompress_ctx.argtypes = [
                        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_size_t,
                        ctypes.c_int]
                    lib.blosc_cbuffer_sizes.restype = None
                    lib.blosc_cbuffer_sizes.argtypes = [
                        ctypes.c_void_p, ctypes.POINTER(ctypes.c_size_t),
                        ctypes.POINTER(ctypes.c_size_t),
                        ctypes.POINTER(ctypes.c_size_t)]
                    cls._lib = lib
        return cls._lib


def blosc_compress(data: bytes, typesize: int, cname: str = "lz4",
                   clevel: int = 5, shuffle: int = 1) -> bytes:
    lib = _Blosc.lib()
    n = len(data)
    dest = ctypes.create_string_buffer(n + _BLOSC_MAX_OVERHEAD)
    rc = lib.blosc_compress_ctx(clevel, shuffle, max(typesize, 1), n, data,
                                dest, len(dest), cname.encode(), 0, 1)
    if rc <= 0:
        raise RuntimeError(f"blosc_compress_ctx failed rc={rc}")
    return dest.raw[:rc]


_BLOSC_MIN_HEADER = 16
_BLOSC_MAX_NBYTES = 1 << 34  # 16 GiB sanity cap on a single chunk


def blosc_decompress(buf: bytes, nthreads: int = 1) -> bytes:
    if len(buf) < _BLOSC_MIN_HEADER:
        raise RuntimeError(
            f"truncated blosc chunk: {len(buf)} bytes (< 16-byte header)")
    lib = _Blosc.lib()
    nbytes = ctypes.c_size_t()
    cbytes = ctypes.c_size_t()
    blocksize = ctypes.c_size_t()
    src = ctypes.create_string_buffer(buf, len(buf))
    lib.blosc_cbuffer_sizes(src, ctypes.byref(nbytes), ctypes.byref(cbytes),
                            ctypes.byref(blocksize))
    if cbytes.value > len(buf) or nbytes.value > _BLOSC_MAX_NBYTES:
        raise RuntimeError(
            f"corrupt blosc header: cbytes={cbytes.value} "
            f"nbytes={nbytes.value} file={len(buf)}")
    dest = ctypes.create_string_buffer(nbytes.value)
    rc = lib.blosc_decompress_ctx(src, dest, nbytes.value, nthreads)
    if rc <= 0:
        raise RuntimeError(f"blosc_decompress_ctx failed rc={rc}")
    return dest.raw[:rc]


def normalize_fill_value(fv):
    """Decode a zarr v2 JSON fill value (None -> 0, 'NaN'/'Infinity'
    strings -> floats). Single source of truth for Python + native paths."""
    if fv is None:
        return 0
    if isinstance(fv, str):
        return {"NaN": np.nan, "Infinity": np.inf,
                "-Infinity": -np.inf}.get(fv, fv)
    return fv


# ---------------------------------------------------------------------------
# Compressor configs (the `.zarray` "compressor" JSON object)
# ---------------------------------------------------------------------------


def _compress(raw: bytes, comp: Optional[Dict[str, Any]], typesize: int) -> bytes:
    if comp is None:
        return raw
    cid = comp.get("id")
    if cid == "blosc":
        return blosc_compress(raw, typesize, comp.get("cname", "lz4"),
                              int(comp.get("clevel", 5)),
                              int(comp.get("shuffle", 1)))
    if cid == "zlib":
        return zlib.compress(raw, int(comp.get("level", 5)))
    raise ValueError(f"unsupported compressor {cid!r}")


def _decompress(buf: bytes, comp: Optional[Dict[str, Any]]) -> bytes:
    if comp is None:
        return buf
    cid = comp.get("id")
    if cid == "blosc":
        return blosc_decompress(buf)
    if cid == "zlib":
        return zlib.decompress(buf)
    raise ValueError(f"unsupported compressor {cid!r}")


# ---------------------------------------------------------------------------
# Arrays
# ---------------------------------------------------------------------------


class ZarrArray:
    """One Zarr v2 array directory. Supports numpy-style basic slicing reads,
    whole-chunk reads (the fast path for chunk-aligned loaders), and writes."""

    def __init__(self, path: str | Path):
        self.path = Path(path)
        meta = json.loads((self.path / ".zarray").read_text())
        if meta.get("zarr_format") != 2:
            raise ValueError(f"{path}: not a zarr v2 array")
        if meta.get("order", "C") != "C":
            raise ValueError("only C-order arrays supported")
        if meta.get("filters"):
            raise ValueError("filters not supported")
        self.shape: Tuple[int, ...] = tuple(meta["shape"])
        self.chunks: Tuple[int, ...] = tuple(meta["chunks"])
        self.dtype = np.dtype(meta["dtype"])
        self.fill_value = meta.get("fill_value")
        self.compressor = meta.get("compressor")
        self._meta = meta
        self._path_str = str(self.path)
        attrs_p = self.path / ".zattrs"
        self.attrs: Dict[str, Any] = (
            json.loads(attrs_p.read_text()) if attrs_p.exists() else {})

    @property
    def ndim(self) -> int:
        return len(self.shape)

    @property
    def cdata_shape(self) -> Tuple[int, ...]:
        return tuple(-(-s // c) for s, c in zip(self.shape, self.chunks))

    def _chunk_path(self, cidx: Sequence[int]) -> Path:
        return self.path / ".".join(str(i) for i in cidx)

    def _chunk_path_str(self, cidx: Sequence[int]) -> str:
        # Hot path: plain string join -- pathlib construction measured ~30%
        # of load_batch time at 4k+ chunk paths per batch.
        return "%s/%s" % (self._path_str, ".".join(map(str, cidx)))

    def _fill_chunk(self) -> np.ndarray:
        return np.full(self.chunks, normalize_fill_value(self.fill_value),
                       dtype=self.dtype)

    def read_chunk(self, cidx: Sequence[int]) -> np.ndarray:
        """Decode one full chunk (edge chunks returned at full chunk shape)."""
        p = self._chunk_path(cidx)
        if not p.exists():
            return self._fill_chunk()
        raw = _decompress(p.read_bytes(), self.compressor)
        return np.frombuffer(raw, dtype=self.dtype).reshape(self.chunks).copy()

    def read_chunks_batch(self, cidxs: Sequence[Sequence[int]],
                          use_native: Optional[bool] = None,
                          nthreads: Optional[int] = None) -> np.ndarray:
        """Decode many chunks at once -> [n, *chunks].

        With the native C++ loader available and a blosc compressor, the
        reads+decodes run in parallel native threads (csrc/zarr_decode.cpp);
        otherwise falls back to sequential :meth:`read_chunk`.
        ``nthreads=None`` adapts to the host: min(8, cpu_count) -- on the
        1-core axon box, 8 decode threads thrash against the relay's gRPC
        threads (measured 129 vs 42 ms/patch at 1 thread).
        """
        if nthreads is None:
            import os
            nthreads = min(8, os.cpu_count() or 1)
        if len(cidxs) == 0:
            return np.empty((0,) + tuple(self.chunks), self.dtype)
        is_blosc = (self.compressor or {}).get("id") == "blosc"
        if use_native is None:
            from forest_tpu.data import native
            use_native = is_blosc and native.available()
        if use_native and is_blosc:
            from forest_tpu.data import native
            paths = [self._chunk_path_str(c) for c in cidxs]
            return native.decode_chunks(paths, self.chunks, self.dtype,
                                        self.fill_value, True, nthreads)
        return np.stack([self.read_chunk(c) for c in cidxs])

    def write_chunk(self, cidx: Sequence[int], data: np.ndarray) -> None:
        if tuple(data.shape) != self.chunks:
            raise ValueError(f"chunk shape {data.shape} != {self.chunks}")
        raw = np.ascontiguousarray(data, dtype=self.dtype).tobytes()
        buf = _compress(raw, self.compressor, self.dtype.itemsize)
        self._chunk_path(cidx).write_bytes(buf)

    # ---- slicing -----------------------------------------------------------

    def _norm_sel(self, sel) -> List[slice]:
        if not isinstance(sel, tuple):
            sel = (sel,)
        sel = list(sel)
        while len(sel) < self.ndim:
            sel.append(slice(None))
        out = []
        for s, size in zip(sel, self.shape):
            if isinstance(s, (int, np.integer)):
                if s < -size or s >= size:
                    raise IndexError(
                        f"index {s} out of bounds for axis of size {size}")
                if s < 0:
                    s += size
                out.append(slice(s, s + 1))
            elif isinstance(s, slice):
                start, stop, step = s.indices(size)
                if step != 1:
                    raise ValueError("step slicing not supported")
                out.append(slice(start, stop))
            else:
                raise TypeError(f"unsupported index {s!r}")
        return out

    def __getitem__(self, sel) -> np.ndarray:
        slices = self._norm_sel(sel)
        out_shape = tuple(s.stop - s.start for s in slices)
        out = np.empty(out_shape, dtype=self.dtype)
        if any(d == 0 for d in out_shape):
            return out
        c0 = [s.start // c for s, c in zip(slices, self.chunks)]
        c1 = [(s.stop - 1) // c for s, c in zip(slices, self.chunks)]

        # Chunk-aligned fast path: decode all covered chunks in one native
        # parallel batch and assemble by block transpose -- bypasses the
        # per-chunk Python recursion that dominates aligned loader reads.
        aligned = all(
            s.start % c == 0 and (s.stop % c == 0 or s.stop == dim)
            for s, c, dim in zip(slices, self.chunks, self.shape))
        if aligned and (self.compressor or {}).get("id") == "blosc":
            from forest_tpu.data import native
            if native.available():
                grids = [range(a, b + 1) for a, b in zip(c0, c1)]
                import itertools
                cidxs = list(itertools.product(*grids))
                blocks = self.read_chunks_batch(cidxs, use_native=True)
                ngrid = tuple(len(g) for g in grids)
                nd = self.ndim
                # [g0, .., gn, ch0, .., chn] -> interleave -> crop
                b = blocks.reshape(ngrid + tuple(self.chunks))
                perm = [i // 2 if i % 2 == 0 else nd + i // 2
                        for i in range(2 * nd)]
                b = np.transpose(b, perm).reshape(
                    tuple(n * c for n, c in zip(ngrid, self.chunks)))
                crop = tuple(slice(0, s.stop - s.start) for s in slices)
                out = np.ascontiguousarray(b[crop])
                if not isinstance(sel, tuple):
                    sel = (sel,)
                squeeze = tuple(i for i, s in enumerate(sel)
                                if isinstance(s, (int, np.integer)))
                return out.squeeze(axis=squeeze) if squeeze else out

        def rec(dim: int, cidx: List[int]):
            if dim == self.ndim:
                chunk = self.read_chunk(cidx)
                src, dst = [], []
                for d in range(self.ndim):
                    cs = cidx[d] * self.chunks[d]
                    a = max(slices[d].start, cs)
                    b = min(slices[d].stop, cs + self.chunks[d])
                    src.append(slice(a - cs, b - cs))
                    dst.append(slice(a - slices[d].start,
                                     b - slices[d].start))
                out[tuple(dst)] = chunk[tuple(src)]
                return
            for i in range(c0[dim], c1[dim] + 1):
                rec(dim + 1, cidx + [i])

        rec(0, [])
        # collapse int-indexed dims like numpy? Keep full dims: basic slices
        # only -- callers use explicit slices.
        if not isinstance(sel, tuple):
            sel = (sel,)
        squeeze = tuple(i for i, s in enumerate(sel) if isinstance(s, int))
        return out.squeeze(axis=squeeze) if squeeze else out

    def __setitem__(self, sel, value) -> None:
        slices = self._norm_sel(sel)
        if any(s.stop - s.start == 0 for s in slices):
            return  # zero-size write: nothing to store
        value = np.broadcast_to(
            np.asarray(value, dtype=self.dtype),
            tuple(s.stop - s.start for s in slices))
        c0 = [s.start // c for s, c in zip(slices, self.chunks)]
        c1 = [max((s.stop - 1) // c, c0[d]) for d, (s, c) in
              enumerate(zip(slices, self.chunks))]

        def rec(dim: int, cidx: List[int]):
            if dim == self.ndim:
                if self._chunk_path(cidx).exists():
                    full = self.read_chunk(cidx)
                else:
                    full = self._fill_chunk()
                src, dst = [], []
                for d in range(self.ndim):
                    cs = cidx[d] * self.chunks[d]
                    a = max(slices[d].start, cs)
                    b = min(slices[d].stop, cs + self.chunks[d])
                    dst.append(slice(a - cs, b - cs))
                    src.append(slice(a - slices[d].start,
                                     b - slices[d].start))
                full[tuple(dst)] = value[tuple(src)]
                self.write_chunk(cidx, full)
                return
            for i in range(c0[dim], c1[dim] + 1):
                rec(dim + 1, cidx + [i])

        rec(0, [])

    def __array__(self, dtype=None) -> np.ndarray:
        a = self[tuple(slice(0, s) for s in self.shape)]
        return a.astype(dtype) if dtype is not None else a

    def write_attrs(self) -> None:
        (self.path / ".zattrs").write_text(json.dumps(self.attrs))


# ---------------------------------------------------------------------------
# Groups
# ---------------------------------------------------------------------------

DEFAULT_COMPRESSOR = {"id": "blosc", "cname": "lz4", "clevel": 3,
                      "shuffle": 1, "blocksize": 0}


class ZarrGroup:
    """A Zarr v2 group directory with nested groups/arrays and JSON attrs."""

    def __init__(self, path: str | Path):
        self.path = Path(path)
        attrs_p = self.path / ".zattrs"
        self.attrs: Dict[str, Any] = (
            json.loads(attrs_p.read_text()) if attrs_p.exists() else {})
        # Opened-node cache: loaders resolve the same array per channel per
        # patch; re-parsing .zarray every access measured ~5% of load_batch.
        # create_array/create_group below invalidate affected entries.
        self._node_cache: Dict[str, "ZarrGroup | ZarrArray"] = {}

    def __contains__(self, name: str) -> bool:
        p = self.path / name
        return (p / ".zarray").exists() or (p / ".zgroup").exists()

    def __getitem__(self, name: str) -> "ZarrGroup | ZarrArray":
        hit = self._node_cache.get(name)
        if hit is not None:
            return hit
        p = self.path
        for part in name.split("/"):
            p = p / part
        if (p / ".zarray").exists():
            node = ZarrArray(p)
        elif (p / ".zgroup").exists():
            node = ZarrGroup(p)
        else:
            raise KeyError(name)
        self._node_cache[name] = node
        return node

    def keys(self) -> List[str]:
        out = []
        for p in sorted(self.path.iterdir()):
            if p.is_dir() and ((p / ".zarray").exists()
                               or (p / ".zgroup").exists()):
                out.append(p.name)
        return out

    def arrays(self) -> Iterator[Tuple[str, ZarrArray]]:
        for k in self.keys():
            v = self[k]
            if isinstance(v, ZarrArray):
                yield k, v

    def groups(self) -> Iterator[Tuple[str, "ZarrGroup"]]:
        for k in self.keys():
            v = self[k]
            if isinstance(v, ZarrGroup):
                yield k, v

    def _invalidate(self, name: str) -> None:
        # A node cached under a nested path ("a/b") goes stale if "a" or
        # "a/b" is recreated, and vice versa — drop every cache entry on
        # either side of the created path, not just the exact key.
        prefix = name + "/"
        for k in list(self._node_cache):
            if k == name or k.startswith(prefix) \
                    or name.startswith(k + "/"):
                del self._node_cache[k]

    def create_group(self, name: str) -> "ZarrGroup":
        self._invalidate(name)
        p = self.path / name
        return create_group(p)

    def create_array(self, name: str, shape, chunks, dtype,
                     fill_value=0, compressor="default",
                     attrs: Optional[Dict[str, Any]] = None) -> ZarrArray:
        self._invalidate(name)
        return create_array(self.path / name, shape, chunks, dtype,
                            fill_value, compressor, attrs)

    def write_attrs(self) -> None:
        (self.path / ".zattrs").write_text(json.dumps(self.attrs))


def create_group(path: str | Path) -> ZarrGroup:
    p = Path(path)
    p.mkdir(parents=True, exist_ok=True)
    (p / ".zgroup").write_text(json.dumps({"zarr_format": 2}))
    return ZarrGroup(p)


def create_array(path: str | Path, shape, chunks, dtype, fill_value=0,
                 compressor="default",
                 attrs: Optional[Dict[str, Any]] = None) -> ZarrArray:
    p = Path(path)
    p.mkdir(parents=True, exist_ok=True)
    dt = np.dtype(dtype)
    # Zero-size dims are legal (e.g. a cube with no continuous channels)
    # but chunk extents must stay >= 1 for the chunk-grid arithmetic.
    chunks = [max(1, int(c)) for c in chunks]
    if compressor == "default":
        compressor = dict(DEFAULT_COMPRESSOR)
    fv = fill_value
    if fv is not None and isinstance(fv, float) and np.isnan(fv):
        fv = "NaN"
    meta = {
        "zarr_format": 2,
        "shape": list(shape),
        "chunks": list(chunks),
        "dtype": dt.str,
        "compressor": compressor,
        "fill_value": fv,
        "order": "C",
        "filters": None,
    }
    (p / ".zarray").write_text(json.dumps(meta))
    if attrs:
        (p / ".zattrs").write_text(json.dumps(attrs))
    return ZarrArray(p)


def consolidate_metadata(path: str | Path) -> Path:
    """Write zarr v2 consolidated metadata (``.zmetadata``): every
    ``.zgroup`` / ``.zarray`` / ``.zattrs`` in the hierarchy collected
    into one JSON document, so external zarr readers open the store with
    a single metadata read (the reference's ``zarr.consolidate_metadata``
    after every build -- build_zarr.py:1646, 2287)."""
    root = Path(path)
    meta: Dict[str, Any] = {}
    for p in sorted(root.rglob("*")):
        if p.name not in (".zgroup", ".zarray", ".zattrs"):
            continue
        rel = p.relative_to(root).as_posix()
        meta[rel] = json.loads(p.read_text() or "{}")
    doc = {"zarr_consolidated_format": 1, "metadata": meta}
    out = root / ".zmetadata"
    out.write_text(json.dumps(doc, indent=0, sort_keys=True))
    return out


def open_zarr(path: str | Path) -> ZarrGroup | ZarrArray:
    p = Path(path)
    if (p / ".zarray").exists():
        return ZarrArray(p)
    if (p / ".zgroup").exists():
        return ZarrGroup(p)
    raise FileNotFoundError(f"{path}: not a zarr array or group")


__all__ = ["ZarrArray", "ZarrGroup", "open_zarr", "create_group",
           "create_array", "consolidate_metadata", "blosc_compress",
           "blosc_decompress", "DEFAULT_COMPRESSOR"]
