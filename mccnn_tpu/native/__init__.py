"""Native (C++) host-path helpers, loaded via ctypes.

The shared library is built lazily on first import with g++ (cached next to
the source); when no toolchain is available everything falls back to numpy,
so the package never hard-depends on the binary."""

from __future__ import annotations

import ctypes
import os
import subprocess
import sys

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRCS = [
    os.path.join(_DIR, "fastparse.cpp"),
    os.path.join(_DIR, "hostpipe.cpp"),
]
_SO = os.path.join(_DIR, "libmccnn_native.so")

_lib = None


def _build() -> bool:
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-pthread", "-o", _SO, *_SRCS],
            check=True,
            capture_output=True,
        )
        return True
    except (OSError, subprocess.CalledProcessError) as e:  # pragma: no cover
        print(f"mccnn_tpu.native: build failed ({e}); numpy fallback", file=sys.stderr)
        return False


def _load():
    global _lib
    if _lib is not None:
        return _lib
    src_mtime = max(os.path.getmtime(s) for s in _SRCS)
    if not os.path.exists(_SO) or os.path.getmtime(_SO) < src_mtime:
        if not _build():
            _lib = False
            return _lib
    try:
        lib = ctypes.CDLL(_SO)
    except OSError:  # pragma: no cover
        _lib = False
        return _lib
    lib.mccnn_count_floats.restype = ctypes.c_long
    lib.mccnn_count_floats.argtypes = [ctypes.c_char_p, ctypes.c_long]
    lib.mccnn_parse_floats.restype = ctypes.c_long
    lib.mccnn_parse_floats.argtypes = [
        ctypes.c_char_p,
        ctypes.c_long,
        ctypes.POINTER(ctypes.c_float),
        ctypes.c_long,
    ]
    lib.mccnn_parse_ints.restype = ctypes.c_long
    lib.mccnn_parse_ints.argtypes = [
        ctypes.c_char_p,
        ctypes.c_long,
        ctypes.POINTER(ctypes.c_int),
        ctypes.c_long,
    ]
    lib.mccnn_count_rows.restype = ctypes.c_long
    lib.mccnn_count_rows.argtypes = [ctypes.c_char_p, ctypes.c_long]
    lib.mccnn_assemble_batch.restype = None
    lib.mccnn_assemble_batch.argtypes = [
        ctypes.POINTER(ctypes.POINTER(ctypes.c_float)),
        ctypes.POINTER(ctypes.c_int64),
        ctypes.c_int64,  # batch
        ctypes.c_int64,  # n_out
        ctypes.c_uint64,  # seed
        ctypes.c_int,  # flags
        ctypes.c_float,  # jitter_sigma
        ctypes.c_float,  # jitter_clip
        ctypes.c_float,  # scale_lo
        ctypes.c_float,  # scale_hi
        ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_int64),  # out_idx (nullable)
        ctypes.c_int,  # n_threads
    ]
    lib.mccnn_extract_blocks.restype = None
    lib.mccnn_extract_blocks.argtypes = [
        ctypes.POINTER(ctypes.POINTER(ctypes.c_float)),
        ctypes.POINTER(ctypes.c_int64),
        ctypes.c_int64,  # batch
        ctypes.c_float,  # half block size
        ctypes.c_int64,  # n_out
        ctypes.c_uint64,  # seed
        ctypes.c_int,  # flags
        ctypes.c_float,  # jitter_sigma
        ctypes.c_float,  # jitter_clip
        ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_int64),
        ctypes.POINTER(ctypes.c_uint8),
        ctypes.c_int,  # n_threads
    ]
    _lib = lib
    return _lib


def native_available() -> bool:
    return bool(_load())


def fast_parse_floats(data: bytes, delimiter: str | None = None) -> np.ndarray:
    """Parse an ascii float table into an (n_rows, n_cols) float32 array.

    ``delimiter`` is ignored (the scanner accepts comma/space/tab/semicolon
    interchangeably); kept for API compatibility with numpy call sites."""
    lib = _load()
    if not lib:
        import io as _io

        return np.loadtxt(
            _io.BytesIO(data),
            delimiter="," if delimiter == "," else None,
            dtype=np.float32,
            ndmin=2,
        )
    buf = data + b"\0"
    n = lib.mccnn_count_floats(buf, len(data))
    rows = lib.mccnn_count_rows(buf, len(data))
    out = np.empty(n, np.float32)
    got = lib.mccnn_parse_floats(
        buf, len(data), out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), n
    )
    out = out[:got]
    if rows > 0 and got % rows == 0:
        return out.reshape(rows, got // rows)
    return out.reshape(1, -1) if got else out.reshape(0, 0)


def assemble_batch(
    clouds: list,
    n_points: int,
    seed: int,
    *,
    augment: bool = True,
    rotate: bool | None = None,
    jitter: bool | None = None,
    scale: bool | None = None,
    jitter_sigma: float = 0.01,
    jitter_clip: float = 0.05,
    scale_lo: float = 0.9,
    scale_hi: float = 1.1,
    return_idx: bool = False,
    threads: int | None = None,
):
    """Threaded C++ batch assembly: sample -> rotate-z -> jitter -> scale ->
    unit-cube normalize for every cloud in one call (the hot host-side path
    of the reference's DataSet.py, SURVEY §2.2). Deterministic in ``seed``
    and independent of ``threads``. ``rotate``/``jitter``/``scale`` default
    to ``augment``; ``return_idx=True`` additionally returns the chosen
    source rows (batch, n_points) so callers can gather per-point payloads
    (labels, normals). Returns None when the native library is unavailable
    (callers fall back to the numpy path)."""
    lib = _load()
    if not lib:
        return None
    batch = len(clouds)
    arrs = [np.ascontiguousarray(c, dtype=np.float32) for c in clouds]
    ptrs = (ctypes.POINTER(ctypes.c_float) * batch)(
        *[a.ctypes.data_as(ctypes.POINTER(ctypes.c_float)) for a in arrs]
    )
    sizes = np.asarray([len(a) for a in arrs], np.int64)
    out = np.empty((batch, n_points, 3), np.float32)
    flags = 0
    if augment if rotate is None else rotate:
        flags |= 1
    if augment if jitter is None else jitter:
        flags |= 2
    if augment if scale is None else scale:
        flags |= 4
    idx = np.empty((batch, n_points), np.int64) if return_idx else None
    if threads is None:
        threads = min(batch, os.cpu_count() or 1)
    lib.mccnn_assemble_batch(
        ptrs,
        sizes.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        batch,
        n_points,
        ctypes.c_uint64(seed & (2**64 - 1)),
        flags,
        jitter_sigma,
        jitter_clip,
        scale_lo,
        scale_hi,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        idx.ctypes.data_as(ctypes.POINTER(ctypes.c_int64))
        if idx is not None
        else None,
        threads,
    )
    return (out, idx) if return_idx else out


def extract_blocks(
    scenes: list,
    n_points: int,
    block_size: float,
    seed: int,
    *,
    augment: bool = False,
    jitter_sigma: float = 0.005,
    jitter_clip: float = 0.02,
    threads: int | None = None,
):
    """ScanNet-style block batching in C++ (SURVEY §5.7): random block
    center from the scene's own points (retrying empty columns), collect the
    xy column, sample/pad to ``n_points``, rotate-z + jitter, unit-cube
    normalize. Returns ``(points, idx, mask)`` with ``idx`` the scene rows
    (for label gathers) — or None when the native library is unavailable."""
    lib = _load()
    if not lib:
        return None
    batch = len(scenes)
    arrs = [np.ascontiguousarray(s, dtype=np.float32) for s in scenes]
    ptrs = (ctypes.POINTER(ctypes.c_float) * batch)(
        *[a.ctypes.data_as(ctypes.POINTER(ctypes.c_float)) for a in arrs]
    )
    sizes = np.asarray([len(a) for a in arrs], np.int64)
    out = np.empty((batch, n_points, 3), np.float32)
    idx = np.empty((batch, n_points), np.int64)
    mask = np.empty((batch, n_points), np.uint8)
    if threads is None:
        threads = min(batch, os.cpu_count() or 1)
    lib.mccnn_extract_blocks(
        ptrs,
        sizes.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        batch,
        block_size / 2.0,
        n_points,
        ctypes.c_uint64(seed & (2**64 - 1)),
        (1 | 2) if augment else 0,
        jitter_sigma,
        jitter_clip,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        idx.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        mask.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        threads,
    )
    return out, idx, mask.astype(bool)


def fast_parse_ints(data: bytes) -> np.ndarray:
    """Parse whitespace-separated ints (ShapeNet .seg files)."""
    lib = _load()
    if not lib:
        import io as _io

        return np.loadtxt(_io.BytesIO(data), dtype=np.int32).reshape(-1)
    buf = data + b"\0"
    n = lib.mccnn_count_floats(buf, len(data))
    out = np.empty(n, np.int32)
    got = lib.mccnn_parse_ints(
        buf, len(data), out.ctypes.data_as(ctypes.POINTER(ctypes.c_int)), n
    )
    return out[:got]
