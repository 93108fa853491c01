"""ctypes bindings for the native C++ runtime (native/raytrace_native.cpp).

Provides the LZ4 block codec used by the chunk disk cache and a strided
clipped 3D copy for host-side slice assembly.  The library is built on
demand with the system g++ (no pip dependencies); if a compiler is
unavailable every entry point degrades gracefully (the cache falls back to
zlib, copies fall back to numpy).
"""

from __future__ import annotations

import ctypes
import subprocess
import threading
from pathlib import Path

import numpy as np

_NATIVE_DIR = Path(__file__).parent.parent / "native"
_LIB_PATH = _NATIVE_DIR / "libraytrace_native.so"
_lock = threading.Lock()
_lib = None
_tried = False


def _build() -> bool:
    try:
        subprocess.run(
            ["make", "-s"], cwd=_NATIVE_DIR, check=True, capture_output=True, timeout=120
        )
        return _LIB_PATH.exists()
    except (OSError, subprocess.SubprocessError):
        return False


def _load():
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not _LIB_PATH.exists() and not _build():
            return None
        try:
            lib = ctypes.CDLL(str(_LIB_PATH))
        except OSError:
            return None
        lib.rt_lz4_compress_bound.restype = ctypes.c_int
        lib.rt_lz4_compress_bound.argtypes = [ctypes.c_int]
        lib.rt_lz4_compress.restype = ctypes.c_int
        lib.rt_lz4_compress.argtypes = [
            ctypes.c_char_p,
            ctypes.c_int,
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.c_int,
        ]
        lib.rt_lz4_decompress.restype = ctypes.c_int
        lib.rt_lz4_decompress.argtypes = [
            ctypes.c_char_p,
            ctypes.c_int,
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.c_int,
        ]
        lib.rt_copy3d.restype = None
        lib.rt_copy3d.argtypes = [
            ctypes.c_void_p,
            ctypes.c_void_p,
            ctypes.c_int,
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int64),
        ]
        _lib = lib
        return _lib


def lz4_available() -> bool:
    return _load() is not None


def lz4_compress(data: bytes) -> bytes:
    lib = _load()
    if lib is None:
        raise RuntimeError("native LZ4 unavailable")
    cap = lib.rt_lz4_compress_bound(len(data))
    out = (ctypes.c_uint8 * cap)()
    n = lib.rt_lz4_compress(data, len(data), out, cap)
    if n < 0:
        raise RuntimeError("LZ4 compression failed")
    return bytes(bytearray(out)[:n])


def lz4_decompress(data: bytes, decompressed_size: int) -> bytes:
    lib = _load()
    if lib is None:
        raise RuntimeError("native LZ4 unavailable")
    out = (ctypes.c_uint8 * decompressed_size)()
    n = lib.rt_lz4_decompress(data, len(data), out, decompressed_size)
    if n != decompressed_size:
        raise ValueError(f"LZ4 decompression failed (got {n})")
    return bytes(out)


def copy3d(
    src: np.ndarray,
    dst: np.ndarray,
    size,
    src_start=(0, 0, 0),
    dst_start=(0, 0, 0),
) -> None:
    """Clipped 3D block copy between C-contiguous (Z, Y, X) arrays.

    Coordinates in (x, y, z) order.  Uses the native memcpy kernel when
    available, else the numpy fallback in utils.coords.
    """
    lib = _load()
    if lib is None or not src.flags.c_contiguous or not dst.flags.c_contiguous:
        from .utils.coords import copy_3d_clipped

        copy_3d_clipped(src, dst, tuple(size), tuple(src_start), tuple(dst_start))
        return
    assert src.dtype == dst.dtype
    arr3 = lambda t: (ctypes.c_int64 * 3)(*[int(v) for v in t])
    sdim = (src.shape[2], src.shape[1], src.shape[0])
    ddim = (dst.shape[2], dst.shape[1], dst.shape[0])
    lib.rt_copy3d(
        src.ctypes.data,
        dst.ctypes.data,
        int(src.dtype.itemsize),
        arr3(sdim),
        arr3(ddim),
        arr3(size),
        arr3(src_start),
        arr3(dst_start),
    )
