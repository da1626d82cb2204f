"""ctypes bindings to the native C++ runtime (native/sgrt_native.cpp).

The library is built lazily on first use (`make -C native`, a single
g++ -O3 -shared compile, cached). All callers treat this module as a fast
path: every function has a pure-Python fallback at its call site, and any
build/load failure degrades silently to that fallback.

Native components and their reference counterparts:
    sgrt_read_obj   ← tinyobjloader (vendored, src/include/tiny_obj_loader.h)
    sgrt_write_png  ← stb_image_write (main.cpp:306)
    sgrt_write_pngs ← thread_pool_t-parallel frame output (thread-pool.h)
    sgrt_write_gif  ← gen-gif.sh (orbit frames → ffmpeg gif)
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")
_LIB_PATH = os.path.abspath(os.path.join(_NATIVE_DIR, "libsgrt_native.so"))

_lock = threading.Lock()
_lib = None
_lib_failed = False


def _load():
    """Build (if needed) and dlopen the native library; None on any failure."""
    global _lib, _lib_failed
    if _lib is not None or _lib_failed:
        return _lib
    with _lock:
        if _lib is not None or _lib_failed:
            return _lib
        try:
            if not os.path.exists(_LIB_PATH):
                subprocess.run(
                    ["make", "-C", os.path.abspath(_NATIVE_DIR)],
                    check=True, capture_output=True, timeout=120,
                )
            lib = ctypes.CDLL(_LIB_PATH)
            lib.sgrt_read_obj.restype = ctypes.c_long
            lib.sgrt_read_obj.argtypes = [
                ctypes.c_char_p, ctypes.POINTER(ctypes.c_float), ctypes.c_long]
            lib.sgrt_write_png.restype = ctypes.c_int
            lib.sgrt_write_png.argtypes = [
                ctypes.c_char_p, ctypes.c_int, ctypes.c_int,
                ctypes.POINTER(ctypes.c_ubyte)]
            lib.sgrt_write_pngs.restype = ctypes.c_int
            lib.sgrt_write_pngs.argtypes = [
                ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int,
                ctypes.c_int, ctypes.POINTER(ctypes.c_ubyte), ctypes.c_int]
            lib.sgrt_write_gif.restype = ctypes.c_int
            lib.sgrt_write_gif.argtypes = [
                ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
                ctypes.POINTER(ctypes.c_ubyte), ctypes.c_int]
            _lib = lib
        except Exception:
            _lib_failed = True
    return _lib


def available() -> bool:
    return _load() is not None


def read_obj_vertices_native(path: str) -> np.ndarray | None:
    """(N, 3) float32 vertices, or None if the native lib is unavailable."""
    lib = _load()
    if lib is None:
        return None
    count = lib.sgrt_read_obj(path.encode(), None, 0)
    if count < 0:
        raise FileNotFoundError(path)
    if count == 0:
        raise ValueError(f"no vertices found in {path}")
    out = np.empty((count, 3), np.float32)
    got = lib.sgrt_read_obj(
        path.encode(), out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        count,
    )
    return out[:got]


def write_png_native(path: str, rgba: np.ndarray) -> bool:
    """Write (H, W, 4) uint8 → PNG. False if the native lib is unavailable."""
    lib = _load()
    if lib is None:
        return False
    rgba = np.ascontiguousarray(rgba, np.uint8)
    h, w, _ = rgba.shape
    rc = lib.sgrt_write_png(
        path.encode(), w, h, rgba.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)))
    if rc != 0:
        raise OSError(f"sgrt_write_png failed ({rc}) for {path}")
    return True


def write_pngs_native(paths: list[str], frames: np.ndarray,
                      threads: int = 0) -> bool:
    """Thread-pooled batch write: frames (N, H, W, 4) uint8 → paths."""
    lib = _load()
    if lib is None:
        return False
    frames = np.ascontiguousarray(frames, np.uint8)
    n, h, w, _ = frames.shape
    assert len(paths) == n
    arr = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    rc = lib.sgrt_write_pngs(
        arr, n, w, h,
        frames.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)), threads)
    if rc != 0:
        raise OSError(f"sgrt_write_pngs: {rc} frames failed")
    return True


def write_gif_native(path: str, frames: np.ndarray, delay_cs: int = 4) -> bool:
    """Animated GIF from (N, H, W, 3) uint8 frames (orbit output, the
    gen-gif.sh analog). False if the native lib is unavailable."""
    lib = _load()
    if lib is None:
        return False
    frames = np.ascontiguousarray(frames, np.uint8)
    n, h, w, _ = frames.shape
    rc = lib.sgrt_write_gif(
        path.encode(), w, h, n,
        frames.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)), delay_cs)
    if rc != 0:
        raise OSError(f"sgrt_write_gif failed ({rc}) for {path}")
    return True
