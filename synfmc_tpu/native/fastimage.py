"""ctypes bindings for the first-party native image runtime (fastimage.cpp).

Replaces the PIL (third-party C) decode+resize on the loader hot path with
first-party C++: libpng decode, Pillow-bit-exact BILINEAR resampling, and a
threaded batch API that decodes a whole clip's frames in parallel outside
the GIL.

The shared object is built on demand with g++ (build-to-temp + atomic
rename, so concurrent loader workers race safely).  Every entry point
falls back to PIL per-file on unsupported formats; ``available()`` gates
use — set ``SYNFMC_NATIVE_IO=0`` to force the pure-PIL path.
"""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess
import tempfile

import numpy as np

logger = logging.getLogger("synfmc")

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "fastimage.cpp")
_SO = os.path.join(_HERE, "_fastimage.so")

_lib = None
_tried = False


def _build() -> bool:
    """Compile fastimage.cpp -> _fastimage.so.  Atomic, race-safe."""
    fd, tmp = tempfile.mkstemp(suffix=".so", dir=_HERE)
    os.close(fd)
    cmd = [
        "g++", "-O3", "-fPIC", "-shared", "-std=c++17", "-o", tmp, _SRC,
        "-lpng", "-lz", "-lpthread",
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        os.replace(tmp, _SO)
        return True
    except (subprocess.SubprocessError, OSError) as e:
        out = getattr(e, "stderr", b"") or b""
        logger.warning("fastimage native build failed (%s) %s — using PIL",
                       e, out.decode(errors="replace")[:500])
        try:
            os.unlink(tmp)
        except OSError:
            pass
        return False


def _load():
    global _lib, _tried
    if _tried:
        return _lib
    _tried = True
    if os.environ.get("SYNFMC_NATIVE_IO", "1") == "0":
        return None
    needs_build = (not os.path.exists(_SO)) or (
        os.path.getmtime(_SO) < os.path.getmtime(_SRC)
    )
    if needs_build and not _build():
        return None
    try:
        lib = ctypes.CDLL(_SO)
    except OSError as e:
        logger.warning("fastimage load failed (%s) — using PIL", e)
        return None
    lib.sfi_png_info.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
    ]
    lib.sfi_png_info.restype = ctypes.c_int
    lib.sfi_png_decode.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_uint8),
        ctypes.c_int, ctypes.c_int, ctypes.c_int,
    ]
    lib.sfi_png_decode.restype = ctypes.c_int
    lib.sfi_decode_resize_batch.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.POINTER(ctypes.c_float), ctypes.c_int,
    ]
    lib.sfi_decode_resize_batch.restype = ctypes.c_int
    lib.sfi_resize_bilinear.argtypes = [
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.POINTER(ctypes.c_uint8), ctypes.c_int,
        ctypes.c_int,
    ]
    lib.sfi_resize_bilinear.restype = ctypes.c_int
    lib.sfi_min_enclosing_circle.argtypes = [
        ctypes.POINTER(ctypes.c_double), ctypes.c_longlong,
        ctypes.POINTER(ctypes.c_double),
    ]
    lib.sfi_min_enclosing_circle.restype = ctypes.c_int
    _lib = lib
    return _lib


def available() -> bool:
    return _load() is not None


def _u8ptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))


def decode(path: str) -> np.ndarray | None:
    """np.array(PIL.Image.open(path)) equivalent for gray8/RGB8/RGBA8 PNGs.

    Returns None when the file's format needs the PIL fallback.
    """
    lib = _load()
    if lib is None:
        return None
    w = ctypes.c_int()
    h = ctypes.c_int()
    c = ctypes.c_int()
    if lib.sfi_png_info(path.encode(), ctypes.byref(w), ctypes.byref(h),
                        ctypes.byref(c)) != 0:
        return None
    shape = (h.value, w.value) if c.value == 1 else (h.value, w.value, c.value)
    out = np.empty(shape, np.uint8)
    if lib.sfi_png_decode(path.encode(), _u8ptr(out), w.value, h.value,
                          c.value) != 0:
        return None
    return out


def imread(path: str) -> np.ndarray:
    """np.array(PIL.Image.open(path)) with the native decoder when possible.

    Single source of truth for raw PNG reads on the loader hot path
    (frame masks, captions.py visibility tests); PIL handles any format
    the native decoder declines (palette, 16-bit, non-PNG).
    """
    a = decode(path) if path.endswith(".png") else None
    if a is None:
        from PIL import Image

        a = np.array(Image.open(path))
    return a


def resize_bilinear(img: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """PIL-bit-exact BILINEAR resize of a uint8 (H, W[, C]) array."""
    lib = _load()
    assert lib is not None
    squeeze = img.ndim == 2
    a = np.ascontiguousarray(img[..., None] if squeeze else img)
    h, w, c = a.shape
    out = np.empty((out_h, out_w, c), np.uint8)
    rc = lib.sfi_resize_bilinear(_u8ptr(a), h, w, c, _u8ptr(out), out_h, out_w)
    assert rc == 0, f"sfi_resize_bilinear rc={rc}"
    return out[..., 0] if squeeze else out


def min_enclosing_circle(points: np.ndarray):
    """Exact minimum enclosing circle of (N, 2) (x, y) points ->
    ((cx, cy), r), or None when the native library is unavailable."""
    lib = _load()
    if lib is None:
        return None
    pts = np.ascontiguousarray(points, np.float64)
    if pts.ndim != 2 or pts.shape[1] != 2 or len(pts) == 0:
        return None
    out = np.empty(3, np.float64)
    rc = lib.sfi_min_enclosing_circle(
        pts.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), len(pts),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
    )
    if rc != 0:
        return None
    return (float(out[0]), float(out[1])), float(out[2])


def decode_resize_batch(paths: list[str], out_h: int, out_w: int,
                        threads: int | None = None) -> np.ndarray | None:
    """Decode+RGB+resize+[0,1]-float a clip of PNGs -> (N, out_h, out_w, 3).

    The per-file contract is UnrealTrajVideoDataset._load_and_resize;
    decode work runs on C++ threads (default: SYNFMC_NATIVE_IO_THREADS or
    min(n, cpu_count)).  Returns None if any file needs the PIL fallback
    (caller redoes the whole clip with PIL — keeps the output single-source).
    """
    lib = _load()
    if lib is None or not paths:
        return None
    if threads is None:
        threads = int(os.environ.get("SYNFMC_NATIVE_IO_THREADS", 0)) or min(
            len(paths), os.cpu_count() or 1
        )
    n = len(paths)
    out = np.empty((n, out_h, out_w, 3), np.float32)
    arr = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    rc = lib.sfi_decode_resize_batch(
        arr, n, out_h, out_w,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), threads,
    )
    if rc != 0:
        return None
    return out
