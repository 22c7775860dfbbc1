"""ctypes bindings for the native host runtime (native/loader.cc).

Builds on demand with `make -C native` (g++; no pybind11 in this image, so the
C ABI + ctypes is the binding layer). Falls back cleanly when the toolchain or
library is unavailable — data/loader.py's PIL pool is the portable reference
implementation with identical semantics.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import List, Optional, Tuple

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")
_LIB_PATH = os.path.abspath(os.path.join(_NATIVE_DIR, "libshmgan_native.so"))

_lib: Optional[ctypes.CDLL] = None


def build_native(force: bool = False) -> bool:
    """Compile the native library; returns True on success."""
    if os.path.exists(_LIB_PATH) and not force:
        return True
    try:
        subprocess.run(["make", "-C", os.path.abspath(_NATIVE_DIR)],
                       check=True, capture_output=True)
        return os.path.exists(_LIB_PATH)
    except (subprocess.CalledProcessError, FileNotFoundError):
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH) and not build_native():
        return None
    lib = ctypes.CDLL(_LIB_PATH)
    lib.shmgan_decode_batch.restype = ctypes.c_int
    lib.shmgan_decode_batch.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_uint8),
        ctypes.c_int,
    ]
    lib.shmgan_resize_normalize.restype = None
    lib.shmgan_resize_normalize.argtypes = [
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_int, ctypes.POINTER(ctypes.c_float),
    ]
    lib.shmgan_estimate_diffuse.restype = None
    lib.shmgan_estimate_diffuse.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int64,
        ctypes.POINTER(ctypes.c_float),
    ]
    if hasattr(lib, "shmgan_encode_png"):  # older prebuilt .so may lack it
        lib.shmgan_encode_png.restype = ctypes.c_int64
        lib.shmgan_encode_png.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64,
        ]
    _lib = lib
    return lib


def native_available() -> bool:
    return get_lib() is not None


def decode_batch(paths: List[str], image_size: int,
                 num_threads: int = 4) -> Tuple[np.ndarray, np.ndarray]:
    """Decode+resize+normalize a list of PPM/PGM/BMP/raw files natively.

    Returns (batch (N, S, S, 3) float32 in [0,1], ok (N,) uint8 flags)."""
    lib = get_lib()
    if lib is None:
        raise RuntimeError("native library unavailable")
    n = len(paths)
    out = np.zeros((n, image_size, image_size, 3), np.float32)
    status = np.zeros((n,), np.uint8)
    arr = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    lib.shmgan_decode_batch(
        arr, n, image_size, image_size,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        status.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), num_threads)
    return out, status


def resize_normalize(img_u8: np.ndarray, image_size: int) -> np.ndarray:
    """(H, W, C) uint8 -> (S, S, 3) float32 in [0,1] via the native resizer."""
    lib = get_lib()
    if lib is None:
        raise RuntimeError("native library unavailable")
    img_u8 = np.ascontiguousarray(img_u8)
    h, w = img_u8.shape[:2]
    c = img_u8.shape[2] if img_u8.ndim == 3 else 1
    out = np.zeros((image_size, image_size, 3), np.float32)
    lib.shmgan_resize_normalize(
        img_u8.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), h, w, c,
        image_size, image_size,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
    return out


def encode_png(img_u8: np.ndarray, level: int = 1) -> bytes:
    """Encode an (H, W) or (H, W, 1|3) uint8 image as PNG natively.

    Serving hot path: PIL's encoder sits on the per-request critical path of
    serve_http.py on a single-core host; the native encoder (filter-0 rows +
    one zlib deflate) is the rebuilt analogue of the image IO the reference
    delegates to TF's C++ runtime. level=1 is the fast serving default."""
    lib = get_lib()
    if lib is None or not hasattr(lib, "shmgan_encode_png"):
        raise RuntimeError("native library unavailable")
    img_u8 = np.ascontiguousarray(img_u8, np.uint8)
    if img_u8.ndim == 2:
        img_u8 = img_u8[..., None]
    h, w, c = img_u8.shape
    raw = (w * c + 1) * h
    cap = raw + raw // 1000 + 1024  # zlib worst case + chunk overhead
    out = np.empty((cap,), np.uint8)
    n = lib.shmgan_encode_png(
        img_u8.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), h, w, c,
        int(level), out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), cap)
    if n < 0:
        raise RuntimeError(f"native PNG encode failed (h={h} w={w} c={c})")
    return out[:n].tobytes()


def estimate_diffuse_native(views: np.ndarray) -> np.ndarray:
    """(V, ...) float32 -> channel-wise min across views (pseudo-diffuse)."""
    lib = get_lib()
    if lib is None:
        raise RuntimeError("native library unavailable")
    views = np.ascontiguousarray(views, np.float32)
    v = views.shape[0]
    size = int(np.prod(views.shape[1:]))
    out = np.zeros(views.shape[1:], np.float32)
    lib.shmgan_estimate_diffuse(
        views.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), v, size,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
    return out
