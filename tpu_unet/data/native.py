"""ctypes bindings for the native C++ data loader (native/loader.cc).

The native library is the runtime counterpart of torch's DataLoader worker
processes (reference: train.py:434-439): multithreaded JPEG/PNG decode +
PIL-compatible bicubic letterbox directly into the batch buffer.  Builds
on demand with make; every entry point falls back to the PIL path when the
library is unavailable.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Sequence

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libtpuunet_loader.so")
_lib = None


def _build() -> bool:
    try:
        subprocess.run(["make", "-C", _NATIVE_DIR], check=True,
                       capture_output=True)
        return os.path.exists(_LIB_PATH)
    except Exception:
        return False


def get_lib(build: bool = True):
    """Load (building if needed) the native library; None if unavailable."""
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH) and (not build or not _build()):
        return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        return None
    lib.dl_load_letterbox_batch.restype = ctypes.c_int
    lib.dl_load_letterbox_batch.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.POINTER(ctypes.c_uint8),
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
        ctypes.c_int,
    ]
    lib.dl_resize_bicubic.argtypes = [
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
    ]
    lib.dl_probe.restype = ctypes.c_int
    lib.dl_probe.argtypes = [ctypes.c_char_p, ctypes.POINTER(ctypes.c_int),
                             ctypes.POINTER(ctypes.c_int)]
    _lib = lib
    return lib


def available() -> bool:
    return get_lib() is not None


def load_letterbox_batch(paths: Sequence[str], out_h: int, out_w: int,
                         n_threads: int = 8):
    """Decode + letterbox a batch natively.

    Returns (batch uint8 (N,H,W,3), nws, nhs); raises RuntimeError on decode
    failure; falls back to PIL when the native lib is unavailable.
    """
    lib = get_lib()
    n = len(paths)
    out = np.empty((n, out_h, out_w, 3), np.uint8)
    nws = np.empty(n, np.int32)
    nhs = np.empty(n, np.int32)
    if lib is None:
        from PIL import Image

        from tpu_unet.data.transforms import cvt_rgb, letterbox_image

        for i, p in enumerate(paths):
            boxed, nw, nh = letterbox_image(cvt_rgb(Image.open(p)),
                                            (out_h, out_w))
            out[i] = np.asarray(boxed, np.uint8)
            nws[i], nhs[i] = nw, nh
        return out, nws, nhs

    arr = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    failures = lib.dl_load_letterbox_batch(
        arr, n, out_h, out_w,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        nws.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        nhs.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        n_threads)
    if failures:
        raise RuntimeError(f"{failures}/{n} images failed to decode")
    return out, nws, nhs


def resize_bicubic(img: np.ndarray, nh: int, nw: int) -> np.ndarray:
    """PIL-compatible bicubic resize of an (H,W,3) uint8 array."""
    lib = get_lib()
    if lib is None:
        from PIL import Image

        return np.asarray(Image.fromarray(img).resize((nw, nh), Image.BICUBIC))
    img = np.ascontiguousarray(img, np.uint8)
    out = np.empty((nh, nw, 3), np.uint8)
    lib.dl_resize_bicubic(
        img.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        img.shape[0], img.shape[1],
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), nh, nw)
    return out
