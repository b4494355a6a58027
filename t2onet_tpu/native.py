"""ctypes bindings for the native host-pipeline library (native/).

Every entry point has a pure-Python fallback so the framework works
unbuilt; `is_available()` reports which path is active. Build with
`sh native/build.sh`.
"""

from __future__ import annotations

import ctypes
import os
from typing import Optional

import numpy as np

_LIB: Optional[ctypes.CDLL] = None
_TRIED = False

_LIB_PATH = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "native", "libt2onet_native.so")


def _load() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    if not os.path.exists(_LIB_PATH):
        return None
    lib = ctypes.CDLL(_LIB_PATH)
    u8p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
    f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
    i64p = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
    c = ctypes.c_int
    lib.rle_decode_string.argtypes = [ctypes.c_char_p, c, c, u8p]
    lib.rle_decode_string.restype = c
    lib.rle_decode_counts.argtypes = [i64p, c, c, c, u8p]
    lib.rle_decode_counts.restype = c
    lib.resize_bilinear.argtypes = [f32p, c, c, c, f32p, c, c]
    lib.resize_nearest_u8.argtypes = [u8p, c, c, u8p, c, c]
    lib.bgr_u8_to_rgb_chw.argtypes = [u8p, c, c, f32p]
    lib.batch_resize_bilinear.argtypes = [f32p, c, c, c, c, f32p, c, c, c]
    _LIB = lib
    return lib


def is_available() -> bool:
    return _load() is not None


def rle_decode(rle: dict) -> np.ndarray:
    """COCO RLE -> (h, w) uint8 mask (native when built)."""
    lib = _load()
    h, w = rle["size"]
    counts = rle["counts"]
    if lib is not None:
        out = np.zeros((h, w), np.uint8)
        if isinstance(counts, (str, bytes)):
            s = counts.encode() if isinstance(counts, str) else counts
            rc = lib.rle_decode_string(s, h, w, out)
        else:
            arr = np.ascontiguousarray(counts, np.int64)
            rc = lib.rle_decode_counts(arr, len(arr), h, w, out)
        if rc != 0:
            raise ValueError("RLE counts do not sum to h*w")
        return out
    from t2onet_tpu.data.rle import rle_decode as py_decode

    return py_decode(rle)


def resize_bilinear(img_hwc: np.ndarray, oh: int, ow: int) -> np.ndarray:
    """(h, w, c) float32 -> (oh, ow, c), cv2.INTER_LINEAR semantics."""
    lib = _load()
    img_hwc = np.ascontiguousarray(img_hwc, np.float32)
    h, w, c = img_hwc.shape
    if lib is not None:
        out = np.empty((oh, ow, c), np.float32)
        lib.resize_bilinear(img_hwc, h, w, c, out, oh, ow)
        return out
    import cv2

    out = cv2.resize(img_hwc, (ow, oh), interpolation=cv2.INTER_LINEAR)
    # cv2 drops a size-1 channel axis; keep the (oh, ow, c) contract
    return out[..., None] if out.ndim == 2 else out


def resize_nearest(mask: np.ndarray, oh: int, ow: int) -> np.ndarray:
    lib = _load()
    mask = np.ascontiguousarray(mask, np.uint8)
    h, w = mask.shape
    if lib is not None:
        out = np.empty((oh, ow), np.uint8)
        lib.resize_nearest_u8(mask, h, w, out, oh, ow)
        return out
    import cv2

    return cv2.resize(mask, (ow, oh), interpolation=cv2.INTER_NEAREST)


def bgr_u8_to_rgb_chw(img: np.ndarray) -> np.ndarray:
    """(h, w, 3) uint8 BGR -> (3, h, w) float32 RGB/255."""
    lib = _load()
    img = np.ascontiguousarray(img, np.uint8)
    h, w, _ = img.shape
    if lib is not None:
        out = np.empty((3, h, w), np.float32)
        lib.bgr_u8_to_rgb_chw(img, h, w, out)
        return out
    return img[:, :, ::-1].astype(np.float32).transpose(2, 0, 1) / 255.0


def batch_resize_bilinear(imgs: np.ndarray, oh: int, ow: int,
                          n_threads: int = 4) -> np.ndarray:
    """(n, h, w, c) float32 -> (n, oh, ow, c) with a native thread pool."""
    lib = _load()
    imgs = np.ascontiguousarray(imgs, np.float32)
    n, h, w, c = imgs.shape
    if lib is not None:
        out = np.empty((n, oh, ow, c), np.float32)
        lib.batch_resize_bilinear(imgs, n, h, w, c, out, oh, ow, n_threads)
        return out
    return np.stack([resize_bilinear(im, oh, ow) for im in imgs])
