"""ctypes bindings for the native host-IO library (native/pf_io.cc).

Builds native/libpfio.so on first use (make; g++ is in the image) and falls
back to numpy implementations when unavailable — the dataset code calls
these helpers unconditionally.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libpfio.so")
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if os.environ.get("PF_DISABLE_NATIVE"):
            return None
        try:
            if not os.path.exists(_LIB_PATH):
                subprocess.run(["make", "-C", _NATIVE_DIR], check=True,
                               capture_output=True)
            lib = ctypes.CDLL(_LIB_PATH)
            lib.pf_load_raw_bgr.restype = ctypes.c_int
            lib.pf_load_raw_bgr.argtypes = [
                ctypes.c_char_p, ctypes.POINTER(ctypes.c_float),
                ctypes.c_int64, ctypes.c_int64]
            lib.pf_decode_bgr_u8.argtypes = [
                ctypes.POINTER(ctypes.c_uint8),
                ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
                ctypes.c_int64]
            lib.pf_resize_bilinear_ac.argtypes = [
                ctypes.POINTER(ctypes.c_float),
                ctypes.POINTER(ctypes.c_float)] + [ctypes.c_int64] * 5
            lib.pf_crop_resize.argtypes = [
                ctypes.POINTER(ctypes.c_float),
                ctypes.POINTER(ctypes.c_float)] + [ctypes.c_int64] * 9
            _lib = lib
        except (OSError, subprocess.CalledProcessError):
            _lib = None
        return _lib


def _fptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def load_raw_bgr(path: str, h: int = 2160, w: int = 3840) -> np.ndarray:
    """.raw uint8 BGR file -> float32 RGB HWC in [0,1]."""
    lib = _load()
    if lib is not None:
        out = np.empty((h, w, 3), np.float32)
        rc = lib.pf_load_raw_bgr(path.encode(), _fptr(out), h, w)
        if rc == 0:
            return out
    img = np.fromfile(path, dtype=np.uint8).reshape(h, w, 3)
    return img.astype(np.float32)[:, :, ::-1] / 255.0


def decode_bgr_u8(buf: np.ndarray) -> np.ndarray:
    """uint8 HWC BGR -> float32 RGB in [0,1]."""
    lib = _load()
    h, w, _ = buf.shape
    if lib is not None and buf.flags["C_CONTIGUOUS"]:
        out = np.empty((h, w, 3), np.float32)
        lib.pf_decode_bgr_u8(
            buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            _fptr(out), h, w)
        return out
    return buf.astype(np.float32)[:, :, ::-1] / 255.0


def resize_bilinear_ac(img: np.ndarray, oh: int, ow: int) -> np.ndarray:
    """float32 HWC (or HW) bilinear align_corners=True resize."""
    lib = _load()
    squeeze = img.ndim == 2
    if squeeze:
        img = img[..., None]
    h, w, c = img.shape
    if (h, w) == (oh, ow):
        out = img.astype(np.float32)
        return out[..., 0] if squeeze else out
    if lib is not None:
        src = np.ascontiguousarray(img, np.float32)
        out = np.empty((oh, ow, c), np.float32)
        lib.pf_resize_bilinear_ac(_fptr(src), _fptr(out), h, w, c, oh, ow)
        return out[..., 0] if squeeze else out
    from patchfusion_tpu.ops.resize import resize_matrix
    wh = resize_matrix(oh, h, "bilinear", align_corners=True)
    ww = resize_matrix(ow, w, "bilinear", align_corners=True)
    out = np.einsum("ph,hwc,qw->pqc", wh, img.astype(np.float32), ww)
    return out[..., 0] if squeeze else out


def crop_resize(img: np.ndarray, y: int, x: int, ch: int, cw: int,
                oh: int, ow: int) -> np.ndarray:
    """Fused crop + bilinear-ac resize of a float32 HWC image."""
    lib = _load()
    if lib is not None and img.dtype == np.float32 and \
            img.flags["C_CONTIGUOUS"]:
        h, w, c = img.shape
        out = np.empty((oh, ow, c), np.float32)
        lib.pf_crop_resize(_fptr(img), _fptr(out), h, w, c, y, x, ch, cw,
                           oh, ow)
        return out
    return resize_bilinear_ac(img[y:y + ch, x:x + cw], oh, ow)
