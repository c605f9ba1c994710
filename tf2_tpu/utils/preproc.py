"""Image preprocessing: ctypes binding to the native C++ library
(native/preproc.cpp) with an exact numpy reference/fallback.

Semantics (both paths): bilinear resize with half-pixel centers from HWC
uint8, per-channel ``(v/255 - mean)/std`` normalize, optional symmetric
int8 quantize ``clip(round(v/scale))``.
"""
from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "native")
_SO = os.path.join(_NATIVE_DIR, "libtf2preproc.so")

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)

_lib = None


def _load():
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_SO):
        try:
            subprocess.run(["make", "-C", _NATIVE_DIR], check=True,
                           capture_output=True, timeout=120)
        except Exception:
            _lib = False
            return _lib
    try:
        lib = ctypes.CDLL(_SO)
        lib.preproc_abi_version.restype = ctypes.c_int
        assert lib.preproc_abi_version() == 1
        fp = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
        u8 = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
        i8 = np.ctypeslib.ndpointer(np.int8, flags="C_CONTIGUOUS")
        ci = ctypes.c_int
        lib.preproc_batch_f32.argtypes = [u8, ci, ci, ci, ci, ci, ci, fp, fp,
                                          fp, ci]
        lib.preproc_batch_i8.argtypes = [u8, ci, ci, ci, ci, ci, ci, fp, fp,
                                         ctypes.c_float, i8, ci]
        _lib = lib
    except Exception:
        _lib = False
    return _lib


def have_native() -> bool:
    return bool(_load())


def _np_resize_bilinear(img: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Half-pixel-center bilinear, HWC float64 for exactness."""
    h, w, c = img.shape
    ys = (np.arange(out_h) + 0.5) * (h / out_h) - 0.5
    xs = (np.arange(out_w) + 0.5) * (w / out_w) - 0.5
    y0 = np.floor(ys).astype(int)
    x0 = np.floor(xs).astype(int)
    fy = (ys - y0)[:, None, None]
    fx = (xs - x0)[None, :, None]
    y0c = np.clip(y0, 0, h - 1)
    y1c = np.clip(y0 + 1, 0, h - 1)
    x0c = np.clip(x0, 0, w - 1)
    x1c = np.clip(x0 + 1, 0, w - 1)
    imgf = img.astype(np.float32)
    v00 = imgf[y0c][:, x0c]
    v01 = imgf[y0c][:, x1c]
    v10 = imgf[y1c][:, x0c]
    v11 = imgf[y1c][:, x1c]
    return ((v00 * (1 - fx) + v01 * fx) * (1 - fy) +
            (v10 * (1 - fx) + v11 * fx) * fy).astype(np.float32)


def preprocess(batch_u8: np.ndarray, out_size: int,
               mean: np.ndarray = IMAGENET_MEAN,
               std: np.ndarray = IMAGENET_STD,
               quant_scale: float | None = None,
               n_threads: int = 0, force_numpy: bool = False) -> np.ndarray:
    """(N, H, W, 3) uint8 -> (N, out, out, 3) float32 (or int8 when
    quant_scale given)."""
    batch_u8 = np.ascontiguousarray(batch_u8, np.uint8)
    n, h, w, c = batch_u8.shape
    mean = np.ascontiguousarray(mean, np.float32)
    std = np.ascontiguousarray(std, np.float32)
    nt = n_threads or min(os.cpu_count() or 1, 16)
    lib = None if force_numpy else _load()
    if lib:
        if quant_scale is None:
            out = np.empty((n, out_size, out_size, c), np.float32)
            lib.preproc_batch_f32(batch_u8, n, h, w, c, out_size, out_size,
                                  mean, std, out, nt)
        else:
            out = np.empty((n, out_size, out_size, c), np.int8)
            lib.preproc_batch_i8(batch_u8, n, h, w, c, out_size, out_size,
                                 mean, std, ctypes.c_float(quant_scale), out,
                                 nt)
        return out
    # numpy fallback (reference semantics)
    outs = []
    for i in range(n):
        r = _np_resize_bilinear(batch_u8[i], out_size, out_size)
        v = (r / 255.0 - mean) / std
        outs.append(v)
    out = np.stack(outs).astype(np.float32)
    if quant_scale is not None:
        out = np.clip(np.round(out / quant_scale), -127, 127).astype(np.int8)
    return out
