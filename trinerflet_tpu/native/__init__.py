"""ctypes bindings for the C++ runtime library (native/trinerflet_native.cpp).

Build-on-first-use, mirroring the reference's JIT extension loading pattern
(aux_libs/*/backend.py: torch cpp_extension.load fallback): the shared object
is compiled with g++ -O3 -fopenmp on first import into a cache dir, then
dlopened with ctypes. Every entry point has a pure-Python fallback, so the
framework works even without a toolchain.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

__all__ = ["available", "load_image_batch", "psnr", "ssim", "decode_png",
           "marching_tetrahedra"]

_SRC = os.path.join(os.path.dirname(__file__), "..", "..", "native", "trinerflet_native.cpp")
_LIB: Optional[ctypes.CDLL] = None
_TRIED = False


def _build_and_load() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    src = os.path.abspath(_SRC)
    if not os.path.exists(src):
        return None
    cache = os.environ.get(
        "TRINERFLET_NATIVE_CACHE", os.path.expanduser("~/.cache/trinerflet_tpu")
    )
    os.makedirs(cache, exist_ok=True)
    so_path = os.path.join(cache, "libtrinerflet_native.so")
    if not os.path.exists(so_path) or os.path.getmtime(so_path) < os.path.getmtime(src):
        cmd = [
            "g++", "-O3", "-march=native", "-shared", "-fPIC", "-fopenmp",
            src, "-o", so_path, "-lz",
        ]
        try:
            subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(so_path)
    except OSError:
        return None
    lib.tn_psnr.restype = ctypes.c_double
    lib.tn_psnr.argtypes = [ctypes.POINTER(ctypes.c_float)] * 2 + [ctypes.c_long]
    lib.tn_ssim.restype = ctypes.c_double
    lib.tn_ssim.argtypes = [ctypes.POINTER(ctypes.c_float)] * 2 + [ctypes.c_int] * 3
    lib.tn_decode_png_file.restype = ctypes.c_int
    lib.tn_load_image_batch.restype = ctypes.c_int
    lib.tn_marching_tets.restype = ctypes.c_long
    lib.tn_marching_tets.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_float, ctypes.c_float, ctypes.c_float,
        ctypes.c_float, ctypes.c_float, ctypes.c_void_p, ctypes.c_long,
    ]
    _LIB = lib
    return lib


def available() -> bool:
    return _build_and_load() is not None


def _fptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    lib = _build_and_load()
    a = np.ascontiguousarray(a, np.float32)
    b = np.ascontiguousarray(b, np.float32)
    if lib is None:
        from ..train.metrics import psnr as py_psnr

        return py_psnr(a, b)
    return float(lib.tn_psnr(_fptr(a), _fptr(b), a.size))


def ssim(a: np.ndarray, b: np.ndarray) -> float:
    lib = _build_and_load()
    a = np.ascontiguousarray(a, np.float32)
    b = np.ascontiguousarray(b, np.float32)
    if lib is None:
        from ..train.metrics import ssim as py_ssim

        return py_ssim(a, b)
    H, W, C = a.shape
    return float(lib.tn_ssim(_fptr(a), _fptr(b), H, W, C))


def decode_png(path: str) -> np.ndarray:
    """Decode one 8-bit PNG to (H, W, C) uint8 via the native decoder."""
    lib = _build_and_load()
    if lib is None:
        raise RuntimeError("native library unavailable")
    import struct

    with open(path, "rb") as f:
        head = f.read(32)
    w = struct.unpack(">I", head[16:20])[0]
    h = struct.unpack(">I", head[20:24])[0]
    out = np.empty((h * w * 4,), np.uint8)
    ww = ctypes.c_int()
    hh = ctypes.c_int()
    ch = ctypes.c_int()
    rc = lib.tn_decode_png_file(
        path.encode(), ctypes.byref(ww), ctypes.byref(hh), ctypes.byref(ch),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), out.size,
    )
    if rc != 0:
        raise ValueError(f"PNG decode failed ({rc}): {path}")
    return out[: hh.value * ww.value * ch.value].reshape(hh.value, ww.value, ch.value)


def marching_tetrahedra(
    grid: np.ndarray, threshold: float, origin=(0.0, 0.0, 0.0), spacing: float = 1.0
) -> Optional[np.ndarray]:
    """OpenMP iso-surface extraction: (X, Y, Z) grid -> (T, 3, 3) triangle
    soup (same decomposition as ops/meshing.marching_tetrahedra). Returns
    None when the native lib is unavailable (caller falls back to numpy)."""
    lib = _build_and_load()
    if lib is None:
        return None
    g = np.ascontiguousarray(grid, np.float32)
    X, Y, Z = g.shape
    ox, oy, oz = (float(v) for v in origin)
    n = lib.tn_marching_tets(_fptr(g), X, Y, Z, float(threshold),
                             ox, oy, oz, float(spacing), None, 0)
    out = np.empty((int(n), 3, 3), np.float32)
    if n:
        lib.tn_marching_tets(_fptr(g), X, Y, Z, float(threshold),
                             ox, oy, oz, float(spacing),
                             out.ctypes.data_as(ctypes.c_void_p), int(n))
    return out


def load_image_batch(paths, H: int, W: int, downscale: int = 1, out_channels: int = 4) -> np.ndarray:
    """Threaded decode of same-shape PNGs -> (V, H/ds, W/ds, out_channels)
    float32 in [0, 1]. Falls back to cv2 when the native lib is unavailable."""
    lib = _build_and_load()
    if lib is None:
        import cv2

        imgs = []
        for p in paths:
            img = cv2.imread(p, cv2.IMREAD_UNCHANGED)
            if img.ndim == 3 and img.shape[-1] >= 3:
                img[..., :3] = img[..., 2::-1]
            img = img.astype(np.float32) / 255.0
            if img.ndim == 2:
                img = np.repeat(img[..., None], 3, -1)
            if img.shape[-1] == 3 and out_channels == 4:
                img = np.concatenate([img, np.ones_like(img[..., :1])], -1)
            if downscale > 1:
                img = cv2.resize(img, (W // downscale, H // downscale),
                                 interpolation=cv2.INTER_AREA)
            imgs.append(img[..., :out_channels])
        return np.stack(imgs)

    blob = b"\0".join(p.encode() for p in paths) + b"\0"
    out = np.empty((len(paths), H // downscale, W // downscale, out_channels), np.float32)
    rc = lib.tn_load_image_batch(
        blob, len(paths), H, W, downscale, out_channels,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
    )
    if rc != 0:
        raise ValueError(f"native batch load failed ({rc})")
    return out
