"""ctypes wrapper around the native C++ IO runtime (libyolou_io.so).

Builds on demand with make/g++ when the shared library is absent; all
consumers fall back to cv2 when the native path is unavailable, so this is an
acceleration layer, not a hard dependency.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import List, Optional, Tuple

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_LIB_PATH = os.path.join(_DIR, "libyolou_io.so")
_lib = None


def build(force: bool = False) -> bool:
    """Compile the shared library (idempotent). Returns True on success."""
    if os.path.exists(_LIB_PATH) and not force:
        return True
    try:
        subprocess.run(["make", "-C", _DIR], check=True,
                       capture_output=True, text=True)
        return os.path.exists(_LIB_PATH)
    except Exception:
        return False


_WANT_VERSION = 2  # bump with yio_version() when the C ABI grows


def get_lib(auto_build: bool = True):
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH):
        if not (auto_build and build()):
            return None
    lib = ctypes.CDLL(_LIB_PATH)
    if lib.yio_version() < _WANT_VERSION:  # stale .so from an older source
        del lib
        if not (auto_build and build(force=True)):
            return None
        lib = ctypes.CDLL(_LIB_PATH)
    lib.yio_decode_png_file.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_int)]
    lib.yio_decode_png_file.restype = ctypes.c_int
    lib.yio_load_batch.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_int)]
    lib.yio_load_batch.restype = ctypes.c_int
    lib.yio_load_batch_s2d.argtypes = lib.yio_load_batch.argtypes
    lib.yio_load_batch_s2d.restype = ctypes.c_int
    lib.yio_s2d4.argtypes = [
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_uint8)]
    lib.yio_s2d4.restype = None
    if hasattr(lib, "yio_letterbox_s2d_batch"):
        lib.yio_letterbox_s2d_batch.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.POINTER(ctypes.c_uint8)]
        lib.yio_letterbox_s2d_batch.restype = ctypes.c_int
    lib.yio_s2d4_bf16.argtypes = [
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_uint16)]
    lib.yio_s2d4_bf16.restype = None
    lib.yio_u8_to_unit_bf16.argtypes = [
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_uint16)]
    lib.yio_u8_to_unit_bf16.restype = None
    lib.yio_letterbox_s2d_batch_bf16.argtypes = [
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_uint16)]
    lib.yio_letterbox_s2d_batch_bf16.restype = ctypes.c_int
    lib.yio_free.argtypes = [ctypes.c_void_p]
    _lib = lib
    return lib


def available() -> bool:
    return get_lib() is not None


def decode_png(path: str) -> Optional[np.ndarray]:
    """Decode one PNG to an HWC uint8 array via the native decoder."""
    lib = get_lib()
    if lib is None:
        return None
    out = ctypes.POINTER(ctypes.c_uint8)()
    h = ctypes.c_int()
    w = ctypes.c_int()
    c = ctypes.c_int()
    rc = lib.yio_decode_png_file(path.encode(), ctypes.byref(out),
                                 ctypes.byref(h), ctypes.byref(w),
                                 ctypes.byref(c))
    if rc != 0:
        return None
    n = h.value * w.value * c.value
    arr = np.ctypeslib.as_array(out, shape=(n,)).copy()
    lib.yio_free(out)
    return arr.reshape(h.value, w.value, c.value)


def load_batch(paths: List[str], imgsz: int, channels: int = 4,
               letterbox: bool = False, nearest: bool = False,
               nthreads: int = 0,
               s2d: bool = False) -> Tuple[Optional[np.ndarray], np.ndarray]:
    """Threaded decode+resize of a file list into (N, imgsz, imgsz, C) uint8.

    s2d=True emits each slot in space-to-depth(4) layout
    (N, imgsz/4, imgsz/4, 16*C) — the stem's preferred lane-dense layout
    (nn/blocks.py::s2d_stem_apply); the permutation rides the loader's write
    pass so the device never pays an on-chip relayout.

    Returns (batch, status); batch is None if the library is unavailable.
    """
    lib = get_lib()
    if lib is None:
        return None, np.full(len(paths), -100, np.int32)
    n = len(paths)
    shape = ((n, imgsz // 4, imgsz // 4, 16 * channels) if s2d
             else (n, imgsz, imgsz, channels))
    out = np.empty(shape, np.uint8)
    status = np.zeros(n, np.int32)
    arr = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    fn = lib.yio_load_batch_s2d if s2d else lib.yio_load_batch
    fn(arr, n, imgsz, channels, int(letterbox), int(nearest), nthreads,
       out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
       status.ctypes.data_as(ctypes.POINTER(ctypes.c_int)))
    return out, status


def s2d4(batch: np.ndarray) -> Optional[np.ndarray]:
    """Native space-to-depth(4) of an NHWC uint8 batch (host-side)."""
    lib = get_lib()
    if lib is None:
        return None
    n, s, _, c = batch.shape
    batch = np.ascontiguousarray(batch)
    out = np.empty((n, s // 4, s // 4, 16 * c), np.uint8)
    for i in range(n):
        lib.yio_s2d4(batch[i].ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
                     s, c, out[i].ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
    return out


def s2d4_np(batch: np.ndarray) -> np.ndarray:
    """Pure-numpy space-to-depth(4) fallback (same channel order (iy,ix,c)
    as yio_s2d4 / nn.blocks.space_to_depth)."""
    n, s, _, c = batch.shape
    x = batch.reshape(n, s // 4, 4, s // 4, 4, c)
    return np.ascontiguousarray(x.transpose(0, 1, 3, 2, 4, 5)
                                ).reshape(n, s // 4, s // 4, 16 * c)


def s2d4_bf16(batch: np.ndarray) -> Optional[np.ndarray]:
    """Native s2d(4) fused with the u8 -> unit-bf16 LUT: returns an
    (N, S/4, S/4, 16*C) array of uint16-typed bf16 bits, numerically equal to
    `(s2d4(batch).astype(f32) / 255).astype(bf16)` (XLA RNE rounding) — the
    loader-side version of the device cast pass (~1 ms/b128 at 640²)."""
    lib = get_lib()
    if lib is None:
        return None
    n, s, _, c = batch.shape
    batch = np.ascontiguousarray(batch)
    out = np.empty((n, s // 4, s // 4, 16 * c), np.uint16)
    for i in range(n):
        lib.yio_s2d4_bf16(
            batch[i].ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), s, c,
            out[i].ctypes.data_as(ctypes.POINTER(ctypes.c_uint16)))
    return out


def u8_to_unit_bf16(arr: np.ndarray) -> Optional[np.ndarray]:
    """Elementwise u8 -> bf16(v/255) (uint16-typed bits), native LUT."""
    lib = get_lib()
    if lib is None:
        return None
    arr = np.ascontiguousarray(arr)
    out = np.empty(arr.shape, np.uint16)
    lib.yio_u8_to_unit_bf16(
        arr.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        ctypes.c_int64(arr.size),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint16)))
    return out


def host_letterbox_s2d(imgs: np.ndarray, imgsz: int,
                       nthreads: int = 0) -> np.ndarray:
    """Host letterbox (same geometry as ops/letterbox.py::letterbox_batch:
    aspect-preserving bilinear resize, 114-gray centered pad) + s2d(4), for
    feeding a stem_s2d=True model from in-memory frames. Mirrors the
    reference's HOST preprocessing (ultralytics LetterBox in
    BasePredictor.preprocess) — resize happens in uint8 like upstream.

    Fast path: the native thread pool (yio_letterbox_s2d_batch, bit-parity
    resize with cv2) — it scales with cores, so it is preferred whenever
    more than a couple of cores exist. On 1-2 core hosts cv2's SIMD resize
    beats the scalar native one serially (measured 77 vs 60 img/s on the
    1-core sandbox), so fall through to cv2 + native s2d4 there."""
    n, h, w, c = imgs.shape
    lib = get_lib()
    if (lib is not None and hasattr(lib, "yio_letterbox_s2d_batch")
            and (os.cpu_count() or 1) >= 4):
        imgs = np.ascontiguousarray(imgs)
        out = np.empty((n, imgsz // 4, imgsz // 4, 16 * c), np.uint8)
        lib.yio_letterbox_s2d_batch(
            imgs.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), n, h, w, c,
            imgsz, 1, nthreads,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
        return out
    import cv2
    r = min(imgsz / h, imgsz / w)
    uh, uw = int(round(h * r)), int(round(w * r))
    top = int(round((imgsz - uh) / 2 - 0.1))
    left = int(round((imgsz - uw) / 2 - 0.1))
    out = np.full((n, imgsz, imgsz, c), 114, np.uint8)
    for i in range(n):
        im = imgs[i]
        if (uh, uw) != (h, w):
            im = cv2.resize(im, (uw, uh), interpolation=cv2.INTER_LINEAR)
            if im.ndim == 2:
                im = im[..., None]
        out[i, top:top + uh, left:left + uw] = im
    s2d = s2d4(out)
    return s2d if s2d is not None else s2d4_np(out)
