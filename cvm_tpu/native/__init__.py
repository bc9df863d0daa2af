"""ctypes bindings for the native JPEG feeder, with lazy build + PIL fallback.

The shared library is built on first use via the Makefile (cached next to the
source; rebuilt when the source is newer). If the toolchain or libjpeg is
missing the loader transparently falls back to PIL — slower, same results.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import List, Optional, Sequence, Tuple

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_HERE, "libcvmjpeg.so")
_LOCK = threading.Lock()
_LIB: Optional[ctypes.CDLL] = None
_TRIED = False


def _build() -> bool:
    src = os.path.join(_HERE, "jpeg_feeder.cc")
    if os.path.exists(_SO) and os.path.getmtime(_SO) >= os.path.getmtime(src):
        return True
    try:
        subprocess.run(
            ["make", "-s"], cwd=_HERE, check=True, capture_output=True, timeout=120
        )
        return os.path.exists(_SO)
    except Exception:
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    """Load (building if needed) the native library; None if unavailable."""
    global _LIB, _TRIED
    with _LOCK:
        if _LIB is not None or _TRIED:
            return _LIB
        _TRIED = True
        if not _build():
            return None
        try:
            lib = ctypes.CDLL(_SO)
        except OSError:
            return None
        lib.cvm_decode_into.restype = ctypes.c_int
        lib.cvm_decode_into.argtypes = [
            ctypes.c_char_p, ctypes.c_ulong, ctypes.POINTER(ctypes.c_uint8),
            ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
        ]
        lib.cvm_decode_batch.restype = ctypes.c_int
        lib.cvm_decode_batch.argtypes = [
            ctypes.c_int, ctypes.POINTER(ctypes.c_char_p),
            ctypes.POINTER(ctypes.c_ulong), ctypes.POINTER(ctypes.c_uint8),
            ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
            ctypes.c_int,
        ]
        lib.cvm_decode_batch_yuv420.restype = ctypes.c_int
        lib.cvm_decode_batch_yuv420.argtypes = [
            ctypes.c_int, ctypes.POINTER(ctypes.c_char_p),
            ctypes.POINTER(ctypes.c_ulong),
            ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_uint8),
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
            ctypes.c_int,
        ]
        _LIB = lib
        return _LIB


def native_available() -> bool:
    return get_lib() is not None


def _choose_scale_num(h: int, w: int, max_h: int, max_w: int,
                      target_h: int, target_w: int) -> Optional[int]:
    """Mirror of the native choose_scale: power-of-2 DCT scale selection
    (fractional M/8 scales are slower than full decode — see jpeg_feeder.cc)."""
    best = None
    for num in (8, 4, 2, 1):
        oh, ow = -(-h * num // 8), -(-w * num // 8)  # ceil, as libjpeg does
        if oh > max_h or ow > max_w:
            continue
        if best is None:
            best = num
        if target_h > 0 and 8 * oh >= 7 * target_h and 8 * ow >= 7 * target_w:
            best = num
    return best


def _decode_batch_pil(
    jpegs: Sequence[bytes], max_h: int, max_w: int, out: np.ndarray, out_hw: np.ndarray,
    target_hw=(0, 0),
) -> int:
    import io

    from PIL import Image

    failures = 0
    for i, data in enumerate(jpegs):
        try:
            img = Image.open(io.BytesIO(data)).convert("RGB")
            # Match the native path: M/8 scale-aware downscale.
            num = _choose_scale_num(img.height, img.width, max_h, max_w,
                                    target_hw[0], target_hw[1])
            if num is None:
                failures += 1
                continue
            if num < 8:
                img = img.resize((-(-img.width * num // 8), -(-img.height * num // 8)),
                                 Image.BILINEAR)
            arr = np.asarray(img, np.uint8)
            h, w = arr.shape[:2]
            if h > max_h or w > max_w:
                failures += 1
                continue
            out[i, :h, :w] = arr
            out_hw[i] = (h, w)
        except Exception:
            failures += 1
    return failures


def decode_jpeg_batch(
    jpegs: Sequence[bytes],
    max_h: int,
    max_w: int,
    num_threads: int = 4,
    out: Optional[np.ndarray] = None,
    target_hw: Tuple[int, int] = (0, 0),
) -> Tuple[np.ndarray, np.ndarray]:
    """Decode JPEGs into a padded (N, max_h, max_w, 3) uint8 batch.

    Returns (batch, hw) where hw[i] = (h, w) valid extent. Failed decodes
    yield a zero frame with hw = (1, 1) (masked rather than fatal).
    ``target_hw`` > 0 enables scale-aware decode: the smallest M/8 DCT scale
    whose output still covers the model input (labels are rescaled by the
    loader from the decoded extent).
    """
    n = len(jpegs)
    if out is None:
        out = np.zeros((n, max_h, max_w, 3), np.uint8)
    else:
        # Native code writes n*max_h*max_w*3 bytes through the raw pointer:
        # a wrong shape/dtype/layout would be silent heap corruption.
        if (out.shape != (n, max_h, max_w, 3) or out.dtype != np.uint8
                or not out.flags["C_CONTIGUOUS"]):
            raise ValueError(
                f"out must be C-contiguous uint8 {(n, max_h, max_w, 3)}, got "
                f"{out.dtype} {out.shape} contiguous={out.flags['C_CONTIGUOUS']}"
            )
        out[:] = 0
    out_hw = np.ones((n, 2), np.int32)

    lib = get_lib()
    if lib is None:
        _decode_batch_pil(jpegs, max_h, max_w, out, out_hw, target_hw)
        return out, out_hw

    bufs = [np.frombuffer(j, np.uint8) for j in jpegs]
    ptrs = (ctypes.c_char_p * n)(*[b.ctypes.data_as(ctypes.c_char_p) for b in bufs])
    lens = (ctypes.c_ulong * n)(*[len(j) for j in jpegs])
    rc = np.zeros(n, np.int32)
    lib.cvm_decode_batch(
        n, ptrs, lens,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        max_h, max_w, int(target_hw[0]), int(target_hw[1]),
        out_hw.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        rc.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        num_threads,
    )
    bad = rc != 0
    if bad.any():
        out[bad] = 0
        out_hw[bad] = 1
    return out, out_hw


def _rgb_to_yuv420_np(rgb: np.ndarray):
    """Host fallback: full-range JFIF RGB → planar YUV420 (numpy).

    Chroma is subsampled by AVERAGING each 2x2 block — JFIF centered siting,
    matching libjpeg's raw 4:2:0 output and the centered assumption of the
    device upsampler (ops/image.chroma_roi). Top-left decimation would
    co-site chroma at the block corner, a 0.25-chroma-px shift vs the
    device's algebra.
    """
    r = rgb[..., 0].astype(np.float32)
    g = rgb[..., 1].astype(np.float32)
    b = rgb[..., 2].astype(np.float32)
    y = 0.299 * r + 0.587 * g + 0.114 * b
    u = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    v = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
    yq = np.clip(y + 0.5, 0, 255).astype(np.uint8)

    def _down2(p):
        return 0.25 * (p[0::2, 0::2] + p[1::2, 0::2] + p[0::2, 1::2] + p[1::2, 1::2])

    uq = np.clip(_down2(u) + 0.5, 0, 255).astype(np.uint8)
    vq = np.clip(_down2(v) + 0.5, 0, 255).astype(np.uint8)
    return yq, uq, vq


def _yuv420_to_rgb_np(y: np.ndarray, u: np.ndarray, v: np.ndarray) -> np.ndarray:
    """Host fallback: planar YUV420 → full-range JFIF RGB uint8 (numpy).

    Chroma upsamples nearest 2x (matches the subsampled grid of
    _rgb_to_yuv420_np); used when raw-YUV serving shards are read through
    the RGB loader format.
    """
    h, w = y.shape
    uu = np.repeat(np.repeat(u.astype(np.float32), 2, 0), 2, 1)[:h, :w] - 128.0
    vv = np.repeat(np.repeat(v.astype(np.float32), 2, 0), 2, 1)[:h, :w] - 128.0
    yf = y.astype(np.float32)
    r = yf + 1.402 * vv
    g = yf - 0.344136 * uu - 0.714136 * vv
    b = yf + 1.772 * uu
    return np.clip(np.stack([r, g, b], -1) + 0.5, 0, 255).astype(np.uint8)


def decode_jpeg_batch_yuv420(
    jpegs: Sequence[bytes],
    max_h: int,
    max_w: int,
    num_threads: int = 4,
    target_hw: Tuple[int, int] = (0, 0),
    out_yuv: Optional[Tuple[np.ndarray, np.ndarray, np.ndarray]] = None,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Decode JPEGs to planar YUV420 padded batches.

    Returns (Y (N, max_h, max_w), U (N, max_h/2, max_w/2), V, hw). Halves
    host→device bytes vs RGB (JPEG chroma is stored 4:2:0 anyway); the device
    preprocess fuses chroma upsampling + color conversion (ops/image.py).
    max_h/max_w must be even. ``out_yuv=(Y, U, V)`` reuses caller buffers in
    steady-state serving loops (avoids a per-batch allocation + memset on
    the single-core host critical path).
    """
    assert max_h % 2 == 0 and max_w % 2 == 0, "pad size must be even for 4:2:0"
    n = len(jpegs)
    if out_yuv is None:
        Y = np.zeros((n, max_h, max_w), np.uint8)
        U = np.full((n, max_h // 2, max_w // 2), 128, np.uint8)
        V = np.full((n, max_h // 2, max_w // 2), 128, np.uint8)
    else:
        Y, U, V = out_yuv
        shapes = ((n, max_h, max_w), (n, max_h // 2, max_w // 2),
                  (n, max_h // 2, max_w // 2))
        for arr, shp in zip((Y, U, V), shapes):
            if (arr.shape != shp or arr.dtype != np.uint8
                    or not arr.flags["C_CONTIGUOUS"]):
                raise ValueError(
                    f"out_yuv buffer must be C-contiguous uint8 {shp}, got "
                    f"{arr.dtype} {arr.shape}"
                )
        Y[:] = 0
        U[:] = 128
        V[:] = 128
    out_hw = np.ones((n, 2), np.int32)

    lib = get_lib()
    if lib is None:
        import io

        from PIL import Image

        for i, data in enumerate(jpegs):
            try:
                img = Image.open(io.BytesIO(data)).convert("RGB")
                num = _choose_scale_num(img.height, img.width, max_h, max_w,
                                        target_hw[0], target_hw[1])
                if num is None:
                    continue
                if num < 8:
                    img = img.resize((-(-img.width * num // 8), -(-img.height * num // 8)),
                                     Image.BILINEAR)
                arr = np.asarray(img, np.uint8)
                h, w = arr.shape[:2]
                if h % 2 or w % 2:  # crop to even for clean 4:2:0
                    arr = arr[: h - h % 2, : w - w % 2]
                    h, w = arr.shape[:2]
                yq, uq, vq = _rgb_to_yuv420_np(arr)
                Y[i, :h, :w] = yq
                U[i, : h // 2, : w // 2] = uq
                V[i, : h // 2, : w // 2] = vq
                out_hw[i] = (h, w)
            except Exception:
                pass
        return Y, U, V, out_hw

    bufs = [np.frombuffer(j, np.uint8) for j in jpegs]
    ptrs = (ctypes.c_char_p * n)(*[b.ctypes.data_as(ctypes.c_char_p) for b in bufs])
    lens = (ctypes.c_ulong * n)(*[len(j) for j in jpegs])
    rc = np.zeros(n, np.int32)
    u8p = ctypes.POINTER(ctypes.c_uint8)
    lib.cvm_decode_batch_yuv420(
        n, ptrs, lens,
        Y.ctypes.data_as(u8p), U.ctypes.data_as(u8p), V.ctypes.data_as(u8p),
        max_h, max_w, int(target_hw[0]), int(target_hw[1]),
        out_hw.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        rc.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        num_threads,
    )
    bad = rc != 0
    if bad.any():
        Y[bad] = 0
        U[bad] = 128
        V[bad] = 128
        out_hw[bad] = 1
    return Y, U, V, out_hw
