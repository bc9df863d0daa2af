"""Shared adapter helpers."""

from __future__ import annotations

import io
import os
from typing import Optional, Tuple

import numpy as np


def read_image_as_jpeg(path: str, quality: int = 95) -> Tuple[bytes, int, int]:
    """Load any image file, return (jpeg_bytes, height, width).

    JPEG sources pass through untouched (no recompression); PNG et al. are
    encoded once at pack time so the training-time store is JPEG-only and
    the native feeder has a single fast path.
    """
    from PIL import Image

    with open(path, "rb") as f:
        data = f.read()
    if path.lower().endswith((".jpg", ".jpeg")):
        img = Image.open(io.BytesIO(data))
        return data, img.height, img.width
    img = Image.open(io.BytesIO(data)).convert("RGB")
    buf = io.BytesIO()
    img.save(buf, format="JPEG", quality=quality)
    return buf.getvalue(), img.height, img.width


def load_png_u16(path: str) -> np.ndarray:
    from PIL import Image

    return np.asarray(Image.open(path), dtype=np.uint16)


def load_png_u8(path: str) -> np.ndarray:
    from PIL import Image

    return np.asarray(Image.open(path).convert("RGB"), dtype=np.uint8)


def colors_to_class_map(rgb: np.ndarray, palette, tolerance: int = 8) -> np.ndarray:
    """Color-coded mask → class-id map (255 where no palette color matches).

    The reference rasterizes color PNG masks to one-hot on host per sample
    (SURVEY.md §2 "Semseg processor+loss"); here it happens once at pack time.
    """
    h, w = rgb.shape[:2]
    out = np.full((h, w), 255, np.uint8)
    for ci, color in enumerate(palette):
        m = np.all(np.abs(rgb.astype(int) - np.asarray(color, int)) <= tolerance, axis=-1)
        out[m] = ci
    return out
