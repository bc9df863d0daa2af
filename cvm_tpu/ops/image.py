"""Fused device-side image resampling: letterbox / crop / flip in one gather.

Replaces the reference's host-side OpenCV per-sample loop (cv2.imdecode →
letterbox resize → augment → normalize; SURVEY.md §1 L3, §3.1) with a single
XLA-friendly separable bilinear gather that runs on device, after the raw RGB
tensor has been transferred once.

Geometry convention (matches cv2.resize INTER_LINEAR):
    src = (dst + 0.5) * (src_extent / dst_extent) - 0.5 + src_origin
with border-replicate clamping. cv2 computes this in 11-bit fixed point on
uint8, so agreement with cv2 is within ~1 LSB on the 0..255 scale; agreement
with an exact float oracle of the same formula is ~1e-5 (see
tests/test_image_ops.py).

Everything here takes *runtime* (traced) source sizes and ROIs against a
*static* padded buffer, so one compiled program serves every input resolution:
images are host-padded to (Hmax, Wmax) and the valid (h, w) travels as scalars.

The ROI abstraction unifies the whole geometric pipeline:
  - plain resize           = ROI covering [0,h)x[0,w)
  - letterbox              = plain resize + out-of-region pad mask
  - random crop/zoom aug   = ROI being a jittered sub-window
  - horizontal flip        = x-axis mirrored ROI
so preprocessing + geometric augmentation fuse into ONE resample (one pass
over HBM) instead of the reference's chain of cv2 calls.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp


class Roi(NamedTuple):
    """A source-image region mapped onto an output-canvas region.

    All fields are float scalars (possibly traced).

    src_y0/src_x0/src_h/src_w : source window in input-pixel units.
    dst_y0/dst_x0/dst_h/dst_w : destination window in output-pixel units;
        output pixels outside the destination window are filled with
        ``pad_value`` (this is how letterbox bars appear).
    flip_x : bool scalar; mirrors the source window horizontally.
    """

    src_y0: jnp.ndarray
    src_x0: jnp.ndarray
    src_h: jnp.ndarray
    src_w: jnp.ndarray
    dst_y0: jnp.ndarray
    dst_x0: jnp.ndarray
    dst_h: jnp.ndarray
    dst_w: jnp.ndarray
    flip_x: jnp.ndarray

    @property
    def scale_y(self):
        return self.dst_h / self.src_h

    @property
    def scale_x(self):
        return self.dst_w / self.src_w


def _f(x):
    return jnp.asarray(x, jnp.float32)


def full_roi(h, w, out_h: int, out_w: int) -> Roi:
    """ROI for a plain (aspect-distorting) resize of the whole image."""
    z = _f(0.0)
    return Roi(z, z, _f(h), _f(w), z, z, _f(out_h), _f(out_w), jnp.asarray(False))


def letterbox_roi(h, w, out_h: int, out_w: int, flip_x=False) -> Roi:
    """Aspect-preserving fit of an (h, w) image into an (out_h, out_w) canvas.

    Mirrors the reference's shared ROI/letterbox helper (SURVEY.md §2 "Shared
    image ops"): scale = min(out/in), centered, with pad bars. The returned
    Roi carries the scale+offset bookkeeping needed to map labels into the
    letterboxed frame.
    """
    h = _f(h)
    w = _f(w)
    scale = jnp.minimum(_f(out_h) / h, _f(out_w) / w)
    new_h = jnp.round(h * scale)
    new_w = jnp.round(w * scale)
    dst_y0 = jnp.floor((_f(out_h) - new_h) * 0.5)
    dst_x0 = jnp.floor((_f(out_w) - new_w) * 0.5)
    z = _f(0.0)
    return Roi(z, z, h, w, dst_y0, dst_x0, new_h, new_w, jnp.asarray(flip_x))


def jittered_roi(
    key: jax.Array,
    h,
    w,
    out_h: int,
    out_w: int,
    scale_range: Tuple[float, float] = (0.6, 1.4),
    shift_frac: float = 0.1,
    flip_prob: float = 0.5,
) -> Roi:
    """Random zoom/shift/flip ROI for training augmentation.

    Fuses the reference's geometric augmentation (random scale + translation +
    horizontal flip applied to image AND labels; SURVEY.md §2 "Augmentation")
    into the same single resample as the letterbox. The sampled window keeps
    the output aspect ratio so no distortion is introduced.
    """
    k_s, k_y, k_x, k_f = jax.random.split(key, 4)
    h = _f(h)
    w = _f(w)
    base = jnp.minimum(h / out_h, w / out_w)  # src px per dst px at fit
    zoom = jax.random.uniform(k_s, (), jnp.float32, scale_range[0], scale_range[1])
    src_h = out_h * base / zoom
    src_w = out_w * base / zoom
    cy = h * 0.5 + jax.random.uniform(k_y, (), jnp.float32, -shift_frac, shift_frac) * h
    cx = w * 0.5 + jax.random.uniform(k_x, (), jnp.float32, -shift_frac, shift_frac) * w
    z = _f(0.0)
    return Roi(
        cy - src_h * 0.5,
        cx - src_w * 0.5,
        src_h,
        src_w,
        z,
        z,
        _f(out_h),
        _f(out_w),
        jax.random.bernoulli(k_f, flip_prob),
    )


def _axis_coords(out_size: int, dst0, dst_len, src0, src_len, valid_hi, flip=None):
    """Per-axis bilinear gather plan: (idx_lo, idx_hi, frac, in_dst_window)."""
    i = jnp.arange(out_size, dtype=jnp.float32)
    t = (i - dst0 + 0.5) / dst_len  # 0..1 across the dst window
    if flip is not None:
        t = jnp.where(flip, 1.0 - t, t)
    src = t * src_len - 0.5 + src0
    lo = jnp.floor(src)
    frac = src - lo
    lo_i = lo.astype(jnp.int32)
    hi = jnp.clip(valid_hi - 1, 0, None)
    idx_lo = jnp.clip(lo_i, 0, hi)
    idx_hi = jnp.clip(lo_i + 1, 0, hi)
    inside = (i >= dst0) & (i < dst0 + dst_len)
    return idx_lo, idx_hi, frac, inside


def sample_bilinear(
    image: jnp.ndarray,
    roi: Roi,
    out_hw: Tuple[int, int],
    valid_hw=None,
    pad_value: float = 0.0,
) -> jnp.ndarray:
    """Separable bilinear resample of ``image`` through ``roi``.

    image     : (H, W, C) any float/int dtype; computed in float32.
    valid_hw  : (h, w) valid extent when ``image`` is a host-padded buffer;
                defaults to the full static shape. Samples are clamped to the
                valid region (border replicate), so pad garbage is never read.
    returns   : (out_h, out_w, C) float32.
    """
    out_h, out_w = out_hw
    H, W = image.shape[0], image.shape[1]
    vh, vw = (H, W) if valid_hw is None else valid_hw

    ylo, yhi, fy, in_y = _axis_coords(out_h, roi.dst_y0, roi.dst_h, roi.src_y0, roi.src_h, vh)
    xlo, xhi, fx, in_x = _axis_coords(
        out_w, roi.dst_x0, roi.dst_w, roi.src_x0, roi.src_w, vw, flip=roi.flip_x
    )

    # Rows first (gather along H), then columns. Gather in the SOURCE dtype
    # and convert the gathered rows — indexing commutes with conversion, so
    # the values are bit-identical to converting first, but a uint8 source is
    # read at 1 byte/px instead of materializing a full-resolution f32 copy
    # (XLA kept one alive to feed both row gathers — 4x the source bytes on
    # the serving program's HBM-bound preprocess, runs/roofline_tpu.json).
    rows_lo = jnp.take(image, ylo, axis=0).astype(jnp.float32)
    rows_hi = jnp.take(image, yhi, axis=0).astype(jnp.float32)
    rows = rows_lo + (rows_hi - rows_lo) * fy[:, None, None]
    cols_lo = jnp.take(rows, xlo, axis=1)
    cols_hi = jnp.take(rows, xhi, axis=1)
    out = cols_lo + (cols_hi - cols_lo) * fx[None, :, None]

    inside = in_y[:, None] & in_x[None, :]
    return jnp.where(inside[:, :, None], out, jnp.float32(pad_value))


def sample_nearest(
    image: jnp.ndarray,
    roi: Roi,
    out_hw: Tuple[int, int],
    valid_hw=None,
    pad_value=0,
) -> jnp.ndarray:
    """Nearest-neighbor resample through ``roi`` (for masks / sparse depth).

    Uses half-pixel-aligned rounding so mask geometry matches the bilinear
    image path exactly (deliberate deviation from cv2's asymmetric
    INTER_NEAREST truncation; documented in tests).
    """
    out_h, out_w = out_hw
    H, W = image.shape[0], image.shape[1]
    vh, vw = (H, W) if valid_hw is None else valid_hw

    ylo, yhi, fy, in_y = _axis_coords(out_h, roi.dst_y0, roi.dst_h, roi.src_y0, roi.src_h, vh)
    xlo, xhi, fx, in_x = _axis_coords(
        out_w, roi.dst_x0, roi.dst_w, roi.src_x0, roi.src_w, vw, flip=roi.flip_x
    )
    yi = jnp.where(fy < 0.5, ylo, yhi)
    xi = jnp.where(fx < 0.5, xlo, xhi)
    rows = jnp.take(image, yi, axis=0)
    out = jnp.take(rows, xi, axis=1)
    inside = in_y[:, None] & in_x[None, :]
    if out.ndim == 3:
        inside = inside[:, :, None]
    return jnp.where(inside, out, jnp.asarray(pad_value, image.dtype))


def letterbox(image, h, w, out_hw: Tuple[int, int], pad_value: float = 0.0):
    """Convenience: letterbox-resize a padded buffer. Returns (image, roi)."""
    roi = letterbox_roi(h, w, out_hw[0], out_hw[1])
    return sample_bilinear(image, roi, out_hw, valid_hw=(h, w), pad_value=pad_value), roi


# ---------------------------------------------------------------------------
# Label geometry: map points/boxes from input-image coords to output coords.
# ---------------------------------------------------------------------------


def map_points_to_output(points: jnp.ndarray, roi: Roi) -> jnp.ndarray:
    """Map (..., 2) [x, y] points in source-image coords through ``roi``.

    Inverse of the sampling map: x_out = (x_src - src_x0) * sx + dst_x0,
    with horizontal mirroring when roi.flip_x (the mirror only needs the
    dst window, not the canvas width).
    """
    x, y = points[..., 0], points[..., 1]
    sx = roi.scale_x
    sy = roi.scale_y
    xo = (x - roi.src_x0) * sx + roi.dst_x0
    yo = (y - roi.src_y0) * sy + roi.dst_y0
    # Mirror around the dst window: x' = dst_x0 + (dst_w - (x - dst_x0))
    xflip = 2.0 * roi.dst_x0 + roi.dst_w - xo
    xo = jnp.where(roi.flip_x, xflip, xo)
    return jnp.stack([xo, yo], axis=-1)


def map_points_to_input(points: jnp.ndarray, roi: Roi) -> jnp.ndarray:
    """Inverse of ``map_points_to_output`` (no flip: inference ROIs don't flip).

    Used to report detections in original-image coordinates, matching the
    reference's inference scripts (SURVEY.md §3.2).
    """
    x, y = points[..., 0], points[..., 1]
    xi = (x - roi.dst_x0) / roi.scale_x + roi.src_x0
    yi = (y - roi.dst_y0) / roi.scale_y + roi.src_y0
    return jnp.stack([xi, yi], axis=-1)


def map_boxes_to_input(boxes: jnp.ndarray, roi: Roi) -> jnp.ndarray:
    """Map (..., 4) [x0, y0, x1, y1] boxes from output canvas back to source."""
    p0 = map_points_to_input(boxes[..., 0:2], roi)
    p1 = map_points_to_input(boxes[..., 2:4], roi)
    return jnp.concatenate([p0, p1], axis=-1)


def map_boxes_to_output(boxes: jnp.ndarray, roi: Roi) -> jnp.ndarray:
    """Map (..., 4) [x0, y0, x1, y1] boxes through ``roi`` (handles flip)."""
    p0 = map_points_to_output(boxes[..., 0:2], roi)
    p1 = map_points_to_output(boxes[..., 2:4], roi)
    x0 = jnp.minimum(p0[..., 0], p1[..., 0])
    x1 = jnp.maximum(p0[..., 0], p1[..., 0])
    y0 = jnp.minimum(p0[..., 1], p1[..., 1])
    y1 = jnp.maximum(p0[..., 1], p1[..., 1])
    return jnp.stack([x0, y0, x1, y1], axis=-1)


# ---------------------------------------------------------------------------
# Rotation augmentation (opt-in, train-only): the fused ROI resample is
# separable (rows-then-columns gathers), so rotation cannot fold into it;
# it runs as one extra 2D gather pass over the model-input-resolution image
# — compiled in only when aug_rotate_deg > 0, so serving/eval programs are
# untouched.
# ---------------------------------------------------------------------------


def clip_boxes(boxes: jnp.ndarray, out_hw: Tuple[int, int]) -> jnp.ndarray:
    """Clip (..., 4) [x0,y0,x1,y1] boxes to the canvas [0,W)x[0,H).

    Applied after rotation augmentation: the AABB of rotated corners can
    extend past the canvas, and training on the invisible extent is label
    noise (wh targets inflated by pixels the network cannot see). A box
    rotated fully outside degenerates to zero area here and is then dropped
    by the renderer's bw>0 & bh>0 validity check (ops/heatmap.py
    prepare_centers).
    """
    h, w = out_hw
    x = jnp.clip(boxes[..., 0::2], 0.0, float(w - 1))
    y = jnp.clip(boxes[..., 1::2], 0.0, float(h - 1))
    return jnp.stack([x[..., 0], y[..., 0], x[..., 1], y[..., 1]], axis=-1)


def rotate_points(points: jnp.ndarray, angle, center_xy) -> jnp.ndarray:
    """Rotate (..., 2) [x, y] points by ``angle`` (radians, CCW in image
    coords: a point p maps to R(angle)(p - c) + c) about center (cx, cy)."""
    c, s = jnp.cos(angle), jnp.sin(angle)
    x = points[..., 0] - center_xy[0]
    y = points[..., 1] - center_xy[1]
    return jnp.stack(
        [c * x - s * y + center_xy[0], s * x + c * y + center_xy[1]], axis=-1
    )


def rotate_boxes(boxes: jnp.ndarray, angle, center_xy) -> jnp.ndarray:
    """Axis-aligned bbox of the rotated corners of (..., 4) [x0,y0,x1,y1]
    boxes — the standard label transform under rotation augmentation."""
    x0, y0, x1, y1 = (boxes[..., 0], boxes[..., 1], boxes[..., 2], boxes[..., 3])
    corners = jnp.stack(
        [jnp.stack([x0, y0], -1), jnp.stack([x1, y0], -1),
         jnp.stack([x0, y1], -1), jnp.stack([x1, y1], -1)], axis=-2
    )  # (..., 4, 2)
    r = rotate_points(corners, angle, center_xy)
    return jnp.concatenate([r.min(axis=-2), r.max(axis=-2)], axis=-1)


def rotate_image(
    image: jnp.ndarray, angle, pad_value=0.0, method: str = "bilinear"
) -> jnp.ndarray:
    """Rotate (H, W[, C]) by ``angle`` about the image center (same forward
    convention as :func:`rotate_points`); out-of-frame pixels = pad_value.

    ``method="nearest"`` keeps the input dtype (masks / class ids / sparse
    depth); bilinear returns float32.
    """
    H, W = image.shape[0], image.shape[1]
    cy, cx = (H - 1) / 2.0, (W - 1) / 2.0
    yy, xx = jnp.meshgrid(
        jnp.arange(H, dtype=jnp.float32), jnp.arange(W, dtype=jnp.float32),
        indexing="ij",
    )
    c, s = jnp.cos(angle), jnp.sin(angle)
    dx, dy = xx - cx, yy - cy
    # Inverse map: output pixel dst shows the input at R(-angle)(dst - c) + c.
    sxf = c * dx + s * dy + cx
    syf = -s * dx + c * dy + cy
    inside = (sxf >= -0.5) & (sxf <= W - 0.5) & (syf >= -0.5) & (syf <= H - 0.5)
    if method == "nearest":
        si = jnp.clip(jnp.round(syf).astype(jnp.int32), 0, H - 1)
        sj = jnp.clip(jnp.round(sxf).astype(jnp.int32), 0, W - 1)
        out = image[si, sj]
        mask = inside if out.ndim == 2 else inside[..., None]
        return jnp.where(mask, out, jnp.asarray(pad_value, image.dtype))
    img = image.astype(jnp.float32)
    ylo = jnp.floor(syf)
    xlo = jnp.floor(sxf)
    fy, fx = syf - ylo, sxf - xlo
    y0i = jnp.clip(ylo.astype(jnp.int32), 0, H - 1)
    y1i = jnp.clip(y0i + 1, 0, H - 1)
    x0i = jnp.clip(xlo.astype(jnp.int32), 0, W - 1)
    x1i = jnp.clip(x0i + 1, 0, W - 1)
    a, b = img[y0i, x0i], img[y0i, x1i]
    cc, d = img[y1i, x0i], img[y1i, x1i]
    if img.ndim == 3:
        fy, fx = fy[..., None], fx[..., None]
        inside = inside[..., None]
    top = a + (b - a) * fx
    bot = cc + (d - cc) * fx
    out = top + (bot - top) * fy
    return jnp.where(inside, out, jnp.float32(pad_value)).astype(image.dtype
        if jnp.issubdtype(image.dtype, jnp.floating) else jnp.float32)


# ---------------------------------------------------------------------------
# Photometric augmentation + normalization (pure VPU work; fuses into the
# resample output under jit).
# ---------------------------------------------------------------------------

IMAGENET_MEAN = (0.485 * 255.0, 0.456 * 255.0, 0.406 * 255.0)
IMAGENET_STD = (0.229 * 255.0, 0.224 * 255.0, 0.225 * 255.0)


def photometric_augment(
    key: jax.Array,
    image: jnp.ndarray,
    brightness: float = 0.2,
    contrast: float = 0.2,
    saturation: float = 0.2,
    hue: float = 0.05,
    noise_std: float = 0.0,
    blur_prob: float = 0.0,
) -> jnp.ndarray:
    """Random brightness/contrast/saturation/hue (+ optional gaussian noise
    and 3x3 blur) on a 0..255 float image.

    Device-side equivalent of the reference's imgaug/cv2 photometric chain
    (SURVEY.md §2 "Augmentation"). Hue is applied as a cheap RGB channel
    rotation blend (avoids HSV round-trip; adequate for training jitter).
    noise_std is the MAX noise sigma as a fraction of 255 (per-image sigma
    drawn uniformly); blur_prob applies a 3x3 binomial blur per image.
    """
    kb, kc, ks, kh, kn1, kn2, kbl = jax.random.split(key, 7)
    img = image.astype(jnp.float32)

    b = jax.random.uniform(kb, (), jnp.float32, -brightness, brightness) * 255.0
    img = img + b

    c = 1.0 + jax.random.uniform(kc, (), jnp.float32, -contrast, contrast)
    img = (img - 127.5) * c + 127.5

    gray = (
        0.299 * img[..., 0:1] + 0.587 * img[..., 1:2] + 0.114 * img[..., 2:3]
    )
    s = 1.0 + jax.random.uniform(ks, (), jnp.float32, -saturation, saturation)
    img = gray + (img - gray) * s

    hshift = jax.random.uniform(kh, (), jnp.float32, -hue, hue)
    rotated = jnp.roll(img, 1, axis=-1)
    img = img * (1.0 - jnp.abs(hshift)) + rotated * jnp.abs(hshift)

    if noise_std > 0.0:
        sigma = jax.random.uniform(kn1, (), jnp.float32, 0.0, noise_std * 255.0)
        img = img + sigma * jax.random.normal(kn2, img.shape, jnp.float32)

    if blur_prob > 0.0:
        # 3x3 binomial blur per channel; blended in with probability
        # blur_prob (computed unconditionally — a where keeps control flow
        # compiler-friendly and the kernel is tiny).
        k1d = jnp.asarray([0.25, 0.5, 0.25], jnp.float32)
        x = jnp.pad(img, ((1, 1), (1, 1), (0, 0)), mode="edge")
        x = (x[:-2] * k1d[0] + x[1:-1] * k1d[1] + x[2:] * k1d[2])
        x = (x[:, :-2] * k1d[0] + x[:, 1:-1] * k1d[1] + x[:, 2:] * k1d[2])
        do_blur = jax.random.uniform(kbl, (), jnp.float32) < blur_prob
        img = jnp.where(do_blur, x, img)

    return jnp.clip(img, 0.0, 255.0)


def yuv_to_rgb(y: jnp.ndarray, u: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Full-range JFIF YCbCr → RGB (matches libjpeg's color convert).

    y/u/v: (..., H, W) float planes on the 0..255 scale (chroma already
    resampled to luma resolution). Returns (..., H, W, 3) float32.
    """
    cb = u - 128.0
    cr = v - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    return jnp.clip(jnp.stack([r, g, b], axis=-1), 0.0, 255.0)


def chroma_roi(roi: Roi) -> Roi:
    """Map a luma-space Roi to 4:2:0 chroma-plane coordinates.

    With JFIF chroma siting (chroma sample centered on each 2x2 luma block),
    the half-pixel algebra reduces exactly to halving the source window.
    """
    return roi._replace(
        src_y0=roi.src_y0 * 0.5,
        src_x0=roi.src_x0 * 0.5,
        src_h=roi.src_h * 0.5,
        src_w=roi.src_w * 0.5,
    )


def normalize_imagenet(image: jnp.ndarray) -> jnp.ndarray:
    """(x - mean) / std with ImageNet stats on the 0..255 scale."""
    mean = jnp.asarray(IMAGENET_MEAN, jnp.float32)
    std = jnp.asarray(IMAGENET_STD, jnp.float32)
    return (image.astype(jnp.float32) - mean) / std


def normalize_pm1(image: jnp.ndarray) -> jnp.ndarray:
    """Scale 0..255 → [-1, 1] (the reference's edge-friendly normalization)."""
    return image.astype(jnp.float32) / 127.5 - 1.0
