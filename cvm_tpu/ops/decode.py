"""On-device postprocessing: NMS-free detection decode, semseg, depth.

Replaces the reference's host-side decode (SURVEY.md §3.2: 3x3 max-pool peak
extraction → top-k → gather offsets/sizes → boxes, done in numpy/tf on host)
with fused XLA that stays inside the jitted inference program — the decoded
boxes are the first thing that crosses back to the host.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp


class Detections(NamedTuple):
    boxes: jnp.ndarray    # (B, K, 4) [x0, y0, x1, y1] in input-pixel coords
    scores: jnp.ndarray   # (B, K)
    classes: jnp.ndarray  # (B, K) int32


def _maxpool3x3(x: jnp.ndarray) -> jnp.ndarray:
    """3x3 stride-1 SAME max-pool over (B, H, W, C)."""
    return jax.lax.reduce_window(
        x,
        -jnp.inf,
        jax.lax.max,
        window_dimensions=(1, 3, 3, 1),
        window_strides=(1, 1, 1, 1),
        padding="SAME",
    )


def decode_centernet_with_extras(
    heatmap: jnp.ndarray,
    offset: jnp.ndarray,
    size: jnp.ndarray,
    stride: int,
    extras: "dict[str, jnp.ndarray]",
    top_k: int = 100,
    from_logits: bool = True,
):
    """decode_centernet + gather of extra dense maps (3D heads) at the peaks.

    extras: {name: (B, Hs, Ws, C)} → returns (Detections, {name: (B, K, C)}).
    """
    det, pix = _decode_core(heatmap, offset, size, stride, top_k, from_logits)
    B, Hs, Ws, _ = heatmap.shape
    out = {}
    for name, m in extras.items():
        flat = m.reshape(B, Hs * Ws, m.shape[-1])
        out[name] = jnp.take_along_axis(flat, pix[..., None], axis=1)
    return det, out


class Detections3d(NamedTuple):
    det: Detections          # 2D boxes/scores/classes
    centers3d: jnp.ndarray   # (B, K, 3) camera-frame (X, Y, Z) meters
    dims: jnp.ndarray        # (B, K, 3) (h, w, l) meters
    yaw: jnp.ndarray         # (B, K) radians


def decode_centernet_3d(
    heatmap: jnp.ndarray,
    offset: jnp.ndarray,
    size: jnp.ndarray,
    depth3d: jnp.ndarray,
    dims3d: jnp.ndarray,
    rot: jnp.ndarray,
    intrinsics: jnp.ndarray,
    stride: int,
    top_k: int = 100,
    from_logits: bool = True,
) -> Detections3d:
    """Monocular 3D decode: peaks → metric camera-frame 3D boxes.

    depth3d : (B, Hs, Ws, 1) depth head logits (1/sigmoid - 1 param.).
    dims3d  : (B, Hs, Ws, 3) metric dims; rot (B, Hs, Ws, 2) yaw sin/cos.
    intrinsics : (B, 4) [fx, fy, cx, cy] in model-input pixels.
    Back-projection: X = (u - cx) Z / fx, Y = (v - cy) Z / fy with (u, v) the
    decoded 2D center in input pixels.
    """
    det, extras = decode_centernet_with_extras(
        heatmap, offset, size, stride,
        {"depth3d": depth3d, "dims3d": dims3d, "rot": rot},
        top_k, from_logits,
    )
    z = 1.0 / jax.nn.sigmoid(extras["depth3d"][..., 0]) - 1.0  # (B, K)
    u = (det.boxes[..., 0] + det.boxes[..., 2]) * 0.5
    v = (det.boxes[..., 1] + det.boxes[..., 3]) * 0.5
    fx = intrinsics[:, 0:1]
    fy = intrinsics[:, 1:2]
    cx = intrinsics[:, 2:3]
    cy = intrinsics[:, 3:4]
    X = (u - cx) * z / fx
    Y = (v - cy) * z / fy
    yaw = jnp.arctan2(extras["rot"][..., 0], extras["rot"][..., 1])
    return Detections3d(det, jnp.stack([X, Y, z], -1), extras["dims3d"], yaw)


def decode_centernet(
    heatmap: jnp.ndarray,
    offset: jnp.ndarray,
    size: jnp.ndarray,
    stride: int,
    top_k: int = 100,
    from_logits: bool = True,
) -> Detections:
    """NMS-free CenterNet decode on device.

    heatmap : (B, Hs, Ws, C) head output (logits by default).
    offset  : (B, Hs, Ws, 2) sub-pixel center offsets (x, y).
    size    : (B, Hs, Ws, 2) box (w, h) in output-stride units.
    """
    return _decode_core(heatmap, offset, size, stride, top_k, from_logits)[0]


def _decode_core(heatmap, offset, size, stride, top_k, from_logits):
    B, Hs, Ws, C = heatmap.shape
    prob = jax.nn.sigmoid(heatmap) if from_logits else heatmap

    pooled = _maxpool3x3(prob)
    peaks = jnp.where(pooled == prob, prob, 0.0)

    # Two-stage exact top-k (measured 8x faster than one lax.top_k over the
    # flat Hs*Ws*C ≈ 1.3M candidates, which rivals the whole forward pass):
    # stage 1 ranks pixels by their best class; any (pixel, class) in the
    # true global top-K lives in a pixel whose max is ≥ its score, and fewer
    # than K pixels can rank above that pixel, so gathering the full class
    # row of the top-K pixels and re-ranking those K*C candidates is exact
    # (modulo ties at the K-th score, where either equal-score set is valid).
    # Stage 1 can rank at most Hs*Ws pixels; small-resolution configs with
    # top_k > Hs*Ws gather every pixel (still exact, stage 2 ranks HW*C).
    k1 = min(top_k, Hs * Ws)
    pix_best = peaks.max(axis=-1).reshape(B, Hs * Ws)          # (B, HW)
    _, cand_pix = jax.lax.top_k(pix_best, k1)                  # (B, K1)
    cand = jnp.take_along_axis(
        peaks.reshape(B, Hs * Ws, C), cand_pix[..., None], axis=1
    )                                                          # (B, K1, C)
    scores, idx = jax.lax.top_k(cand.reshape(B, k1 * C), min(top_k, k1 * C))
    if top_k > k1 * C:
        # Tiny maps can't supply top_k candidates: pad with empty dets.
        pad = top_k - k1 * C
        scores = jnp.pad(scores, ((0, 0), (0, pad)))
        idx = jnp.pad(idx, ((0, 0), (0, pad)))

    cls = (idx % C).astype(jnp.int32)
    pix = jnp.take_along_axis(cand_pix, idx // C, axis=1)
    py = (pix // Ws).astype(jnp.float32)
    px = (pix % Ws).astype(jnp.float32)

    off_flat = offset.reshape(B, Hs * Ws, 2)
    sz_flat = size.reshape(B, Hs * Ws, 2)
    off = jnp.take_along_axis(off_flat, pix[..., None], axis=1)  # (B, K, 2)
    sz = jnp.take_along_axis(sz_flat, pix[..., None], axis=1)

    cx = (px + off[..., 0]) * stride
    cy = (py + off[..., 1]) * stride
    w = sz[..., 0] * stride
    h = sz[..., 1] * stride

    boxes = jnp.stack([cx - w * 0.5, cy - h * 0.5, cx + w * 0.5, cy + h * 0.5], -1)
    return Detections(boxes, scores, cls), pix


def semseg_argmax(logits: jnp.ndarray) -> jnp.ndarray:
    """(B, H, W, C) logits → (B, H, W) int32 class map."""
    return jnp.argmax(logits, axis=-1).astype(jnp.int32)


def colorize_semseg(class_map: jnp.ndarray, palette: jnp.ndarray) -> jnp.ndarray:
    """(..., H, W) int class map + (C, 3) uint8 palette → (..., H, W, 3) RGB.

    Device-side equivalent of the reference's host argmax+colorize
    (SURVEY.md §1 L6) — a single LUT gather.
    """
    return jnp.take(palette, class_map, axis=0)


def upsample_bilinear(x: jnp.ndarray, out_hw: Tuple[int, int]) -> jnp.ndarray:
    """Bilinear upsample (B, h, w, C) → (B, H, W, C), half-pixel centers.

    Used for the depth head's full-resolution output (SURVEY.md §1 L6).
    """
    from cvm_tpu.ops.image import full_roi, sample_bilinear

    roi = full_roi(x.shape[1], x.shape[2], out_hw[0], out_hw[1])
    return jax.vmap(lambda im: sample_bilinear(im, roi, out_hw))(x)
