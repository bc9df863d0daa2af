"""Device-side CenterNet ground-truth rendering (Gaussian heatmap splat).

TPU-native replacement for the reference's host NumPy GT loop
(models/centernet/processor.py per SURVEY.md §2: per-class Gaussian heatmaps,
center offset map, size map at output stride — "Objects as Points" style).

Design: instead of a serial per-object splat (irregular scatter, hostile to
XLA), every (object, pixel) pair is evaluated in parallel on the VPU —
``exp`` over a (K, Hs, Ws) lattice — and combined per class with
``segment_max``. K·Hs·Ws is ~2M floats for K=128 objects on a 128x128 map:
trivial VPU work that XLA fuses into one pass, and fully batched via vmap.
Offset/size/indicator maps are written with scatter-drop at integer centers.

All shapes static: objects are padded to ``max_objects`` with a validity mask
(SURVEY.md §7 "Hard parts" #3).
"""

from __future__ import annotations

from typing import Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp


def gaussian_radius(height, width, min_overlap: float = 0.7):
    """Minimum Gaussian radius keeping IoU ≥ min_overlap (CornerNet/CenterNet).

    jnp port of the standard three-case quadratic bound used by the
    Objects-as-Points GT renderer (PAPERS.md: arXiv 1904.07850).
    """
    h = jnp.asarray(height, jnp.float32)
    w = jnp.asarray(width, jnp.float32)

    a1 = 1.0
    b1 = h + w
    c1 = w * h * (1.0 - min_overlap) / (1.0 + min_overlap)
    sq1 = jnp.sqrt(jnp.maximum(b1 * b1 - 4.0 * a1 * c1, 0.0))
    r1 = (b1 + sq1) / 2.0

    a2 = 4.0
    b2 = 2.0 * (h + w)
    c2 = (1.0 - min_overlap) * w * h
    sq2 = jnp.sqrt(jnp.maximum(b2 * b2 - 4.0 * a2 * c2, 0.0))
    r2 = (b2 + sq2) / (2.0 * a2)

    a3 = 4.0 * min_overlap
    b3 = -2.0 * min_overlap * (h + w)
    c3 = (min_overlap - 1.0) * w * h
    sq3 = jnp.sqrt(jnp.maximum(b3 * b3 - 4.0 * a3 * c3, 0.0))
    r3 = (b3 + sq3) / (2.0 * a3)

    return jnp.minimum(jnp.minimum(r1, r2), r3)


class CenternetTargets(NamedTuple):
    heatmap: jnp.ndarray  # (Hs, Ws, C) in [0, 1]
    offset: jnp.ndarray   # (Hs, Ws, 2) sub-pixel center offset at GT centers
    size: jnp.ndarray     # (Hs, Ws, 2) box (w, h) in output-stride units
    mask: jnp.ndarray     # (Hs, Ws) 1.0 at GT centers
    # Per-object views (for losses that gather instead of densify):
    indices: jnp.ndarray  # (K,) flat center index y*Ws+x (0 where invalid)
    valid: jnp.ndarray    # (K,) bool
    # Optional extra dense regression maps scattered at centers (3D targets:
    # depth3d (1), dims3d (3), rot (2) — SURVEY.md §2 "CenterNet processor").
    # None when absent (a {} default on a NamedTuple would be one shared
    # mutable dict across every instance).
    extras: Optional[Dict[str, jnp.ndarray]] = None


def prepare_centers(boxes, valid, map_hw, min_overlap):
    """Shared center/size/in-bounds/radius/sigma prep for the XLA and Pallas
    renderers — ONE definition so a geometry fix propagates to both.

    boxes (..., K, 4) output-map coords → (cx, cy, bw, bh, valid&in_bounds,
    ix, iy, radius, sigma), all (..., K).
    """
    Hs, Ws = map_hw
    cx = (boxes[..., 0] + boxes[..., 2]) * 0.5
    cy = (boxes[..., 1] + boxes[..., 3]) * 0.5
    bw = jnp.maximum(boxes[..., 2] - boxes[..., 0], 0.0)
    bh = jnp.maximum(boxes[..., 3] - boxes[..., 1], 0.0)
    in_bounds = (cx >= 0) & (cx < Ws) & (cy >= 0) & (cy < Hs) & (bw > 0) & (bh > 0)
    valid = valid & in_bounds
    ix = jnp.clip(jnp.floor(cx), 0, Ws - 1).astype(jnp.int32)
    iy = jnp.clip(jnp.floor(cy), 0, Hs - 1).astype(jnp.int32)
    radius = jnp.maximum(gaussian_radius(bh, bw, min_overlap), 0.0)
    radius = jnp.maximum(jnp.floor(radius), 0.0)  # CenterNet uses int radius
    sigma = (2.0 * radius + 1.0) / 6.0
    return cx, cy, bw, bh, valid, ix, iy, radius, sigma


def render_centernet_targets(
    boxes: jnp.ndarray,
    classes: jnp.ndarray,
    valid: jnp.ndarray,
    map_hw: Tuple[int, int],
    num_classes: int,
    min_overlap: float = 0.7,
    extra_values: Optional[Dict[str, jnp.ndarray]] = None,
) -> CenternetTargets:
    """Render CenterNet GT for one image.

    boxes   : (K, 4) [x0, y0, x1, y1] in OUTPUT-map (stride-divided) coords.
    classes : (K,) int32 class ids in [0, num_classes).
    valid   : (K,) bool — padding mask (static K = max_objects).
    extra_values : optional {name: (K, C)} per-object regressands scattered
        densely at the integer centers (3D detection targets etc.).
    """
    Hs, Ws = map_hw
    K = boxes.shape[0]

    cx, cy, bw, bh, valid, ix, iy, radius, sigma = prepare_centers(
        boxes, valid, map_hw, min_overlap
    )

    # (K, Hs, Ws) Gaussian lattice, fused exp on the VPU.
    ys = jnp.arange(Hs, dtype=jnp.float32)
    xs = jnp.arange(Ws, dtype=jnp.float32)
    dy2 = (ys[None, :] - iy[:, None].astype(jnp.float32)) ** 2  # (K, Hs)
    dx2 = (xs[None, :] - ix[:, None].astype(jnp.float32)) ** 2  # (K, Ws)
    d2 = dy2[:, :, None] + dx2[:, None, :]
    g = jnp.exp(-d2 / (2.0 * sigma[:, None, None] ** 2 + 1e-12))
    # CenterNet truncates the splat to a (2r+1) square window around the center.
    in_win = (dy2[:, :, None] <= radius[:, None, None] ** 2 + 1e-6) & (
        dx2[:, None, :] <= radius[:, None, None] ** 2 + 1e-6
    )
    g = jnp.where(in_win & valid[:, None, None], g, 0.0)

    # Per-class max-combine: invalid objects → segment C (sliced off).
    seg = jnp.where(valid, classes, num_classes).astype(jnp.int32)
    hm = jax.ops.segment_max(g, seg, num_segments=num_classes + 1)
    hm = jnp.maximum(hm[:num_classes], 0.0)  # empty segments are -inf
    heatmap = jnp.transpose(hm, (1, 2, 0))

    # Scatter offset / size / mask at integer centers (drop-on-invalid).
    flat = iy * Ws + ix
    flat_or_oob = jnp.where(valid, flat, Hs * Ws)  # OOB → dropped
    off = jnp.stack([cx - ix.astype(jnp.float32), cy - iy.astype(jnp.float32)], -1)
    sz = jnp.stack([bw, bh], axis=-1)

    offset = (
        jnp.zeros((Hs * Ws, 2), jnp.float32).at[flat_or_oob].set(off, mode="drop")
    ).reshape(Hs, Ws, 2)
    size = (
        jnp.zeros((Hs * Ws, 2), jnp.float32).at[flat_or_oob].set(sz, mode="drop")
    ).reshape(Hs, Ws, 2)
    mask = (
        jnp.zeros((Hs * Ws,), jnp.float32).at[flat_or_oob].set(1.0, mode="drop")
    ).reshape(Hs, Ws)

    extras = {}
    if extra_values:
        for name, vals in extra_values.items():
            C = vals.shape[-1]
            extras[name] = (
                jnp.zeros((Hs * Ws, C), jnp.float32)
                .at[flat_or_oob]
                .set(vals.astype(jnp.float32), mode="drop")
            ).reshape(Hs, Ws, C)

    # indices honors its documented "0 where invalid" contract — the raw
    # clipped flat index is garbage for padding objects (undefined int cast
    # when padded boxes are NaN).
    safe_indices = jnp.where(valid, flat, 0)
    return CenternetTargets(heatmap, offset, size, mask, safe_indices, valid, extras)


def render_centernet_targets_batch(
    boxes, classes, valid, map_hw, num_classes, min_overlap=0.7, extra_values=None
):
    """vmapped batch variant: boxes (B, K, 4), classes (B, K), valid (B, K);
    extra_values {name: (B, K, C)}."""
    if extra_values:
        return jax.vmap(
            lambda b, c, v, e: render_centernet_targets(
                b, c, v, map_hw, num_classes, min_overlap, e
            )
        )(boxes, classes, valid, extra_values)
    return jax.vmap(
        lambda b, c, v: render_centernet_targets(b, c, v, map_hw, num_classes, min_overlap)
    )(boxes, classes, valid)
