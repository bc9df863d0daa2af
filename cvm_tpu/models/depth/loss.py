"""Masked sparse-GT depth regression losses (SURVEY.md §2 "Depth loss").

KITTI depth GT is sparse (LiDAR points); every loss masks to valid pixels
(depth > 0). Variants: L1, berHu (reverse Huber — the reference-era standard
for supervised depth), and scale-invariant log (Eigen).
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax.numpy as jnp

from cvm_tpu.models.depth.params import DepthParams
from cvm_tpu.ops.decode import upsample_bilinear


def _masked_mean(x, mask):
    return jnp.sum(x * mask) / jnp.maximum(jnp.sum(mask), 1.0)


def berhu(err: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Reverse Huber with adaptive threshold c = 0.2 * max|err| over valid px."""
    abs_err = jnp.abs(err) * mask
    c = 0.2 * jnp.max(abs_err) + 1e-6
    quad = (err**2 + c**2) / (2.0 * c)
    return _masked_mean(jnp.where(abs_err <= c, abs_err, quad), mask)


def silog(pred, gt, mask, lam: float = 0.85):
    d = (jnp.log(jnp.maximum(pred, 1e-3)) - jnp.log(jnp.maximum(gt, 1e-3))) * mask
    n = jnp.maximum(jnp.sum(mask), 1.0)
    return jnp.sum(d**2) / n - lam * (jnp.sum(d) / n) ** 2


def depth_loss(
    outputs: Dict[str, jnp.ndarray],
    targets: Dict[str, jnp.ndarray],
    params: DepthParams,
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """targets: depth (B, H, W, 1) metric, 0 where invalid."""
    gt = targets["depth"]
    mask = (gt > 0).astype(jnp.float32)

    total = 0.0
    # Multi-scale supervision: upsample each scale to full res (preserves the
    # sparse GT; downsampling GT would destroy isolated LiDAR points).
    for i, d in enumerate(outputs["depth_scales"]):
        pred = upsample_bilinear(d, gt.shape[1:3]) if d.shape[1:3] != gt.shape[1:3] else d
        if params.loss_type == "berhu":
            l = berhu(pred - gt, mask)
        elif params.loss_type == "silog":
            l = silog(pred, gt, mask)
        else:
            l = _masked_mean(jnp.abs(pred - gt), mask)
        total = total + l / (2.0**i)

    pred0 = outputs["depth"]
    abs_rel = _masked_mean(jnp.abs(pred0 - gt) / jnp.maximum(gt, 1e-3), mask)
    rmse = jnp.sqrt(_masked_mean((pred0 - gt) ** 2, mask))
    return total, {"loss": total, "abs_rel": abs_rel, "rmse": rmse}
