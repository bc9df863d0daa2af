"""CenterNet losses: penalty-reduced focal + masked L1 (SURVEY.md §2).

Follows "Objects as Points" (PAPERS.md, arXiv 1904.07850): focal loss with
alpha=2 on the heatmap, (1-Y)^beta penalty reduction off-center, and masked
L1 on offset/size gathered at GT centers. All dense, static-shape, VPU work.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from cvm_tpu.ops.heatmap import CenternetTargets
from cvm_tpu.models.centernet.params import CenternetParams


def penalty_reduced_focal_loss(
    logits: jnp.ndarray,
    target: jnp.ndarray,
    alpha: float = 2.0,
    beta: float = 4.0,
) -> jnp.ndarray:
    """Focal loss on heatmap logits vs rendered Gaussian target.

    Positive where target == 1; elsewhere penalty-reduced by (1-target)^beta.
    Normalized by the number of positives (per the paper). Returns a scalar.
    """
    prob = jax.nn.sigmoid(logits)
    prob = jnp.clip(prob, 1e-6, 1.0 - 1e-6)
    pos = (target >= 1.0 - 1e-6).astype(jnp.float32)
    neg = 1.0 - pos

    pos_loss = -jnp.log(prob) * (1.0 - prob) ** alpha * pos
    neg_loss = -jnp.log(1.0 - prob) * prob**alpha * (1.0 - target) ** beta * neg

    num_pos = jnp.maximum(jnp.sum(pos), 1.0)
    return (jnp.sum(pos_loss) + jnp.sum(neg_loss)) / num_pos


def masked_l1_loss(pred: jnp.ndarray, target: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Mean |pred-target| over pixels where mask==1 (GT centers)."""
    m = mask[..., None]
    num = jnp.maximum(jnp.sum(m), 1.0)
    return jnp.sum(jnp.abs(pred - target) * m) / num


def centernet_loss(
    outputs: Dict[str, jnp.ndarray],
    targets: CenternetTargets,
    params: CenternetParams,
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Composite loss. ``targets`` fields are batched (leading B axis)."""
    l_hm = penalty_reduced_focal_loss(
        outputs["heatmap"], targets.heatmap, params.focal_alpha, params.focal_beta
    )
    l_off = masked_l1_loss(outputs["offset"], targets.offset, targets.mask)
    l_size = masked_l1_loss(outputs["size"], targets.size, targets.mask)
    total = (
        params.weight_heatmap * l_hm
        + params.weight_offset * l_off
        + params.weight_size * l_size
    )
    metrics = {"loss": total, "loss_hm": l_hm, "loss_off": l_off, "loss_size": l_size}

    if params.with_3d and targets.extras:
        # Depth via 1/sigmoid-1 (Objects-as-Points 3D), L1 on dims and yaw
        # sin/cos, all masked to GT centers.
        pred_depth = 1.0 / jax.nn.sigmoid(outputs["depth3d"]) - 1.0
        l_dep = masked_l1_loss(pred_depth, targets.extras["depth3d"], targets.mask)
        l_dim = masked_l1_loss(outputs["dims3d"], targets.extras["dims3d"], targets.mask)
        l_rot = masked_l1_loss(outputs["rot"], targets.extras["rot"], targets.mask)
        total = (
            total
            + params.weight_depth3d * l_dep
            + params.weight_dims3d * l_dim
            + params.weight_rot * l_rot
        )
        metrics.update(
            {"loss": total, "loss_dep3d": l_dep, "loss_dim3d": l_dim, "loss_rot": l_rot}
        )
    return total, metrics
