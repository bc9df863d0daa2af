"""Joint weighted multitask loss (SURVEY.md §2 "Multitask model")."""

from __future__ import annotations

from typing import Dict, Tuple

import jax.numpy as jnp

from cvm_tpu.models.multitask.params import MultitaskParams
from cvm_tpu.models.centernet.loss import masked_l1_loss, penalty_reduced_focal_loss
from cvm_tpu.models.semseg.loss import semseg_loss
from cvm_tpu.models.semseg.params import SemsegParams
from cvm_tpu.models.depth.loss import depth_loss
from cvm_tpu.models.depth.params import DepthParams


def multitask_loss(
    outputs: Dict[str, jnp.ndarray],
    targets: Dict[str, jnp.ndarray],
    params: MultitaskParams,
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """targets: det (CenternetTargets-like dict), classes (B,H,W), depth (B,H,W,1)."""
    det = targets["det"]
    l_hm = penalty_reduced_focal_loss(
        outputs["heatmap"], det.heatmap, params.focal_alpha, params.focal_beta
    )
    l_off = masked_l1_loss(outputs["offset"], det.offset, det.mask)
    l_size = masked_l1_loss(outputs["size"], det.size, det.mask)
    l_det = l_hm + params.weight_offset * l_off + params.weight_size * l_size

    seg_p = SemsegParams(
        num_classes=params.num_seg_classes,
        class_weights=params.class_weights,
        ignore_index=params.ignore_index,
        label_smoothing=getattr(params, "label_smoothing", 0.0),
    )
    l_seg, seg_m = semseg_loss({"logits": outputs["logits"]}, targets, seg_p)

    dep_p = DepthParams(
        max_depth=params.max_depth,
        min_depth=params.min_depth,
        loss_type=params.depth_loss_type,
        num_scales=params.num_scales,
    )
    l_dep, dep_m = depth_loss(outputs, targets, dep_p)

    metrics = {
        "loss_det": l_det,
        "loss_hm": l_hm,
        "loss_seg": l_seg,
        "loss_depth": l_dep,
        "pixel_acc": seg_m["pixel_acc"],
        "abs_rel": dep_m["abs_rel"],
    }
    if getattr(params, "uncertainty_weighting", False):
        # Homoscedastic uncertainty weighting (Kendall et al. 2018): the
        # learnable log-variances replace the static task balance. exp(-s)
        # scales each task down as its noise estimate grows; +0.5 s stops
        # s -> inf from zeroing the task out.
        s = outputs["task_log_vars"]  # (3,) [det, seg, depth]
        total = (jnp.exp(-s[0]) * l_det + jnp.exp(-s[1]) * l_seg
                 + jnp.exp(-s[2]) * l_dep + 0.5 * jnp.sum(s))
        metrics.update(logvar_det=s[0], logvar_seg=s[1], logvar_depth=s[2])
    else:
        total = (params.weight_det * l_det + params.weight_seg * l_seg
                 + params.weight_depth * l_dep)
    metrics["loss"] = total
    return total, metrics
