"""Weighted cross-entropy with ignore label (SURVEY.md §2 "Semseg processor+loss")."""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from cvm_tpu.models.semseg.params import SemsegParams


def semseg_loss(
    outputs: Dict[str, jnp.ndarray],
    targets: Dict[str, jnp.ndarray],
    params: SemsegParams,
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """targets["classes"]: (B, H, W) int32 with ignore_index for void pixels."""
    logits = outputs["logits"]
    labels = targets["classes"]
    C = params.num_classes

    if len(params.class_weights) != C:
        # A short weight tuple would silently CLAMP label indices under jit
        # (classes beyond the tuple all get the last weight).
        raise ValueError(
            f"class_weights has {len(params.class_weights)} entries but "
            f"num_classes={C}; they must match"
        )
    valid = (labels != params.ignore_index) & (labels >= 0) & (labels < C)
    safe = jnp.where(valid, labels, 0)
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, safe[..., None], axis=-1)[..., 0]
    eps = float(getattr(params, "label_smoothing", 0.0))
    if eps > 0.0:
        # Uniform label smoothing: CE against (1-eps)·one_hot + eps/C.
        # The smoothed term is the mean of -log p over classes; eps=0
        # compiles to the exact unsmoothed program (branch is static).
        nll = (1.0 - eps) * nll + eps * (-jnp.mean(logp, axis=-1))

    w = jnp.asarray(params.class_weights, jnp.float32)[safe]
    nll = nll * w * valid.astype(jnp.float32)
    denom = jnp.maximum(jnp.sum(w * valid.astype(jnp.float32)), 1.0)
    loss = jnp.sum(nll) / denom

    # Pixel accuracy on valid pixels (cheap train-time metric).
    pred = jnp.argmax(logits, axis=-1)
    acc = jnp.sum((pred == labels) & valid) / jnp.maximum(jnp.sum(valid), 1)
    return loss, {"loss": loss, "pixel_acc": acc}


def miou_metric(pred: jnp.ndarray, labels: jnp.ndarray, num_classes: int, ignore_index: int = 255):
    """Confusion-matrix mIoU: returns (iou_per_class, miou)."""
    valid = (labels != ignore_index) & (labels >= 0) & (labels < num_classes)
    p = jnp.where(valid, pred, num_classes)
    l = jnp.where(valid, labels, num_classes)
    idx = l * (num_classes + 1) + p
    cm = jnp.bincount(idx.reshape(-1), length=(num_classes + 1) ** 2).reshape(
        num_classes + 1, num_classes + 1
    )[:num_classes, :num_classes]
    inter = jnp.diag(cm)
    union = cm.sum(0) + cm.sum(1) - inter
    iou = inter / jnp.maximum(union, 1)
    present = union > 0
    miou = jnp.sum(jnp.where(present, iou, 0.0)) / jnp.maximum(jnp.sum(present), 1)
    return iou, miou
