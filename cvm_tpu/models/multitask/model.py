"""Shared-backbone multitask model: semseg + depth + detection heads.

Capability parity with the reference's models/multitask/ (SURVEY.md §2:
shared backbone, three heads, joint weighted loss; BASELINE config D). One
shared decoder trunk up to stride 4 feeds the CenterNet-style detection heads
and branches for full-resolution semseg logits and depth.
"""

from __future__ import annotations

import math
from typing import Dict

import jax.numpy as jnp
from flax import linen as nn

from cvm_tpu.models.backbones import make_backbone, validate_input_hw
from cvm_tpu.models.layers import Head, UpBlock, upsample2x
from cvm_tpu.models.multitask.params import MultitaskParams
from cvm_tpu.models.depth.model import sigmoid_to_depth
from cvm_tpu.ops.decode import upsample_bilinear

_HM_BIAS = -math.log((1.0 - 0.1) / 0.1)


class MultitaskNet(nn.Module):
    params: MultitaskParams

    @nn.compact
    def __call__(self, x, train: bool = False) -> Dict[str, jnp.ndarray]:
        p = self.params
        H, W = x.shape[1], x.shape[2]
        feats = make_backbone(
            p.backbone, getattr(p, "space_to_depth_stem", True),
            remat=getattr(p, "remat", False),
        )(x, train)
        f = p.neck_features

        # Shared decoder trunk: stride 32 → 4.
        h = UpBlock(f * 2, name="up16")(feats["c5"], feats["c4"], train)
        h = UpBlock(f * 2, name="up8")(h, feats["c3"], train)
        trunk4 = UpBlock(f, name="up4")(h, feats["c2"], train)

        # Detection heads at stride 4 (CenterNet-style).
        out = {
            "heatmap": Head(p.head_features, p.num_det_classes, _HM_BIAS, name="hm")(trunk4, train),
            "offset": Head(p.head_features, 2, name="off")(trunk4, train),
            "size": Head(p.head_features, 2, name="size")(trunk4, train),
        }

        # Dense branch: stride 4 → 2 → (2x) full res.
        dense2 = UpBlock(f // 2, name="up2")(trunk4, feats["c1"], train)
        seg = Head(p.head_features, p.num_seg_classes, name="seg")(dense2, train)
        out["logits"] = upsample2x(seg)

        disp = Head(p.head_features, 1, name="disp")(dense2, train)
        depth2 = sigmoid_to_depth(disp, p.min_depth, p.max_depth)
        out["depth"] = upsample_bilinear(depth2, (H, W))
        out["depth_scales"] = [depth2]
        if getattr(p, "uncertainty_weighting", False):
            # Learnable per-task log-variances [det, seg, depth] consumed by
            # multitask_loss (Kendall weighting); inert at inference (the
            # postprocess reads only the head keys).
            out["task_log_vars"] = self.param(
                "task_log_vars", nn.initializers.zeros, (3,)
            )
        return out


def create_model(params: MultitaskParams) -> MultitaskNet:
    """Reference-compatible zoo entry point."""
    validate_input_hw(params.input_hw)
    return MultitaskNet(params)
