"""CenterNet model: backbone + upsampling neck + heatmap/offset/size heads.

Capability parity with the reference's models/centernet/model.py
(SURVEY.md §2: conv backbone + upsampling neck + 1x1 heads — heatmap with
sigmoid/focal prior bias, offset (2), size (2) at output stride R).
"""

from __future__ import annotations

import math
from typing import Dict

import jax.numpy as jnp
from flax import linen as nn

from cvm_tpu.models.backbones import make_backbone, validate_input_hw
from cvm_tpu.models.layers import Head, UpBlock
from cvm_tpu.models.centernet.params import CenternetParams

# Focal-loss prior: initial heatmap prob ~0.1 everywhere.
_HM_BIAS = -math.log((1.0 - 0.1) / 0.1)


class CenterNet(nn.Module):
    params: CenternetParams

    @nn.compact
    def __call__(self, x, train: bool = False) -> Dict[str, jnp.ndarray]:
        p = self.params
        feats = make_backbone(
            p.backbone, getattr(p, "space_to_depth_stem", True),
            remat=getattr(p, "remat", False),
        )(x, train)
        # Decode c5 (stride 32) up to stride `p.stride` with skip connections.
        h = feats["c5"]
        skips = {16: feats["c4"], 8: feats["c3"], 4: feats["c2"], 2: feats["c1"]}
        s = 32
        i = 0
        while s > p.stride:
            s //= 2
            h = UpBlock(p.neck_features, name=f"up{i}")(h, skips.get(s), train)
            i += 1
        out = {
            "heatmap": Head(p.head_features, p.num_classes, _HM_BIAS, name="hm")(h, train),
            "offset": Head(p.head_features, 2, name="off")(h, train),
            "size": Head(p.head_features, 2, name="size")(h, train),
        }
        if p.with_3d:
            # Monocular 3D: depth via the 1/sigmoid(x)-1 parameterization
            # (Objects-as-Points §3D), absolute dims in meters, yaw sin/cos.
            out["depth3d"] = Head(p.head_features, 1, name="dep3d")(h, train)
            out["dims3d"] = Head(p.head_features, 3, name="dim3d")(h, train)
            out["rot"] = Head(p.head_features, 2, name="rot")(h, train)
        return out


def create_model(params: CenternetParams) -> CenterNet:
    """Reference-compatible zoo entry point."""
    validate_input_hw(params.input_hw)
    return CenterNet(params)
