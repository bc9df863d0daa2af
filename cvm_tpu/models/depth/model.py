"""Dense monocular depth net with multi-scale decoder (SURVEY.md §2, BASELINE C).

Encoder–decoder with a depth prediction at each decoder scale (strides 16, 8,
4, 2); the finest map is bilinearly upsampled to full resolution on device
(the reference did this on host; SURVEY.md §1 L6). Depth is parameterized as
sigmoid → [min_depth, max_depth] disparity-style for stable training.
"""

from __future__ import annotations

from typing import Dict, List

import jax
import jax.numpy as jnp
from flax import linen as nn

from cvm_tpu.models.backbones import make_backbone, validate_input_hw
from cvm_tpu.models.layers import Head, UpBlock
from cvm_tpu.models.depth.params import DepthParams
from cvm_tpu.ops.decode import upsample_bilinear


def sigmoid_to_depth(x: jnp.ndarray, min_depth: float, max_depth: float) -> jnp.ndarray:
    """Sigmoid output → metric depth via inverse-depth interpolation."""
    min_disp = 1.0 / max_depth
    max_disp = 1.0 / min_depth
    disp = min_disp + (max_disp - min_disp) * jax.nn.sigmoid(x)
    return 1.0 / disp


class DepthNet(nn.Module):
    params: DepthParams

    @nn.compact
    def __call__(self, x, train: bool = False) -> Dict[str, jnp.ndarray]:
        p = self.params
        H, W = x.shape[1], x.shape[2]
        feats = make_backbone(
            p.backbone, getattr(p, "space_to_depth_stem", True),
            remat=getattr(p, "remat", False),
        )(x, train)
        f = p.decoder_features
        h = feats["c5"]
        outs: List[jnp.ndarray] = []
        for i, (skip, width) in enumerate(
            [(feats["c4"], f * 4), (feats["c3"], f * 2), (feats["c2"], f * 2), (feats["c1"], f)]
        ):
            h = UpBlock(width, name=f"up{i}")(h, skip, train)
            outs.append(Head(f, 1, name=f"disp{i}")(h, train))
        scales = outs[-p.num_scales:][::-1]  # finest first
        depths = [sigmoid_to_depth(s, p.min_depth, p.max_depth) for s in scales]
        full = upsample_bilinear(depths[0], (H, W))
        return {"depth": full, "depth_scales": depths, "disp_logits": scales}


def create_model(params: DepthParams) -> DepthNet:
    """Reference-compatible zoo entry point."""
    validate_input_hw(params.input_hw)
    return DepthNet(params)
