"""Encoder–decoder semantic segmentation model (SURVEY.md §2 "Semseg model").

U-Net-shaped: pyramid backbone down to stride 32, skip-connected decoder back
to stride 2, then a 2x upsampled fp32 logit head at full input resolution.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from cvm_tpu.models.backbones import make_backbone, validate_input_hw
from cvm_tpu.models.layers import Head, UpBlock, upsample2x
from cvm_tpu.models.semseg.params import SemsegParams


class SemsegNet(nn.Module):
    params: SemsegParams
    # When params.spatial_shard is on and a mesh is supplied, the head's 3x3
    # conv (the largest-spatial-extent conv in the decoder, stride 2) runs
    # H-sharded over the mesh "model" axis with halo exchange — the spatial
    # analogue of context parallelism (SURVEY.md §5 long-context row; same
    # params/outputs, execution layout only).
    mesh: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        p = self.params
        feats = make_backbone(
            p.backbone, getattr(p, "space_to_depth_stem", True),
            remat=getattr(p, "remat", False),
        )(x, train)
        h = feats["c5"]
        f = p.decoder_features
        h = UpBlock(f * 4, name="up16")(h, feats["c4"], train)
        h = UpBlock(f * 2, name="up8")(h, feats["c3"], train)
        h = UpBlock(f * 2, name="up4")(h, feats["c2"], train)
        h = UpBlock(f, name="up2")(h, feats["c1"], train)
        smesh = self.mesh if getattr(p, "spatial_shard", False) else None
        logits = Head(f, p.num_classes, spatial_mesh=smesh, name="seg")(h, train)
        return {"logits": upsample2x(logits)}  # full res


def create_model(params: SemsegParams, mesh: Any = None) -> SemsegNet:
    """Reference-compatible zoo entry point (+ optional mesh for the
    spatial-sharding execution path)."""
    validate_input_hw(params.input_hw)
    return SemsegNet(params, mesh=mesh)
