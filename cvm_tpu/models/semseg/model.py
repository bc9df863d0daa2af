"""Encoder–decoder semantic segmentation model (SURVEY.md §2 "Semseg model").

U-Net-shaped: pyramid backbone down to stride 32, skip-connected decoder back
to stride 2, then a 2x upsampled fp32 logit head at full input resolution.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from cvm_tpu.models.backbones import make_backbone
from cvm_tpu.models.layers import Head, UpBlock, upsample2x
from cvm_tpu.models.semseg.params import SemsegParams


class SemsegNet(nn.Module):
    params: SemsegParams

    @nn.compact
    def __call__(self, x, train: bool = False):
        p = self.params
        feats = make_backbone(p.backbone)(x, train)
        h = feats["c5"]
        f = p.decoder_features
        h = UpBlock(f * 4, name="up16")(h, feats["c4"], train)
        h = UpBlock(f * 2, name="up8")(h, feats["c3"], train)
        h = UpBlock(f * 2, name="up4")(h, feats["c2"], train)
        h = UpBlock(f, name="up2")(h, feats["c1"], train)
        logits = Head(f, p.num_classes, name="seg")(h, train)  # stride 2, fp32
        return {"logits": upsample2x(logits)}  # full res


def create_model(params: SemsegParams) -> SemsegNet:
    """Reference-compatible zoo entry point."""
    return SemsegNet(params)
