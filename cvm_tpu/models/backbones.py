"""Convolutional backbones producing a multi-scale feature pyramid.

The reference uses small edge-friendly Keras convnets (SURVEY.md §2
"CenterNet model": conv backbone + upsampling neck). Here the backbone is a
residual pyramid sized for the MXU: widths are multiples of 32 with the deep
stages at 128/256 so channel contractions tile the 128-lane systolic array.

Returns features at strides {2, 4, 8, 16, 32} as a dict ``{"c1".."c5"}``.
"""

from __future__ import annotations

from typing import Dict, Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

from cvm_tpu.models.layers import ConvBN, ResBlock

# name → (stage widths c1..c5, blocks per stage c2..c5)
BACKBONE_SPECS: Dict[str, Tuple[Sequence[int], Sequence[int]]] = {
    "tiny": ((16, 32, 64, 128, 256), (1, 1, 2, 2)),
    "small": ((32, 64, 128, 256, 512), (1, 2, 2, 2)),
    "base": ((32, 64, 128, 256, 512), (2, 3, 4, 2)),
}


def space_to_depth(x: jnp.ndarray, block: int = 2) -> jnp.ndarray:
    """(B, H, W, C) → (B, H/b, W/b, C·b²) — pure relayout, fuses upstream."""
    B, H, W, C = x.shape
    x = x.reshape(B, H // block, block, W // block, block, C)
    return jnp.transpose(x, (0, 1, 3, 2, 4, 5)).reshape(
        B, H // block, W // block, C * block * block
    )


class Backbone(nn.Module):
    widths: Sequence[int] = BACKBONE_SPECS["small"][0]
    depths: Sequence[int] = BACKBONE_SPECS["small"][1]
    # RGB stems starve the 128-lane MXU (3/128 channels). Space-to-depth
    # trades the stride-2 RGB conv for a stride-1 conv on 12 channels at the
    # same output resolution — identical receptive geometry, 4x better lane
    # utilization (profiled as the single largest fusion of the e2e step).
    space_to_depth_stem: bool = True
    # Gradient checkpointing (jax.checkpoint / rematerialisation): drop each
    # residual block's internal activations on the forward pass and recompute
    # them during backprop — activation memory scales with block COUNT
    # instead of block DEPTH, buying larger batches/resolutions per chip for
    # ~1/3 extra backbone FLOPs. Param tree, outputs, and gradients are
    # unchanged (tests/test_remat.py), so the flag can toggle on an existing
    # checkpoint (unlike space_to_depth_stem, which changes param shapes).
    remat: bool = False
    dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False) -> Dict[str, jnp.ndarray]:
        feats = {}
        # static_argnums=(2,): `train` is python control flow, not a tracer.
        Block = (nn.remat(ResBlock, static_argnums=(2,))
                 if self.remat else ResBlock)
        if self.space_to_depth_stem:
            x = ConvBN(self.widths[0], 3, stride=1, name="stem")(
                space_to_depth(x, 2), train
            )
        else:
            x = ConvBN(self.widths[0], 3, stride=2, name="stem")(x, train)
        feats["c1"] = x
        for i, (w, d) in enumerate(zip(self.widths[1:], self.depths)):
            x = ConvBN(w, 3, stride=2, name=f"down{i + 2}")(x, train)
            for j in range(d):
                x = Block(w, name=f"s{i + 2}b{j}")(x, train)
            feats[f"c{i + 2}"] = x
        return feats


def validate_input_hw(hw, divisor: int = 32) -> None:
    """Fail fast on input sizes the pyramid cannot halve cleanly.

    The stem + downsampling stages + decoder skip-concats need every
    intermediate resolution to stay even; an indivisible input (e.g. 48)
    otherwise surfaces as an opaque shape-mismatch concatenate error deep in
    the neck. All shipped configs (512², 640×256, 128², 96², 64², 32²) are
    multiples of 32.
    """
    h, w = int(hw[0]), int(hw[1])
    if h % divisor or w % divisor:
        raise ValueError(
            f"input_hw must be multiples of {divisor} (stem + downsampling "
            f"pyramid + decoder skip alignment need even intermediate "
            f"resolutions); got {(h, w)}"
        )


def make_backbone(name: str, space_to_depth_stem: bool = True,
                  remat: bool = False) -> Backbone:
    widths, depths = BACKBONE_SPECS[name]
    return Backbone(widths=widths, depths=depths,
                    space_to_depth_stem=space_to_depth_stem, remat=remat)
