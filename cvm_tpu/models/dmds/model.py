"""DMDS networks: depth net + ego/object motion net (SURVEY.md §2 "DMDS pipeline").

Two-frame unsupervised depth-from-motion modeled on Google's
depth-and-motion-learning line of work: a monocular depth net (shared with
the depth zoo entry) and a motion net taking both frames stacked on channels,
producing 6-DoF ego-motion plus an optional per-pixel residual (object)
translation field. BASELINE config E.
"""

from __future__ import annotations

from typing import Dict

import jax.numpy as jnp
from flax import linen as nn

from cvm_tpu.models.layers import ConvBN, Head, UpBlock, upsample2x
from cvm_tpu.models.dmds.params import DmdsParams

# Scales keep the raw head outputs O(1) while motions are centimeters-radians.
ROT_SCALE = 0.01
TRANS_SCALE = 0.1


class MotionNet(nn.Module):
    """(B, H, W, 6) stacked frame pair → ego-motion + residual translation field."""

    params: DmdsParams

    @nn.compact
    def __call__(self, pair, train: bool = False) -> Dict[str, jnp.ndarray]:
        p = self.params
        f = p.motion_features
        h = pair
        enc = []
        for i, w in enumerate([f // 8, f // 4, f // 2, f, f]):
            h = ConvBN(w, 3, stride=2, name=f"enc{i}")(h, train)
            enc.append(h)

        # Global ego-motion from a bottleneck global average.
        g = jnp.mean(h, axis=(1, 2))
        g = nn.Dense(f, name="fc1")(g.astype(jnp.float32))
        g = nn.silu(g)
        motion = nn.Dense(6, name="fc2", kernel_init=nn.initializers.zeros)(g)
        rotation = motion[:, :3] * ROT_SCALE
        translation = motion[:, 3:] * TRANS_SCALE

        out = {"rotation": rotation, "translation": translation}
        if p.predict_object_motion:
            # Decode a residual translation field back to input resolution.
            d = h
            for i, skip in enumerate(enc[-2::-1]):
                d = UpBlock(max(f // 2 ** (i + 1), 16), name=f"dec{i}")(d, skip, train)
            res = Head(16, 3, name="resmotion")(d, train)
            out["residual_translation"] = upsample2x(res) * TRANS_SCALE
        return out


class DmdsModel(nn.Module):
    """Bundles depth + motion nets; __call__ runs the two-frame forward."""

    params: DmdsParams

    def setup(self):
        p = self.params
        from cvm_tpu.models.depth.params import DepthParams
        from cvm_tpu.models.depth.model import DepthNet

        self.depth_net = DepthNet(
            DepthParams(
                input_hw=p.input_hw,
                backbone=p.backbone,
                decoder_features=p.decoder_features,
                num_scales=p.num_scales,
                max_depth=p.max_depth,
                min_depth=p.min_depth,
            ),
            name="depth",
        )
        self.motion_net = MotionNet(p, name="motion")

    def __call__(self, frames, train: bool = False) -> Dict[str, jnp.ndarray]:
        """frames: (B, H, W, 6) = [frame_t, frame_t1] stacked on channels."""
        a, b = frames[..., :3], frames[..., 3:]
        depth_a = self.depth_net(a, train)["depth"]
        depth_b = self.depth_net(b, train)["depth"]
        fwd = self.motion_net(frames, train)
        bwd = self.motion_net(jnp.concatenate([b, a], axis=-1), train)
        return {
            "depth_a": depth_a,
            "depth_b": depth_b,
            "motion_fwd": fwd,
            "motion_bwd": bwd,
        }


from cvm_tpu.models.backbones import validate_input_hw


def create_model(params: DmdsParams) -> DmdsModel:
    """Reference-compatible zoo entry point."""
    validate_input_hw(params.input_hw)
    return DmdsModel(params)
