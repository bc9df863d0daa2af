"""DMDS processor: two frames + intrinsics → stacked input + loss targets.

Both frames share one ROI (no flip — it would mirror the motion field) and
the intrinsics are rescaled through the identical ROI math (SURVEY.md §7
"Hard parts" #5: fx/fy/cx/cy must track the letterbox transform).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from cvm_tpu.models.dmds.params import DmdsParams
from cvm_tpu.ops.image import sample_bilinear
from cvm_tpu.ops.warp import scale_intrinsics
from cvm_tpu.pipeline.preprocess import aug_from_params, make_rois, resample_yuv420_frame


def make_processor(params: DmdsParams, train: bool):
    aug = aug_from_params(params, flip_prob=0.0)  # flip would mirror motion
    out_hw = params.input_hw

    def process(key, batch):
        """batch: frame_t + frame_t1 as either RGB buffers (image/image_t1)
        or 4:2:0 plane sets (y/u/v + y_t1/u_t1/v_t1), image_hw (B,2),
        intrinsics (B,4). Both frames resample through ONE shared ROI."""
        rois = make_rois(key, batch["image_hw"], out_hw, train, aug)

        if "y" in batch:
            def one_yuv(yp, up, vp, hw, roi):
                return resample_yuv420_frame(yp, up, vp, hw, roi, out_hw)

            a = jax.vmap(one_yuv)(batch["y"], batch["u"], batch["v"],
                                  batch["image_hw"], rois)
            b = jax.vmap(one_yuv)(batch["y_t1"], batch["u_t1"], batch["v_t1"],
                                  batch["image_hw"], rois)
        else:
            def one(img, hw, roi):
                return sample_bilinear(img, roi, out_hw, valid_hw=(hw[0], hw[1]))

            a = jax.vmap(one)(batch["image"], batch["image_hw"], rois)
            b = jax.vmap(one)(batch["image_t1"], batch["image_hw"], rois)
        frames01 = jnp.concatenate([a, b], axis=-1) / 255.0
        intr = jax.vmap(scale_intrinsics)(batch["intrinsics"], rois)
        inputs = frames01 * 2.0 - 1.0
        return inputs, {"frames": frames01, "intrinsics": intr}

    return process
