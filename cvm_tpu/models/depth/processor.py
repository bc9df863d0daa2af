"""Depth device-side processor: image + sparse depth map → input + GT.

Sparse LiDAR GT is resampled nearest-neighbor (bilinear would smear isolated
valid points into invalid zeros) with the same ROI as the image; zoom changes
perspective but supervised metric depth is scale-anchored by the GT itself,
so augmentation is kept mild (params.aug_scale_range). SURVEY.md §2.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from cvm_tpu.models.depth.params import DepthParams
from cvm_tpu.ops.image import sample_nearest
from cvm_tpu.pipeline.preprocess import (
    aug_from_params,
    preprocess_batch,
    rotate_image_batch,
    sample_rotation,
)


def make_processor(params: DepthParams, train: bool):
    aug = aug_from_params(params)
    out_hw = params.input_hw

    def process(key, batch):
        images, rois = preprocess_batch(key, batch, out_hw, train, aug)

        def one(d, hw, roi):
            return sample_nearest(d, roi, out_hw, valid_hw=(hw[0], hw[1]), pad_value=0.0)

        depth = jax.vmap(one)(batch["depth"], batch["image_hw"], rois)
        angles = sample_rotation(key, images.shape[0], aug, train)
        if angles is not None:
            # Camera roll keeps per-pixel depth valid; GT rotates nearest
            # (pad 0 = invalid, masked by the loss).
            images = rotate_image_batch(images, angles)
            depth = rotate_image_batch(depth, angles, pad_value=0.0,
                                       method="nearest")
        return images, {"depth": depth[..., None]}

    return process
