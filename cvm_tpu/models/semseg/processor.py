"""Semseg device-side processor: image + class-id mask → input + GT.

The color-PNG → class-id conversion happens once at dataset pack time (the
adapter's job, like the reference's upload scripts); at train time the mask
is resampled on device with the *same* ROI as the image (nearest neighbor,
pad = ignore_index). SURVEY.md §2 "Semseg processor+loss".
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from cvm_tpu.models.semseg.params import SemsegParams
from cvm_tpu.ops.image import sample_nearest
from cvm_tpu.pipeline.preprocess import (
    aug_from_params,
    preprocess_batch,
    rotate_image_batch,
    sample_rotation,
)


def make_processor(params: SemsegParams, train: bool):
    aug = aug_from_params(params)
    out_hw = params.input_hw

    def process(key, batch):
        images, rois = preprocess_batch(key, batch, out_hw, train, aug)

        def one(mask, hw, roi):
            return sample_nearest(
                mask, roi, out_hw, valid_hw=(hw[0], hw[1]), pad_value=params.ignore_index
            )

        classes = jax.vmap(one)(
            batch["mask"].astype(jnp.int32), batch["image_hw"], rois
        )
        angles = sample_rotation(key, images.shape[0], aug, train)
        if angles is not None:
            # Rotation augmentation: mask rides the same roll (nearest, pad
            # = ignore so rotated-in corners don't train as a real class).
            images = rotate_image_batch(images, angles)
            classes = rotate_image_batch(
                classes, angles, pad_value=params.ignore_index, method="nearest"
            )
        return images, {"classes": classes}

    return process
