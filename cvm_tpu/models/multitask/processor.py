"""Multitask processor: one ROI drives image, boxes, mask, and depth GT."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from cvm_tpu.models.multitask.params import MultitaskParams
from cvm_tpu.ops.heatmap import render_centernet_targets_batch
from cvm_tpu.ops.image import (
    clip_boxes,
    map_boxes_to_output,
    rotate_boxes,
    sample_nearest,
)
from cvm_tpu.pipeline.preprocess import (
    aug_from_params,
    preprocess_batch,
    rotate_image_batch,
    sample_rotation,
)


def make_processor(params: MultitaskParams, train: bool):
    aug = aug_from_params(params)
    out_hw = params.input_hw

    def process(key, batch):
        images, rois = preprocess_batch(key, batch, out_hw, train, aug)

        out_boxes = jax.vmap(map_boxes_to_output)(batch["boxes"], rois)
        angles = sample_rotation(key, images.shape[0], aug, train)
        if angles is not None:
            # One roll drives every modality (same invariant as the shared
            # ROI): image bilinear, boxes AABB-of-corners, mask/depth nearest.
            images = rotate_image_batch(images, angles)
            center = ((out_hw[1] - 1) / 2.0, (out_hw[0] - 1) / 2.0)
            out_boxes = jax.vmap(
                lambda b, a: rotate_boxes(b, a, center)
            )(out_boxes, angles)
            # Clip the rotated AABBs to the canvas (see centernet processor).
            out_boxes = clip_boxes(out_boxes, out_hw)
        boxes = out_boxes / params.det_stride
        K = batch["boxes"].shape[1]
        valid = jnp.arange(K)[None, :] < batch["num_objects"][:, None]
        det = render_centernet_targets_batch(
            boxes, batch["classes"], valid, params.det_map_hw,
            params.num_det_classes, params.min_overlap,
        )

        def seg_one(mask, hw, roi):
            return sample_nearest(
                mask, roi, out_hw, valid_hw=(hw[0], hw[1]), pad_value=params.ignore_index
            )

        seg = jax.vmap(seg_one)(batch["mask"].astype(jnp.int32), batch["image_hw"], rois)
        if angles is not None:
            seg = rotate_image_batch(seg, angles,
                                     pad_value=params.ignore_index,
                                     method="nearest")

        def depth_one(d, hw, roi):
            return sample_nearest(d, roi, out_hw, valid_hw=(hw[0], hw[1]), pad_value=0.0)

        depth = jax.vmap(depth_one)(batch["depth"], batch["image_hw"], rois)
        if angles is not None:
            depth = rotate_image_batch(depth, angles, pad_value=0.0,
                                       method="nearest")

        return images, {"det": det, "classes": seg, "depth": depth[..., None]}

    return process
