"""CenterNet device-side processor: image + boxes → model input + GT maps.

Device rebuild of the reference's models/centernet/processor.py (SURVEY.md
§2 "CenterNet processor"): letterbox/augment/normalize fused with the GT
Gaussian-splat render, all inside one jitted program.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from cvm_tpu.models.centernet.params import CenternetParams
from cvm_tpu.ops.heatmap import CenternetTargets, render_centernet_targets_batch
from cvm_tpu.ops.image import clip_boxes, map_boxes_to_output, rotate_boxes
from cvm_tpu.pipeline.preprocess import (
    aug_from_params,
    preprocess_batch,
    rotate_image_batch,
    sample_rotation,
)


def make_processor(params: CenternetParams, train: bool):
    """Returns jit-compatible (key, raw_batch) → (inputs, targets).

    raw_batch: image (B, Hmax, Wmax, 3) uint8; image_hw (B, 2) int32;
               boxes (B, K, 4) [x0,y0,x1,y1] original px; classes (B, K);
               num_objects (B,).
    """
    from cvm_tpu.utils.backend import is_tpu_backend

    aug = aug_from_params(params)
    if params.with_3d and aug.rotate_deg > 0.0:
        raise ValueError(
            "aug_rotate_deg is incompatible with with_3d: monocular yaw and "
            "back-projection assume an unrolled camera (keep rotation off "
            "for 3D configs, like the tight aug_scale_range guidance)"
        )
    out_hw = params.input_hw
    map_hw = params.map_hw
    use_pallas = params.use_pallas_splat and is_tpu_backend()

    def process(key, batch) -> Tuple[jnp.ndarray, CenternetTargets]:
        images, rois = preprocess_batch(key, batch, out_hw, train, aug)
        out_boxes = jax.vmap(map_boxes_to_output)(batch["boxes"], rois)
        angles = sample_rotation(key, images.shape[0], aug, train)
        if angles is not None:
            # Rotation augmentation: image and boxes through the same roll
            # (boxes become the AABB of their rotated corners).
            images = rotate_image_batch(images, angles)
            center = ((out_hw[1] - 1) / 2.0, (out_hw[0] - 1) / 2.0)  # (cx, cy)
            out_boxes = jax.vmap(
                lambda b, a: rotate_boxes(b, a, center)
            )(out_boxes, angles)
            # Rotated AABBs can spill past the canvas: clip so wh targets
            # cover only visible pixels; fully-outside boxes degenerate to
            # zero area and are dropped by prepare_centers' validity check.
            out_boxes = clip_boxes(out_boxes, out_hw)
        boxes = out_boxes / params.stride
        K = batch["boxes"].shape[1]
        valid = jnp.arange(K)[None, :] < batch["num_objects"][:, None]
        extra_values = None
        if params.with_3d and "loc3d" in batch:
            # Camera-frame z, metric dims, yaw as sin/cos. Depth is left
            # augmentation-uncorrected (CenterNet ddd convention); 3D configs
            # should keep aug_scale_range tight.
            # Horizontal flip mirrors the camera: ry → pi - ry, i.e. sin
            # unchanged, cos negated — without this ~half the flipped samples
            # supervise the rotation head with the wrong cos sign.
            ry = batch["rot_y"]
            flip_sign = jnp.where(rois.flip_x, -1.0, 1.0)[:, None]
            extra_values = {
                "depth3d": batch["loc3d"][..., 2:3],
                "dims3d": batch["dims3d"],
                "rot": jnp.stack(
                    [jnp.sin(ry), jnp.cos(ry) * flip_sign], axis=-1
                ),
            }
        targets = render_centernet_targets_batch(
            boxes, batch["classes"], valid, map_hw, params.num_classes,
            params.min_overlap, extra_values,
        )
        if use_pallas:
            # VMEM-resident splat; the unused XLA lattice heatmap is DCE'd.
            from cvm_tpu.ops.pallas.gaussian_splat import render_heatmap_pallas

            hm = render_heatmap_pallas(
                boxes, batch["classes"], valid, map_hw,
                params.num_classes, params.min_overlap,
            )
            targets = targets._replace(heatmap=hm)
        return images, targets

    return process
