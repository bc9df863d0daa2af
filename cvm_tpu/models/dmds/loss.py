"""DMDS composite loss: photometric + smoothness + motion regularization + cycle.

SURVEY.md §3.4 / BASELINE config E: SSIM+L1 photometric consistency via
differentiable warping, edge-aware depth smoothness, motion-field group
smoothness + sparsity, and forward/backward rotation-translation cycle
consistency. All dense jnp; symmetric in the two frames.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax.numpy as jnp

from cvm_tpu.models.dmds.params import DmdsParams
from cvm_tpu.ops.ssim import ssim
from cvm_tpu.ops.warp import euler_to_matrix, warp_frame


def _masked_mean(x, mask):
    return jnp.sum(x * mask) / jnp.maximum(jnp.sum(mask), 1.0)


def photometric_loss(target, warped, valid, alpha: float):
    """alpha*SSIM + (1-alpha)*L1 on [0,1]-scaled RGB, masked to valid pixels."""
    l1 = jnp.abs(target - warped)
    s = ssim(target, warped)  # VALID window: (B, H-2, W-2, C)
    l1_m = _masked_mean(l1, valid)
    s_m = _masked_mean(s, valid[:, 1:-1, 1:-1, :])
    return alpha * s_m + (1.0 - alpha) * l1_m


def edge_aware_smoothness(depth, image):
    """Disparity smoothness weighted down at image edges (Monodepth-style)."""
    disp = 1.0 / jnp.maximum(depth, 1e-3)
    disp = disp / (jnp.mean(disp, axis=(1, 2, 3), keepdims=True) + 1e-7)
    dx_d = jnp.abs(disp[:, :, 1:] - disp[:, :, :-1])
    dy_d = jnp.abs(disp[:, 1:] - disp[:, :-1])
    dx_i = jnp.mean(jnp.abs(image[:, :, 1:] - image[:, :, :-1]), -1, keepdims=True)
    dy_i = jnp.mean(jnp.abs(image[:, 1:] - image[:, :-1]), -1, keepdims=True)
    return jnp.mean(dx_d * jnp.exp(-dx_i)) + jnp.mean(dy_d * jnp.exp(-dy_i))


def motion_field_regularization(res_trans):
    """Group smoothness + sqrt sparsity on the residual translation field.

    The sqrt sparsity term (sum of sqrt-normalized magnitudes) drives the
    object-motion field to zero outside genuinely moving objects
    (depth-and-motion-learning's regularizer family).
    """
    dx = res_trans[:, :, 1:] - res_trans[:, :, :-1]
    dy = res_trans[:, 1:] - res_trans[:, :-1]
    smooth = jnp.mean(jnp.abs(dx)) + jnp.mean(jnp.abs(dy))
    mag = jnp.sqrt(jnp.sum(res_trans**2, axis=-1) + 1e-12)
    mean_mag = jnp.mean(mag) + 1e-12
    sparsity = jnp.mean(2.0 * mean_mag * jnp.sqrt(mag / mean_mag + 1.0)) - 2.0 * mean_mag
    return smooth, sparsity


def cycle_consistency(rot_fwd, trans_fwd, rot_bwd, trans_bwd):
    """Forward∘backward motion should be identity (rotation and translation)."""
    Rf = euler_to_matrix(rot_fwd)
    Rb = euler_to_matrix(rot_bwd)
    eye = jnp.eye(3)[None]
    rot_err = jnp.mean((Rf @ Rb - eye) ** 2)
    # t_fwd transformed by backward motion should cancel t_bwd.
    t_err = jnp.mean(jnp.sum((jnp.einsum("bij,bj->bi", Rb, trans_fwd) + trans_bwd) ** 2, -1))
    norm = jnp.mean(jnp.sum(trans_fwd**2, -1) + jnp.sum(trans_bwd**2, -1)) + 1e-6
    return rot_err + t_err / norm


def dmds_loss(
    outputs: Dict[str, jnp.ndarray],
    targets: Dict[str, jnp.ndarray],
    params: DmdsParams,
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """targets: frames (B, H, W, 6) in [0, 1], intrinsics (B, 4)."""
    frames = targets["frames"]
    intr = targets["intrinsics"]
    a, b = frames[..., :3], frames[..., 3:]

    fwd, bwd = outputs["motion_fwd"], outputs["motion_bwd"]
    res_f = fwd.get("residual_translation")
    res_b = bwd.get("residual_translation")

    # Warp b into a's frame using a's depth and forward motion (and vice versa).
    method = getattr(params, "warp_method", "auto")
    wa = warp_frame(b, outputs["depth_a"], fwd["rotation"], fwd["translation"], intr, res_f,
                    method=method)
    wb = warp_frame(a, outputs["depth_b"], bwd["rotation"], bwd["translation"], intr, res_b,
                    method=method)

    l_photo = photometric_loss(a, wa.warped, wa.valid, params.ssim_weight) + photometric_loss(
        b, wb.warped, wb.valid, params.ssim_weight
    )
    l_smooth = edge_aware_smoothness(outputs["depth_a"], a) + edge_aware_smoothness(
        outputs["depth_b"], b
    )
    l_cycle = cycle_consistency(
        fwd["rotation"], fwd["translation"], bwd["rotation"], bwd["translation"]
    )

    l_msmooth = jnp.float32(0.0)
    l_msparse = jnp.float32(0.0)
    if res_f is not None:
        sf, pf = motion_field_regularization(res_f)
        sb, pb = motion_field_regularization(res_b)
        l_msmooth = sf + sb
        l_msparse = pf + pb

    total = (
        params.weight_photometric * l_photo
        + params.weight_smoothness * l_smooth
        + params.weight_motion_smoothness * l_msmooth
        + params.weight_motion_sparsity * l_msparse
        + params.weight_cycle * l_cycle
    )
    return total, {
        "loss": total,
        "loss_photo": l_photo,
        "loss_smooth": l_smooth,
        "loss_cycle": l_cycle,
        "loss_msparse": l_msparse,
        "mean_depth": jnp.mean(outputs["depth_a"]),
    }
