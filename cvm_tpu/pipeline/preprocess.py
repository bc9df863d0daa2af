"""Shared device-side batch preprocessing (the fused L3 path).

The reference runs JPEG decode → letterbox → augment → normalize → GT render
per sample in host Python/OpenCV (SURVEY.md §3.1 HOT LOOP). Here the host
only delivers padded raw RGB batches (see cvm_tpu.data.loader); everything
from letterbox onward is one jitted, batch-vmapped device program, so the
whole per-sample path fuses into a handful of XLA kernels.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from cvm_tpu.ops.image import (
    Roi,
    chroma_roi,
    jittered_roi,
    letterbox_roi,
    normalize_pm1,
    photometric_augment,
    sample_bilinear,
    yuv_to_rgb,
)


class AugConfig(NamedTuple):
    scale_range: Tuple[float, float] = (0.6, 1.4)
    shift_frac: float = 0.1
    flip_prob: float = 0.5
    brightness: float = 0.2
    contrast: float = 0.2
    saturation: float = 0.2
    hue: float = 0.05
    noise_std: float = 0.0   # max gaussian noise sigma (fraction of 255)
    blur_prob: float = 0.0   # probability of a 3x3 binomial blur
    rotate_deg: float = 0.0  # max |roll| in degrees (0 = rotation pass off)


def aug_from_params(params, flip_prob=None) -> "AugConfig":
    """Build the shared AugConfig from a model Params object (one place to
    wire a new augmentation field instead of five processors)."""
    return AugConfig(
        params.aug_scale_range,
        params.aug_shift_frac,
        params.aug_flip_prob if flip_prob is None else flip_prob,
        noise_std=getattr(params, "aug_noise_std", 0.0),
        blur_prob=getattr(params, "aug_blur_prob", 0.0),
        rotate_deg=getattr(params, "aug_rotate_deg", 0.0),
    )


def sample_rotation(key, batch_size: int, aug: "AugConfig", train: bool):
    """Per-sample roll angles (radians) for rotation augmentation, or None
    when it is off — processors gate the whole rotate pass on None so the
    default program is unchanged."""
    if not train or aug.rotate_deg <= 0.0 or key is None:
        return None
    r = aug.rotate_deg * jnp.pi / 180.0
    return jax.random.uniform(
        jax.random.fold_in(key, 0x526F74), (batch_size,), jnp.float32, -r, r
    )


def rotate_image_batch(images, angles, pad_value=0.0, method="bilinear"):
    """vmapped ops.image.rotate_image over the batch."""
    from cvm_tpu.ops.image import rotate_image

    return jax.vmap(
        lambda im, a: rotate_image(im, a, pad_value, method)
    )(images, angles)


def make_rois(
    key: Optional[jax.Array],
    image_hw: jnp.ndarray,
    out_hw: Tuple[int, int],
    train: bool,
    aug: AugConfig,
) -> Roi:
    """Batched Roi (leaves have leading B axis). Eval → letterbox fit."""
    B = image_hw.shape[0]
    if train:
        keys = jax.random.split(key, B)
        return jax.vmap(
            lambda k, hw: jittered_roi(
                k, hw[0], hw[1], out_hw[0], out_hw[1],
                aug.scale_range, aug.shift_frac, aug.flip_prob,
            )
        )(keys, image_hw)
    return jax.vmap(lambda hw: letterbox_roi(hw[0], hw[1], out_hw[0], out_hw[1]))(image_hw)


def preprocess_image_batch(
    key: Optional[jax.Array],
    images: jnp.ndarray,
    image_hw: jnp.ndarray,
    out_hw: Tuple[int, int],
    train: bool,
    aug: AugConfig = AugConfig(),
    out_dtype: jnp.dtype = jnp.float32,
) -> Tuple[jnp.ndarray, Roi]:
    """(B, Hmax, Wmax, 3) uint8 + valid sizes → (B, H, W, 3) pm1 float, rois.

    ``out_dtype=bfloat16`` (the serving path) lets XLA fuse the downcast into
    the resample cluster: the model computes in bf16 anyway, and never
    materializing the full-res fp32 image halves the hottest HBM buffer.
    """
    if train:
        key_roi, key_photo = jax.random.split(key)
    else:
        key_roi = key_photo = None
    rois = make_rois(key_roi, image_hw, out_hw, train, aug)

    def one(img, hw, roi):
        return sample_bilinear(img, roi, out_hw, valid_hw=(hw[0], hw[1]), pad_value=0.0)

    out = jax.vmap(one)(images, image_hw, rois)
    if train:
        pkeys = jax.random.split(key_photo, images.shape[0])
        out = jax.vmap(
            lambda k, im: photometric_augment(
                k, im, aug.brightness, aug.contrast, aug.saturation, aug.hue,
                aug.noise_std, aug.blur_prob,
            )
        )(pkeys, out)
    return _materialize(normalize_pm1(out).astype(out_dtype)), rois


def _materialize(proc: jnp.ndarray) -> jnp.ndarray:
    """Force the resampled image to materialize as a buffer.

    Without this, XLA fuses the ROI-resample gathers into the first conv's
    input processing, which measured 3.4 ms SLOWER per batch-8 step on v5e
    than materializing the 12.5 MB bf16 buffer and letting the conv read a
    plain array (benchmarks/profile_e2e.py ablation, round 2).
    """
    return jax.lax.optimization_barrier(proc)


def preprocess_batch(
    key: Optional[jax.Array],
    batch,
    out_hw: Tuple[int, int],
    train: bool,
    aug: AugConfig = AugConfig(),
    out_dtype: jnp.dtype = jnp.float32,
) -> Tuple[jnp.ndarray, Roi]:
    """Dispatch on the loader's wire format: RGB buffers or YUV420 planes.

    Lets every training processor consume either ``{"image", "image_hw"}``
    or ``{"y", "u", "v", "image_hw"}`` batches (RecordLoader
    output_format="yuv420" halves host→device bandwidth for training too).
    """
    if "y" in batch:
        return preprocess_yuv420_batch(
            key, batch["y"], batch["u"], batch["v"], batch["image_hw"],
            out_hw, train, aug, out_dtype,
        )
    return preprocess_image_batch(
        key, batch["image"], batch["image_hw"], out_hw, train, aug, out_dtype
    )


def resample_yuv420_frame(yp, up, vp, hw, roi, out_hw):
    """One 4:2:0 frame → (H, W, 3) RGB floats in 0..255 through ``roi``.

    Luma resamples through the ROI directly; chroma through the half-space
    ROI (no intermediate full-res YUV is materialized). Shared by the batch
    preprocess and the DMDS two-frame processor.
    """
    h, w = hw[0], hw[1]
    croi = chroma_roi(roi)
    yr = sample_bilinear(yp[..., None], roi, out_hw, valid_hw=(h, w), pad_value=0.0)
    ch = (h + 1) // 2
    cw = (w + 1) // 2
    ur = sample_bilinear(up[..., None], croi, out_hw, valid_hw=(ch, cw), pad_value=128.0)
    vr = sample_bilinear(vp[..., None], croi, out_hw, valid_hw=(ch, cw), pad_value=128.0)
    return yuv_to_rgb(yr[..., 0], ur[..., 0], vr[..., 0])


def preprocess_yuv420_batch(
    key: Optional[jax.Array],
    y: jnp.ndarray,
    u: jnp.ndarray,
    v: jnp.ndarray,
    image_hw: jnp.ndarray,
    out_hw: Tuple[int, int],
    train: bool,
    aug: AugConfig = AugConfig(),
    out_dtype: jnp.dtype = jnp.float32,
) -> Tuple[jnp.ndarray, Roi]:
    """Planar YUV420 batch → (B, H, W, 3) pm1 float, rois.

    Bandwidth-optimal input path: the host ships the JPEG's native 4:2:0
    planes (1.5 B/px, half of RGB) and this op fuses chroma resampling,
    YCbCr→RGB conversion, letterbox/augment geometry, photometric jitter and
    normalization into the jitted program. Luma and chroma are resampled
    straight to output resolution through the same ROI (chroma via the
    half-space ROI), so no intermediate full-res YUV is ever materialized.
    """
    if train:
        key_roi, key_photo = jax.random.split(key)
    else:
        key_roi = key_photo = None
    rois = make_rois(key_roi, image_hw, out_hw, train, aug)

    out = jax.vmap(
        lambda yp, up, vp, hw, roi: resample_yuv420_frame(yp, up, vp, hw, roi, out_hw)
    )(y, u, v, image_hw, rois)
    if train:
        pkeys = jax.random.split(key_photo, y.shape[0])
        out = jax.vmap(
            lambda k, im: photometric_augment(
                k, im, aug.brightness, aug.contrast, aug.saturation, aug.hue,
                aug.noise_std, aug.blur_prob,
            )
        )(pkeys, out)
    return _materialize(normalize_pm1(out).astype(out_dtype)), rois
