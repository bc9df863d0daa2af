"""Differentiable projective warping for depth-from-motion (SURVEY.md §3.4).

Pure-JAX rebuild of the DMDS warp path: back-project pixels with predicted
depth and camera intrinsics, rigidly transform by predicted ego-motion plus an
optional per-pixel residual translation field, re-project, and bilinearly
sample the other frame. Everything is dense VPU work with static shapes —
this is where JAX is *easier* than the reference's TF (SURVEY.md §7 PR5).

Intrinsics travel as (fx, fy, cx, cy) vectors and MUST be rescaled with the
same ROI math as the image (SURVEY.md §7 "Hard parts" #5) — see
``scale_intrinsics``.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp


class WarpResult(NamedTuple):
    warped: jnp.ndarray      # (B, H, W, C) frame sampled at projected coords
    valid: jnp.ndarray       # (B, H, W, 1) 1.0 where projection lands in-frame
    warped_depth: jnp.ndarray  # (B, H, W, 1) z-depth of transformed points
    coords: jnp.ndarray      # (B, H, W, 2) projected (x, y) pixel coords


def euler_to_matrix(angles: jnp.ndarray) -> jnp.ndarray:
    """(..., 3) small euler angles (rx, ry, rz) → (..., 3, 3) rotation matrix."""
    rx, ry, rz = angles[..., 0], angles[..., 1], angles[..., 2]
    cx, sx = jnp.cos(rx), jnp.sin(rx)
    cy, sy = jnp.cos(ry), jnp.sin(ry)
    cz, sz = jnp.cos(rz), jnp.sin(rz)
    o = jnp.ones_like(rx)
    z = jnp.zeros_like(rx)
    Rx = jnp.stack(
        [jnp.stack([o, z, z], -1), jnp.stack([z, cx, -sx], -1), jnp.stack([z, sx, cx], -1)], -2
    )
    Ry = jnp.stack(
        [jnp.stack([cy, z, sy], -1), jnp.stack([z, o, z], -1), jnp.stack([-sy, z, cy], -1)], -2
    )
    Rz = jnp.stack(
        [jnp.stack([cz, -sz, z], -1), jnp.stack([sz, cz, z], -1), jnp.stack([z, z, o], -1)], -2
    )
    return Rz @ Ry @ Rx


def scale_intrinsics(intrinsics: jnp.ndarray, roi) -> jnp.ndarray:
    """Map (..., 4) [fx, fy, cx, cy] through a resampling Roi.

    x' = (x - src_x0) * sx + dst_x0  ⇒  fx' = fx*sx, cx' = (cx - src_x0)*sx + dst_x0.
    (Flip is not supported here — DMDS disables horizontal flip because it
    would mirror the motion field.)
    """
    fx, fy, cx, cy = (intrinsics[..., i] for i in range(4))
    sx = roi.scale_x
    sy = roi.scale_y
    return jnp.stack(
        [
            fx * sx,
            fy * sy,
            (cx - roi.src_x0) * sx + roi.dst_x0,
            (cy - roi.src_y0) * sy + roi.dst_y0,
        ],
        axis=-1,
    )


def bilinear_sample_mxu(
    image: jnp.ndarray,
    coords: jnp.ndarray,
    compute_dtype=jnp.bfloat16,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Exact bilinear sampling as two dense MXU contractions (TPU-native).

    Per-element gathers lower pathologically on the TPU backend: XLA's cost
    analysis charges the 4-tap gather warp ~260 GB of HBM traffic per batch
    (~0.2 GB of useful work) and its backward scatter ~780 GB — measured on
    v5e, making the DMDS warp loss ~100x slower than its roofline. Instead,
    materialize the separable per-pixel bilinear hat weights and contract:

        out[p, c] = sum_h wv[p, h] * (sum_w wh[p, w] * img[h, w, c])

    Each weight row has at most 2 nonzeros, so this is numerically the exact
    bilinear sample (up to compute_dtype rounding of the 2-term sums), but it
    is dense, regular matmul work the MXU executes at speed — the same
    design move as the Pallas GT splat (irregular scatter/gather -> dense
    on-chip compute). FLOPs are P*(W+H)*C*2 per image; the backward pass is
    the transposed matmuls (dense, no scatter).

    Returns (samples (..., C) float32, in_bounds (..., 1) float32), matching
    ``bilinear_sample`` semantics (border-replicate clamp, OOB flagged).
    """
    H, W, C = image.shape
    lead = coords.shape[:-1]
    x = coords[..., 0].reshape(-1)
    y = coords[..., 1].reshape(-1)
    P = x.shape[0]
    inb = (x >= 0) & (x <= W - 1) & (y >= 0) & (y <= H - 1)
    xc = jnp.clip(x, 0.0, W - 1.0)
    yc = jnp.clip(y, 0.0, H - 1.0)

    # Hat (tent) weights: exactly the two bilinear taps per row are nonzero.
    wh = jnp.maximum(0.0, 1.0 - jnp.abs(xc[:, None] - jnp.arange(W, dtype=jnp.float32)))
    wv = jnp.maximum(0.0, 1.0 - jnp.abs(yc[:, None] - jnp.arange(H, dtype=jnp.float32)))
    wh = wh.astype(compute_dtype)
    wv = wv.astype(compute_dtype)

    outs = []
    for k in range(C):  # keep the (P, H) intermediate's minor dim MXU-tiled
        a_k = jax.lax.dot(
            wh, image[..., k].T.astype(compute_dtype),
            preferred_element_type=jnp.float32,
        )  # (P, H)
        outs.append(jnp.sum(wv.astype(jnp.float32) * a_k, axis=1))
    out = jnp.stack(outs, axis=-1)
    return (
        out.reshape(*lead, C),
        inb.reshape(*lead, 1).astype(jnp.float32),
    )


def bilinear_sample(image: jnp.ndarray, coords: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Sample (H, W, C) image at (..., 2) float (x, y) coords.

    Returns (samples (..., C), in_bounds (..., 1)). Out-of-frame samples are
    clamped (border replicate) and flagged invalid.

    This is the 4-tap gather formulation — the portable oracle. On TPU
    backends prefer ``bilinear_sample_mxu`` (see its docstring for why);
    ``warp_frame(method="auto")`` picks per backend.
    """
    H, W = image.shape[0], image.shape[1]
    x, y = coords[..., 0], coords[..., 1]
    inb = (x >= 0) & (x <= W - 1) & (y >= 0) & (y <= H - 1)

    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = x - x0
    fy = y - y0
    x0i = jnp.clip(x0.astype(jnp.int32), 0, W - 1)
    x1i = jnp.clip(x0.astype(jnp.int32) + 1, 0, W - 1)
    y0i = jnp.clip(y0.astype(jnp.int32), 0, H - 1)
    y1i = jnp.clip(y0.astype(jnp.int32) + 1, 0, H - 1)

    flat = image.reshape(H * W, -1)
    g = lambda yi, xi: flat[(yi * W + xi).reshape(-1)].reshape(*x.shape, -1)
    tl, tr = g(y0i, x0i), g(y0i, x1i)
    bl, br = g(y1i, x0i), g(y1i, x1i)
    fx = fx[..., None]
    fy = fy[..., None]
    top = tl + (tr - tl) * fx
    bot = bl + (br - bl) * fx
    out = top + (bot - top) * fy
    return out, inb[..., None].astype(jnp.float32)


def warp_frame(
    source: jnp.ndarray,
    depth: jnp.ndarray,
    rotation: jnp.ndarray,
    translation: jnp.ndarray,
    intrinsics: jnp.ndarray,
    residual_translation: jnp.ndarray | None = None,
    method: str = "auto",
) -> WarpResult:
    """Warp ``source`` (frame t+1) into frame t's geometry.

    source      : (B, H, W, C) the frame to sample from.
    depth       : (B, H, W, 1) depth of frame t.
    rotation    : (B, 3) euler angles; translation (B, 3) camera motion t→t+1.
    intrinsics  : (B, 4) [fx, fy, cx, cy] in resized-frame pixels.
    residual_translation : optional (B, H, W, 3) per-pixel object motion.
    method      : "gather" (4-tap gather oracle, fast on CPU), "mxu" (dense
                  MXU contraction, fast on TPU — see bilinear_sample_mxu),
                  or "auto" (per-backend default).
    """
    B, H, W, _ = depth.shape
    fx, fy, cx, cy = (intrinsics[:, i].reshape(B, 1, 1) for i in range(4))

    xs = jnp.arange(W, dtype=jnp.float32)[None, None, :]
    ys = jnp.arange(H, dtype=jnp.float32)[None, :, None]
    d = depth[..., 0]
    X = (xs - cx) / fx * d
    Y = (ys - cy) / fy * d
    P = jnp.stack([X, Y, d], axis=-1)  # (B, H, W, 3)

    R = euler_to_matrix(rotation)  # (B, 3, 3)
    Pt = jnp.einsum("bij,bhwj->bhwi", R, P) + translation[:, None, None, :]
    if residual_translation is not None:
        Pt = Pt + residual_translation

    z = jnp.maximum(Pt[..., 2], 1e-3)
    u = Pt[..., 0] / z * fx + cx
    v = Pt[..., 1] / z * fy + cy
    coords = jnp.stack([u, v], axis=-1)

    if method == "auto":
        method = "gather" if jax.default_backend() == "cpu" else "mxu"
    sample = bilinear_sample_mxu if method == "mxu" else bilinear_sample
    warped, inb = jax.vmap(sample)(source, coords)
    front = (Pt[..., 2:3] > 1e-3).astype(jnp.float32)
    return WarpResult(warped, inb * front, z[..., None], coords)
