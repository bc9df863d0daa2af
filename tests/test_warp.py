"""Warp/SSIM correctness: identity motion, known translation, intrinsics scaling."""

import jax
import jax.numpy as jnp
import numpy as np

from cvm_tpu.ops.image import letterbox_roi
from cvm_tpu.ops.ssim import ssim
from cvm_tpu.ops.warp import (
    bilinear_sample,
    bilinear_sample_mxu,
    euler_to_matrix,
    scale_intrinsics,
    warp_frame,
)


def test_euler_identity_and_composition():
    R = euler_to_matrix(jnp.zeros((1, 3)))
    np.testing.assert_allclose(np.asarray(R[0]), np.eye(3), atol=1e-6)
    Rz = euler_to_matrix(jnp.asarray([[0.0, 0.0, np.pi / 2]]))
    np.testing.assert_allclose(
        np.asarray(Rz[0]) @ np.array([1.0, 0, 0]), [0, 1, 0], atol=1e-6
    )


def test_warp_identity_motion_reproduces_frame(rng):
    img = jnp.asarray(rng.uniform(0, 1, (1, 32, 48, 3)).astype(np.float32))
    depth = jnp.full((1, 32, 48, 1), 10.0)
    intr = jnp.asarray([[40.0, 40.0, 24.0, 16.0]])
    res = warp_frame(img, depth, jnp.zeros((1, 3)), jnp.zeros((1, 3)), intr)
    np.testing.assert_allclose(np.asarray(res.warped), np.asarray(img), atol=1e-4)
    assert float(res.valid.mean()) == 1.0


def test_warp_known_lateral_translation(rng):
    """Camera translating +X by d at depth Z shifts pixels by -fx*d/Z."""
    img = jnp.asarray(rng.uniform(0, 1, (1, 16, 64, 1)).astype(np.float32))
    Z, fx, d = 10.0, 32.0, 2.5
    depth = jnp.full((1, 16, 64, 1), Z)
    intr = jnp.asarray([[fx, fx, 32.0, 8.0]])
    res = warp_frame(img, depth, jnp.zeros((1, 3)), jnp.asarray([[d, 0.0, 0.0]]), intr)
    shift = fx * d / Z  # = 8 px
    got = np.asarray(res.warped[0, :, : 64 - int(shift), 0])
    want = np.asarray(img[0, :, int(shift) :, 0])
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_mxu_sampler_matches_gather_oracle(rng):
    """The dense-contraction sampler is the gather sampler, exactly (fp32)."""
    H, W, C = 24, 40, 3
    img = jnp.asarray(rng.uniform(0, 1, (H, W, C)).astype(np.float32))
    # Mix of interior, fractional, integer, and out-of-frame coordinates.
    coords = jnp.asarray(
        rng.uniform(-5, np.array([W + 4, H + 4]), (17, 9, 2)).astype(np.float32)
    )
    out_g, inb_g = bilinear_sample(img, coords)
    out_m, inb_m = bilinear_sample_mxu(img, coords, compute_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(out_m), np.asarray(out_g), atol=1e-5)
    np.testing.assert_array_equal(np.asarray(inb_m), np.asarray(inb_g))
    # bf16 compute stays within its rounding of the oracle.
    out_b, _ = bilinear_sample_mxu(img, coords, compute_dtype=jnp.bfloat16)
    np.testing.assert_allclose(np.asarray(out_b), np.asarray(out_g), atol=2e-2)


def test_mxu_sampler_gradients_match_gather(rng):
    """Backward through the dense sampler = backward through the gather
    (image grads are the scatter-add transpose; coord grads the hat slope)."""
    H, W, C = 12, 16, 2
    img = jnp.asarray(rng.uniform(0, 1, (H, W, C)).astype(np.float32))
    coords = jnp.asarray(
        (rng.uniform(0.3, 0.7, (5, 7, 2)) * np.array([W, H])).astype(np.float32)
    )

    def loss(sampler, im, co):
        out, _ = sampler(im, co)
        return jnp.sum(out * jnp.cos(jnp.arange(out.size).reshape(out.shape)))

    g_img_g, g_co_g = jax.grad(lambda im, co: loss(bilinear_sample, im, co),
                               argnums=(0, 1))(img, coords)
    g_img_m, g_co_m = jax.grad(
        lambda im, co: loss(
            lambda i, c: bilinear_sample_mxu(i, c, compute_dtype=jnp.float32), im, co
        ),
        argnums=(0, 1),
    )(img, coords)
    np.testing.assert_allclose(np.asarray(g_img_m), np.asarray(g_img_g), atol=1e-4)
    np.testing.assert_allclose(np.asarray(g_co_m), np.asarray(g_co_g), atol=1e-3)


def test_warp_frame_mxu_method_matches_gather(rng):
    img = jnp.asarray(rng.uniform(0, 1, (2, 16, 24, 3)).astype(np.float32))
    depth = jnp.asarray(rng.uniform(5, 20, (2, 16, 24, 1)).astype(np.float32))
    intr = jnp.tile(jnp.asarray([[20.0, 20.0, 12.0, 8.0]]), (2, 1))
    rot = jnp.asarray([[0.01, -0.02, 0.005], [0.0, 0.01, 0.0]])
    tr = jnp.asarray([[0.3, -0.1, 0.5], [-0.2, 0.0, 0.1]])
    a = warp_frame(img, depth, rot, tr, intr, method="gather")
    b = warp_frame(img, depth, rot, tr, intr, method="mxu")
    np.testing.assert_allclose(np.asarray(b.warped), np.asarray(a.warped), atol=2e-2)
    np.testing.assert_array_equal(np.asarray(b.valid), np.asarray(a.valid))
    np.testing.assert_allclose(np.asarray(b.coords), np.asarray(a.coords), atol=1e-5)


def test_scale_intrinsics_through_letterbox():
    roi = letterbox_roi(100, 200, 64, 64)  # scale 0.32, dst_y0 16
    intr = jnp.asarray([100.0, 90.0, 100.0, 50.0])
    out = np.asarray(scale_intrinsics(intr, roi))
    np.testing.assert_allclose(out, [32.0, 28.8, 32.0, 32.0], atol=1e-5)


def test_ssim_identical_and_different(rng):
    a = jnp.asarray(rng.uniform(0, 1, (1, 16, 16, 3)).astype(np.float32))
    same = ssim(a, a)
    assert float(same.max()) < 1e-5
    b = jnp.asarray(rng.uniform(0, 1, (1, 16, 16, 3)).astype(np.float32))
    assert float(ssim(a, b).mean()) > 0.1
