"""Warp/SSIM correctness: identity motion, known translation, intrinsics scaling."""

import jax.numpy as jnp
import numpy as np

from cvm_tpu.ops.image import letterbox_roi
from cvm_tpu.ops.ssim import ssim
from cvm_tpu.ops.warp import euler_to_matrix, scale_intrinsics, warp_frame


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
