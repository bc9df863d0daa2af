"""Halo-exchange spatial conv vs the unsharded oracle on the 8-device mesh."""

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from cvm_tpu.parallel.mesh import make_mesh
from cvm_tpu.parallel.spatial import spatial_conv3x3


def test_spatial_conv_matches_unsharded(rng):
    mesh = make_mesh(jax.devices(), model_axis=4)
    B, H, W, C, Cout = 2, 32, 16, 8, 8  # H sharded 4 ways → 8-row slabs
    x = jnp.asarray(rng.normal(size=(B, H, W, C)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(3, 3, C, Cout)).astype(np.float32))

    want = lax.conv_general_dilated(
        x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
    )
    got = spatial_conv3x3(x, w, mesh, axis="model")
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-4)


def test_spatial_conv_grad_flows(rng):
    mesh = make_mesh(jax.devices(), model_axis=2)
    x = jnp.asarray(rng.normal(size=(1, 8, 8, 4)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(3, 3, 4, 4)).astype(np.float32))

    def loss(w):
        return jnp.sum(spatial_conv3x3(x, w, mesh, axis="model") ** 2)

    g = jax.grad(loss)(w)
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.abs(g).max()) > 0
