"""Pallas kernels vs their XLA/NumPy oracles (interpret mode on CPU CI)."""

import jax.numpy as jnp
import numpy as np
import pytest

from cvm_tpu.ops.heatmap import render_centernet_targets_batch
from cvm_tpu.ops.pallas.gaussian_splat import render_heatmap_pallas


def test_pallas_splat_matches_xla_renderer(rng):
    B, K, C, Hs, Ws = 2, 12, 4, 32, 48
    boxes = np.zeros((B, K, 4), np.float32)
    classes = rng.integers(0, C, (B, K)).astype(np.int32)
    valid = np.zeros((B, K), bool)
    for b in range(B):
        for k in range(8):
            x0 = rng.uniform(-4, Ws - 4)
            y0 = rng.uniform(-4, Hs - 4)
            boxes[b, k] = [x0, y0, x0 + rng.uniform(2, 18), y0 + rng.uniform(2, 14)]
            valid[b, k] = True

    want = render_centernet_targets_batch(
        jnp.asarray(boxes), jnp.asarray(classes), jnp.asarray(valid), (Hs, Ws), C
    ).heatmap
    got = render_heatmap_pallas(
        jnp.asarray(boxes), jnp.asarray(classes), jnp.asarray(valid), (Hs, Ws), C,
        interpret=True,
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


def test_pallas_splat_empty(rng):
    out = render_heatmap_pallas(
        jnp.zeros((1, 4, 4)), jnp.zeros((1, 4), jnp.int32), jnp.zeros((1, 4), bool),
        (16, 16), 3, interpret=True,
    )
    assert float(jnp.sum(out)) == 0.0
