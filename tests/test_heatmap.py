"""CenterNet GT renderer vs a straightforward NumPy oracle (SURVEY.md §4.1)."""

import jax.numpy as jnp
import numpy as np

from cvm_tpu.ops.heatmap import (
    gaussian_radius,
    render_centernet_targets,
    render_centernet_targets_batch,
)


def oracle_radius(h, w, min_overlap=0.7):
    a1, b1 = 1.0, h + w
    c1 = w * h * (1 - min_overlap) / (1 + min_overlap)
    r1 = (b1 + np.sqrt(max(b1**2 - 4 * a1 * c1, 0))) / 2
    a2, b2, c2 = 4.0, 2 * (h + w), (1 - min_overlap) * w * h
    r2 = (b2 + np.sqrt(max(b2**2 - 4 * a2 * c2, 0))) / (2 * a2)
    a3, b3, c3 = 4 * min_overlap, -2 * min_overlap * (h + w), (min_overlap - 1) * w * h
    r3 = (b3 + np.sqrt(max(b3**2 - 4 * a3 * c3, 0))) / (2 * a3)
    return min(r1, r2, r3)


def oracle_render(boxes, classes, valid, hw, num_classes, min_overlap=0.7):
    Hs, Ws = hw
    hm = np.zeros((Hs, Ws, num_classes), np.float32)
    off = np.zeros((Hs, Ws, 2), np.float32)
    size = np.zeros((Hs, Ws, 2), np.float32)
    mask = np.zeros((Hs, Ws), np.float32)
    for (x0, y0, x1, y1), c, v in zip(boxes, classes, valid):
        if not v:
            continue
        cx, cy = (x0 + x1) / 2, (y0 + y1) / 2
        w, h = x1 - x0, y1 - y0
        if not (0 <= cx < Ws and 0 <= cy < Hs and w > 0 and h > 0):
            continue
        ix, iy = int(np.floor(cx)), int(np.floor(cy))
        r = max(np.floor(oracle_radius(h, w, min_overlap)), 0.0)
        sigma = (2 * r + 1) / 6.0
        ri = int(r)
        for y in range(max(0, iy - ri), min(Hs, iy + ri + 1)):
            for x in range(max(0, ix - ri), min(Ws, ix + ri + 1)):
                g = np.exp(-((x - ix) ** 2 + (y - iy) ** 2) / (2 * sigma**2 + 1e-12))
                hm[y, x, c] = max(hm[y, x, c], g)
        off[iy, ix] = [cx - ix, cy - iy]
        size[iy, ix] = [w, h]
        mask[iy, ix] = 1.0
    return hm, off, size, mask


def test_radius_matches_oracle():
    for h, w in [(10, 10), (3, 40), (100, 7), (1, 1)]:
        got = float(gaussian_radius(h, w))
        assert got == np.float32(oracle_radius(h, w)) or abs(got - oracle_radius(h, w)) < 1e-3


def test_render_matches_oracle(rng):
    Hs, Ws, C, K = 48, 64, 5, 8
    boxes = np.zeros((K, 4), np.float32)
    classes = rng.integers(0, C, K).astype(np.int32)
    valid = np.zeros(K, bool)
    for k in range(5):
        x0 = rng.uniform(0, Ws - 10)
        y0 = rng.uniform(0, Hs - 10)
        boxes[k] = [x0, y0, x0 + rng.uniform(2, 20), y0 + rng.uniform(2, 20)]
        valid[k] = True
    # one out-of-bounds and one degenerate box, flagged valid → must be ignored
    boxes[5] = [-50, -50, -40, -40]
    valid[5] = True
    boxes[6] = [10, 10, 10, 10]
    valid[6] = True

    t = render_centernet_targets(
        jnp.asarray(boxes), jnp.asarray(classes), jnp.asarray(valid), (Hs, Ws), C
    )
    hm, off, size, mask = oracle_render(boxes, classes, valid, (Hs, Ws), C)

    np.testing.assert_allclose(np.asarray(t.heatmap), hm, atol=1e-5)
    np.testing.assert_allclose(np.asarray(t.offset), off, atol=1e-5)
    np.testing.assert_allclose(np.asarray(t.size), size, atol=1e-4)
    np.testing.assert_allclose(np.asarray(t.mask), mask, atol=0)


def test_render_empty_image():
    t = render_centernet_targets(
        jnp.zeros((4, 4)), jnp.zeros(4, jnp.int32), jnp.zeros(4, bool), (16, 16), 3
    )
    assert float(jnp.sum(t.heatmap)) == 0.0
    assert float(jnp.sum(t.mask)) == 0.0


def test_render_batch_shapes(rng):
    B, K, C = 2, 6, 4
    boxes = jnp.asarray(rng.uniform(0, 30, (B, K, 4)).astype(np.float32))
    boxes = boxes.at[..., 2:].add(5.0)
    t = render_centernet_targets_batch(
        boxes, jnp.zeros((B, K), jnp.int32), jnp.ones((B, K), bool), (32, 32), C
    )
    assert t.heatmap.shape == (B, 32, 32, C)
    assert t.offset.shape == (B, 32, 32, 2)
    assert float(t.heatmap.max()) <= 1.0 + 1e-6
