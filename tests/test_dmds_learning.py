"""DMDS validation: the warp + photometric loss machinery can recover a
known camera motion when depth is held at ground truth.

This pins the geometry end of the unsupervised pipeline (monocular scale
ambiguity makes full unsupervised convergence untestable in CI): with a
textured plane at depth Z and a pure lateral camera translation t, gradient
descent on the photometric loss over (rotation, translation) must drive the
estimate toward t. SURVEY.md §3.4.
"""

import jax
import jax.numpy as jnp
import numpy as np

from cvm_tpu.models.dmds.loss import photometric_loss
from cvm_tpu.ops.warp import warp_frame


def _textured(rng, H, W):
    """Smooth random texture (bilinear-upsampled noise) → usable gradients."""
    from PIL import Image

    base = (rng.uniform(0, 255, (H // 4, W // 4, 3))).astype(np.uint8)
    img = Image.fromarray(base).resize((W, H), Image.BILINEAR)
    return np.asarray(img, np.float32) / 255.0


def test_pose_recovery_with_known_depth(rng):
    H, W, Z, fx = 32, 64, 10.0, 32.0
    shift = 4  # pixels; t_x = shift * Z / fx
    t_true = jnp.asarray([[shift * Z / fx, 0.0, 0.0]])
    # Two crops of one larger textured plane = exact lateral camera motion
    # with no border-invalid strip: b(u) = a(u - shift).
    big = _textured(rng, H, W + 2 * shift)
    img_a = jnp.asarray(big[:, shift : shift + W])[None]
    img_b = jnp.asarray(big[:, 0:W])[None]
    depth = jnp.full((1, H, W, 1), Z)
    intr = jnp.asarray([[fx, fx, W / 2.0, H / 2.0]])

    def loss_fn(t):
        w = warp_frame(img_b, depth, jnp.zeros((1, 3)), t, intr)
        return photometric_loss(img_a, w.warped, w.valid, alpha=0.5)

    import optax

    opt = optax.adam(0.05)
    t = jnp.zeros((1, 3))
    st = opt.init(t)
    g = jax.jit(jax.value_and_grad(loss_fn))
    first = None
    for _ in range(300):
        l, grad = g(t)
        first = float(l) if first is None else first
        up, st = opt.update(grad, st)
        t = optax.apply_updates(t, up)
    err = float(jnp.abs(t - t_true).max())
    assert float(l) < first * 0.05, f"photometric loss did not drop: {first} -> {float(l)}"
    assert err < 0.1, f"recovered translation {np.asarray(t)} vs {np.asarray(t_true)}"
