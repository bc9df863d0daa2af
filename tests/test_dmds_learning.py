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


def test_synthetic_two_frame_motion_is_depth_consistent():
    """The two-frame generator must emit motion the DMDS objective can
    invert: warping frame t+1 back with the GT ego-motion (``ego_t``) and
    the GT depth through the model's own warp operator has to beat (a) no
    motion, (b) the wrong-sign motion, and (c) the right motion on a wrong
    (vertically flipped) depth map. (c) is the depth-learnability property:
    the photometric objective prefers the true depth field, so unsupervised
    training carries signal about GT depth — the earlier uniform np.roll
    motion failed exactly this (any depth explained it; measured
    delta1 ~0.2 noise, 2026-08-19). Margins below are ~half the measured
    ones (zero/gt >= 1.46, wrong/gt >= 3.7, flip/gt >= 1.27 at seed 7)."""
    from cvm_tpu.data.synthetic import synthetic_batch

    rng_np = np.random.default_rng(7)
    b = synthetic_batch(rng_np, 4, (64, 64), vary_sizes=False, two_frame=True)
    img = jnp.asarray(b["image"], jnp.float32) / 255.0
    img2 = jnp.asarray(b["image_t1"], jnp.float32) / 255.0
    depth = jnp.asarray(b["depth"])[..., None]
    intr = jnp.asarray(b["intrinsics"])
    m = 6  # border crop: clipped sampling at the canvas edge is off-model

    def mse(dep, t):
        w = warp_frame(img2, dep, jnp.zeros((4, 3)), t, intr, method="gather")
        d = (w.warped - img) ** 2
        return np.asarray(d[:, m:-m, m:-m].mean(axis=(1, 2, 3)))

    t_gt = jnp.concatenate(
        [-jnp.asarray(b["ego_t"]), jnp.zeros((4, 1))], axis=-1)
    gt = mse(depth, t_gt)
    zero = mse(depth, jnp.zeros((4, 3)))
    wrong_sign = mse(depth, -t_gt)
    flipped = mse(depth[:, ::-1], t_gt)
    assert (zero > 1.2 * gt).all(), (zero, gt)
    assert (wrong_sign > 2.0 * gt).all(), (wrong_sign, gt)
    assert (flipped > 1.1 * gt).all(), (flipped, gt)
