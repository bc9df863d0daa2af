"""CenterNet 3D extension: targets, forward, loss, decode-with-extras."""

import jax
import jax.numpy as jnp
import numpy as np

from cvm_tpu.data.synthetic import synthetic_batch
from cvm_tpu.models import get_model
from cvm_tpu.ops.decode import decode_centernet_with_extras
from cvm_tpu.ops.heatmap import render_centernet_targets
import pytest


def _cfg3d():
    spec = get_model("centernet")
    return spec, spec.params_cls(
        input_hw=(64, 64), num_classes=3, max_objects=6, backbone="tiny",
        neck_features=32, head_features=16, with_3d=True,
        warmup_steps=2, total_steps=100, use_pallas_splat=False,
    )


def test_extras_rendering():
    K = 4
    boxes = jnp.asarray([[2.0, 2.0, 10.0, 10.0]] + [[0.0] * 4] * (K - 1))
    classes = jnp.zeros(K, jnp.int32)
    valid = jnp.asarray([True] + [False] * (K - 1))
    extras = {"depth3d": jnp.full((K, 1), 12.5), "rot": jnp.ones((K, 2))}
    t = render_centernet_targets(boxes, classes, valid, (16, 16), 2, extra_values=extras)
    assert t.extras["depth3d"].shape == (16, 16, 1)
    assert float(t.extras["depth3d"][6, 6, 0]) == 12.5  # at the center pixel
    assert float(t.extras["depth3d"].sum()) == 12.5  # only at the center
    assert float(t.extras["rot"][6, 6, 0]) == 1.0


@pytest.mark.slow
def test_3d_forward_and_loss_and_train_step():
    spec, p = _cfg3d()
    model = spec.create_model(p)
    x = jnp.zeros((2, 64, 64, 3))
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    out = model.apply(variables, x, train=False)
    assert out["depth3d"].shape == (2, 16, 16, 1)
    assert out["dims3d"].shape == (2, 16, 16, 3)
    assert out["rot"].shape == (2, 16, 16, 2)

    proc = spec.make_processor(p, train=True)
    rng = np.random.default_rng(0)
    batch = synthetic_batch(rng, 2, (96, 96), num_classes=3, max_objects=6, with_3d=True)
    inputs, targets = jax.jit(lambda k, b: proc(k, b))(jax.random.PRNGKey(0), batch)
    assert "depth3d" in targets.extras

    loss, metrics = spec.loss_fn(out, targets, p)
    assert np.isfinite(float(loss))
    assert "loss_dep3d" in metrics and "loss_rot" in metrics


def test_rotation_augment_rejected_for_3d():
    # Roll augmentation breaks the unrolled-camera assumption behind
    # monocular yaw + back-projection; the processor must fail loudly.
    spec, p = _cfg3d()
    p = p.replace(aug_rotate_deg=5.0)
    with pytest.raises(ValueError, match="aug_rotate_deg"):
        spec.make_processor(p, train=True)


def test_decode_with_extras_gathers_at_peaks():
    Hs = Ws = 16
    hm = jnp.zeros((1, Hs, Ws, 1)).at[0, 5, 7, 0].set(1.0)
    off = jnp.zeros((1, Hs, Ws, 2))
    sz = jnp.ones((1, Hs, Ws, 2)) * 2
    dep = jnp.zeros((1, Hs, Ws, 1)).at[0, 5, 7, 0].set(33.0)
    det, extras = decode_centernet_with_extras(
        hm, off, sz, stride=4, extras={"depth3d": dep}, top_k=3, from_logits=False
    )
    assert float(det.scores[0, 0]) == 1.0
    assert float(extras["depth3d"][0, 0, 0]) == 33.0
