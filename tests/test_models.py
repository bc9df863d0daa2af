"""Model zoo forward-pass shape/dtype tests (tiny configs for 1-core CI)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cvm_tpu.models import get_model


def _init_and_apply(spec, p, inputs):
    model = spec.create_model(p)
    variables = model.init(jax.random.PRNGKey(0), inputs, train=False)
    out = model.apply(variables, inputs, train=False)
    return model, variables, out


def test_centernet_forward():
    spec = get_model("centernet")
    p = spec.params_cls(input_hw=(64, 64), num_classes=4, backbone="tiny", neck_features=32, head_features=16)
    x = jnp.zeros((2, 64, 64, 3))
    _, variables, out = _init_and_apply(spec, p, x)
    assert out["heatmap"].shape == (2, 16, 16, 4)
    assert out["offset"].shape == (2, 16, 16, 2)
    assert out["size"].shape == (2, 16, 16, 2)
    assert out["heatmap"].dtype == jnp.float32
    # focal prior: initial sigmoid(heatmap) ~ 0.1
    pr = float(jax.nn.sigmoid(out["heatmap"]).mean())
    assert 0.05 < pr < 0.2
    assert "batch_stats" in variables


def test_flat_stem_flag():
    """space_to_depth_stem=False swaps the stem for a plain stride-2 RGB
    conv (the DESIGN §9 ablation lever): different stem param shape, same
    output geometry."""
    spec = get_model("centernet")
    kw = dict(input_hw=(64, 64), num_classes=4, backbone="tiny",
              neck_features=32, head_features=16)
    x = jnp.zeros((2, 64, 64, 3))
    _, v_s2d, out_s2d = _init_and_apply(
        spec, spec.params_cls(**kw), x)
    _, v_flat, out_flat = _init_and_apply(
        spec, spec.params_cls(**kw, space_to_depth_stem=False), x)
    k_s2d = v_s2d["params"]["Backbone_0"]["stem"]["conv"]["kernel"]
    k_flat = v_flat["params"]["Backbone_0"]["stem"]["conv"]["kernel"]
    assert k_s2d.shape[2] == 12 and k_flat.shape[2] == 3
    assert out_flat["heatmap"].shape == out_s2d["heatmap"].shape


def test_indivisible_input_hw_fails_fast():
    """48x48 halves to odd intermediates and used to die with an opaque
    concatenate error deep in the neck — every zoo entry now validates at
    create_model time."""
    for name in ("centernet", "semseg", "depth", "multitask", "dmds"):
        spec = get_model(name)
        with pytest.raises(ValueError, match="multiples of 32"):
            spec.create_model(spec.params_cls(input_hw=(48, 48)))


def test_semseg_forward():
    spec = get_model("semseg")
    p = spec.params_cls(input_hw=(64, 128), backbone="tiny", decoder_features=16)
    x = jnp.zeros((2, 64, 128, 3))
    _, _, out = _init_and_apply(spec, p, x)
    assert out["logits"].shape == (2, 64, 128, p.num_classes)
    assert out["logits"].dtype == jnp.float32


@pytest.mark.slow
def test_depth_forward():
    spec = get_model("depth")
    p = spec.params_cls(input_hw=(64, 128), backbone="tiny", decoder_features=16, num_scales=2)
    x = jnp.zeros((1, 64, 128, 3))
    _, _, out = _init_and_apply(spec, p, x)
    assert out["depth"].shape == (1, 64, 128, 1)
    assert len(out["depth_scales"]) == 2
    d = np.asarray(out["depth"])
    assert (d >= p.min_depth - 1e-3).all() and (d <= p.max_depth + 1e-3).all()


def test_multitask_forward():
    spec = get_model("multitask")
    p = spec.params_cls(
        input_hw=(64, 128), backbone="tiny", neck_features=32, head_features=16,
        num_det_classes=3,
    )
    x = jnp.zeros((1, 64, 128, 3))
    _, _, out = _init_and_apply(spec, p, x)
    assert out["heatmap"].shape == (1, 16, 32, 3)
    assert out["logits"].shape == (1, 64, 128, p.num_seg_classes)
    assert out["depth"].shape == (1, 64, 128, 1)


@pytest.mark.slow
def test_dmds_forward():
    spec = get_model("dmds")
    p = spec.params_cls(input_hw=(64, 128), backbone="tiny", decoder_features=16, motion_features=32)
    x = jnp.zeros((1, 64, 128, 6))
    _, _, out = _init_and_apply(spec, p, x)
    assert out["depth_a"].shape == (1, 64, 128, 1)
    assert out["motion_fwd"]["rotation"].shape == (1, 3)
    assert out["motion_fwd"]["translation"].shape == (1, 3)
    assert out["motion_fwd"]["residual_translation"].shape == (1, 64, 128, 3)
    # zero-init ego-motion head → identity motion at init
    assert float(jnp.abs(out["motion_fwd"]["rotation"]).max()) < 1e-6


def test_semseg_label_smoothing():
    """eps=0 reproduces the exact unsmoothed loss; eps>0 raises the loss of
    a confident-correct prediction (regularization) and matches the closed
    form CE against (1-eps)*one_hot + eps/C."""
    import numpy as np

    from cvm_tpu.models.semseg.loss import semseg_loss
    from cvm_tpu.models.semseg.params import SemsegParams

    rng = np.random.default_rng(0)
    C = 5
    logits = jnp.asarray(rng.normal(size=(2, 8, 8, C)), jnp.float32) * 3.0
    labels = jnp.asarray(rng.integers(0, C, (2, 8, 8)), jnp.int32)
    p0 = SemsegParams(num_classes=C, class_weights=(1.0,) * C,
                      label_smoothing=0.0)
    p1 = SemsegParams(num_classes=C, class_weights=(1.0,) * C,
                      label_smoothing=0.1)
    l0, _ = semseg_loss({"logits": logits}, {"classes": labels}, p0)
    l1, _ = semseg_loss({"logits": logits}, {"classes": labels}, p1)

    # Closed-form oracle: (1-eps)·NLL(true class) + eps·mean_c(-log p_c).
    import jax as _jax

    logp = np.asarray(_jax.nn.log_softmax(logits, axis=-1))
    expect = (0.9 * -np.take_along_axis(logp, np.asarray(labels)[..., None], -1)[..., 0]
              + 0.1 * (-logp.mean(-1))).mean()
    np.testing.assert_allclose(float(l1), expect, rtol=1e-6)
    # eps=0 must stay the exact unsmoothed CE (static branch, not traced).
    logp_true = -np.take_along_axis(logp, np.asarray(labels)[..., None], -1)[..., 0]
    np.testing.assert_allclose(float(l0), logp_true.mean(), rtol=1e-6)
