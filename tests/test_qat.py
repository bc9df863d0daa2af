"""Quantization-aware training (train/qat.py).

Three properties pin the feature:
1. STE algebra: fq values sit exactly on the int8 grid; the gradient is the
   identity (no clipping ever bites with max-based scales).
2. Serving fidelity: a conv traced under fake_quant_training reproduces the
   dynamic-int8 inference path (infer/quantize._int8_conv) bit-for-bit in
   fp32 — QAT optimizes the numerics we actually deploy.
3. End to end: a model trains with qat=True (loss decreases, grads finite)
   and its fake-quant eval equals its w8a8 dynamic serving output.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import linen as nn

from cvm_tpu.train.qat import (
    fake_quant_act,
    fake_quant_weight,
    fake_quant_training,
)


def test_fake_quant_values_on_int8_grid():
    x = jnp.asarray(np.random.default_rng(0).normal(size=(4, 8, 8, 3)), jnp.float32)
    fq = np.asarray(fake_quant_act(x))
    s = float(np.max(np.abs(np.asarray(x)))) / 127.0 + 1e-8
    # Every output value is an integer multiple of the scale, |q| <= 127.
    q = fq / s
    np.testing.assert_allclose(q, np.round(q), atol=1e-4)
    assert np.max(np.abs(q)) <= 127.0 + 1e-4
    # Quantization error is bounded by half a step.
    assert np.max(np.abs(fq - np.asarray(x))) <= s / 2 + 1e-6


def test_fake_quant_weight_per_channel():
    rng = np.random.default_rng(1)
    # Channel 3 has a 100x larger range — per-channel scales must keep the
    # small channels' resolution (a per-tensor scale would flatten them).
    w = rng.normal(size=(3, 3, 8, 4)).astype(np.float32)
    w[..., 3] *= 100.0
    fq = np.asarray(fake_quant_weight(jnp.asarray(w)))
    err = np.abs(fq - w)
    for c in range(4):
        step = np.max(np.abs(w[..., c])) / 127.0
        assert np.max(err[..., c]) <= step / 2 + 1e-7, f"channel {c}"


def test_ste_gradient_is_identity():
    x = jnp.asarray(np.random.default_rng(2).normal(size=(16,)), jnp.float32)
    g_act = jax.grad(lambda v: jnp.sum(fake_quant_act(v)))(x)
    np.testing.assert_allclose(np.asarray(g_act), np.ones(16), atol=1e-6)
    w = jnp.asarray(np.random.default_rng(3).normal(size=(3, 3, 4, 8)), jnp.float32)
    g_w = jax.grad(lambda v: jnp.sum(fake_quant_weight(v)))(w)
    np.testing.assert_allclose(np.asarray(g_w), np.ones_like(w), atol=1e-6)


def test_fq_conv_matches_int8_inference_path():
    """The QAT forward (fp32 compute) must reproduce _int8_conv exactly:
    same scales, same grid, int32 accumulation representable in fp32."""
    from cvm_tpu.infer.quantize import w8a8_inference

    conv = nn.Conv(12, (3, 3), strides=(2, 2), dtype=jnp.float32, name="c")
    x = jnp.asarray(
        np.random.default_rng(4).normal(size=(2, 16, 16, 5)), jnp.float32
    )
    variables = conv.init(jax.random.PRNGKey(0), x)

    with fake_quant_training():
        y_qat = conv.apply(variables, x)
    with w8a8_inference():
        y_int8 = conv.apply(variables, x)
    np.testing.assert_allclose(
        np.asarray(y_qat), np.asarray(y_int8), rtol=1e-5, atol=1e-5
    )
    # And both genuinely differ from the fp path (the interceptor fired).
    y_fp = conv.apply(variables, x)
    assert not np.allclose(np.asarray(y_qat), np.asarray(y_fp), atol=1e-7)


def test_fq_conv_grads_flow_to_params():
    conv = nn.Conv(8, (3, 3), dtype=jnp.float32, name="c")
    x = jnp.asarray(np.random.default_rng(5).normal(size=(1, 8, 8, 4)), jnp.float32)
    variables = conv.init(jax.random.PRNGKey(1), x)

    def loss(params):
        with fake_quant_training():
            return jnp.sum(conv.apply({"params": params}, x) ** 2)

    g = jax.grad(loss)(variables["params"])
    leaves = jax.tree.leaves(g)
    assert all(np.all(np.isfinite(np.asarray(l))) for l in leaves)
    assert any(float(jnp.max(jnp.abs(l))) > 0 for l in leaves)


def test_qat_inference_pipeline_scores_the_int8_artifact():
    """evaluate_model / --keep_best go through InferencePipeline: with
    qat=True it must serve the fake-quant numerics (== the w8a8 dynamic
    serving path), NOT the fp forward — otherwise best-checkpoint selection
    ranks a model that never ships (review finding, round 4)."""
    import dataclasses

    from cvm_tpu.data.synthetic import synthetic_batch
    from cvm_tpu.infer.pipeline import InferencePipeline
    from cvm_tpu.models import get_model

    spec = get_model("depth")
    p = spec.params_cls(input_hw=(64, 64), backbone="tiny",
                        decoder_features=16, num_scales=1, qat=True)
    model = spec.create_model(p)
    variables = model.init(
        jax.random.PRNGKey(0), np.zeros((1, 64, 64, 3), np.float32),
        train=False,
    )
    batch = synthetic_batch(np.random.default_rng(0), 2, (96, 96),
                            num_classes=3)

    d_qat = np.asarray(InferencePipeline(spec, p, variables)(batch)["depth"],
                       np.float32)
    d_int8 = np.asarray(
        InferencePipeline(spec, p, variables, w8a8=True)(batch)["depth"],
        np.float32,
    )
    p_fp = dataclasses.replace(p, qat=False)
    d_fp = np.asarray(InferencePipeline(spec, p_fp, variables)(batch)["depth"],
                      np.float32)
    # The qat pipeline departs from fp and tracks the int8 serving path.
    assert not np.allclose(d_qat, d_fp, atol=1e-7)
    assert np.max(np.abs(d_qat - d_int8)) < np.max(np.abs(d_qat - d_fp))
    np.testing.assert_allclose(d_qat, d_int8, rtol=0.05, atol=0.02)


@pytest.mark.slow
def test_qat_training_learns_and_matches_serving():
    """qat=True end to end: jitted train steps reduce the loss, and the
    fake-quant eval output equals the w8a8 dynamic serving output."""
    from cvm_tpu.data.synthetic import synthetic_iterator
    from cvm_tpu.infer.quantize import w8a8_inference
    from cvm_tpu.models import get_model
    from cvm_tpu.train.loop import Trainer

    spec = get_model("semseg")
    p = spec.params_cls(
        input_hw=(32, 32), num_classes=3, backbone="tiny", decoder_features=16,
        class_weights=(1.0, 1.0, 1.0), learning_rate=1e-3, warmup_steps=2,
        total_steps=100, qat=True,
    )
    tr = Trainer(spec, p, log_every=1)
    it = synthetic_iterator(0, 8, (48, 48), num_classes=3)
    tr.init_state(next(it))

    losses = []
    s = tr.state
    key = jax.random.PRNGKey(0)
    for _ in range(20):
        raw = jax.tree.map(lambda x: jax.device_put(x, tr._batch_sh), next(it))
        key, sub = jax.random.split(key)
        s, m = tr.train_step(s, raw, sub)
        losses.append(float(m["loss"]))
    assert np.isfinite(losses).all()
    assert np.mean(losses[-5:]) < np.mean(losses[:5]), losses

    # The trained params, served through the int8 dynamic path, match the
    # fake-quant forward the training loop was optimizing (fp32 model).
    model = spec.create_model(p)
    proc = spec.make_processor(p, train=False)
    inputs, _ = jax.jit(proc)(None, jax.device_get(
        jax.tree.map(lambda x: x, next(it))))
    variables = {"params": jax.device_get(s.params),
                 "batch_stats": jax.device_get(s.batch_stats)}
    with fake_quant_training():
        out_fq = model.apply(variables, inputs, train=False)
    with w8a8_inference():
        out_int8 = model.apply(variables, inputs, train=False)
    # bf16 conv compute in the model → loose tolerance; identical structure.
    for a, b in zip(jax.tree.leaves(out_fq), jax.tree.leaves(out_int8)):
        a = np.asarray(a, np.float32)
        b = np.asarray(b, np.float32)
        assert np.max(np.abs(a - b)) < 0.1 * (np.max(np.abs(a)) + 1e-6)
