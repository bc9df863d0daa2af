"""Full W8A8 int8 inference: interceptor path vs fp reference."""

import jax
import jax.numpy as jnp
import numpy as np

from cvm_tpu.infer.pipeline import InferencePipeline
from cvm_tpu.infer.quantize import w8a8_inference
from cvm_tpu.data.synthetic import synthetic_batch
from cvm_tpu.models import get_model
import pytest


@pytest.mark.slow
def test_w8a8_semseg_outputs_close(rng):
    spec = get_model("semseg")
    p = spec.params_cls(input_hw=(32, 32), num_classes=3, backbone="tiny",
                        decoder_features=16)
    model = spec.create_model(p)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)), train=False)
    x = jnp.asarray(rng.uniform(-1, 1, (2, 32, 32, 3)).astype(np.float32))

    out_fp = model.apply(variables, x, train=False)
    with w8a8_inference():
        out_q = model.apply(variables, x, train=False)

    pf = np.asarray(jax.nn.softmax(out_fp["logits"]))
    pq = np.asarray(jax.nn.softmax(out_q["logits"]))
    assert np.abs(pf - pq).mean() < 0.05
    agree = (pf.argmax(-1) == pq.argmax(-1)).mean()
    assert agree > 0.9, f"class agreement {agree}"


def test_w8a8_pipeline_end_to_end(rng):
    spec = get_model("centernet")
    p = spec.params_cls(input_hw=(64, 64), num_classes=3, backbone="tiny",
                        neck_features=32, head_features=16, top_k=10)
    model = spec.create_model(p)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)), train=False)
    batch = synthetic_batch(np.random.default_rng(0), 2, (96, 96), num_classes=3)

    pipe_fp = InferencePipeline(spec, p, variables)
    pipe_q = InferencePipeline(spec, p, variables, w8a8=True)
    out_fp = pipe_fp(batch)
    out_q = pipe_q(batch)
    # Untrained net → scores near the 0.1 prior either way; decode stays sane.
    assert np.isfinite(np.asarray(out_q["boxes"])).all()
    assert np.abs(np.asarray(out_q["scores"]) - np.asarray(out_fp["scores"])).mean() < 0.05


def test_w8a8_static_calibrated(rng):
    """Calibrate per-conv scales eagerly, then run the static int8 path:
    outputs close to fp, every conv covered by a scale."""
    from cvm_tpu.infer.quantize import (
        calibrate_activation_scales,
        w8a8_static_inference,
    )

    spec = get_model("semseg")
    p = spec.params_cls(input_hw=(32, 32), num_classes=3, backbone="tiny",
                        decoder_features=16)
    model = spec.create_model(p)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)), train=False)
    cal = [jnp.asarray(rng.uniform(-1, 1, (2, 32, 32, 3)).astype(np.float32))
           for _ in range(3)]
    scales = calibrate_activation_scales(
        lambda x: model.apply(variables, x, train=False), cal
    )
    assert scales, "no conv scales recorded"
    assert all(s > 0 for s in scales.values())

    x = jnp.asarray(rng.uniform(-1, 1, (2, 32, 32, 3)).astype(np.float32))
    out_fp = model.apply(variables, x, train=False)
    with w8a8_static_inference(scales):
        out_q = jax.jit(lambda v, xx: model.apply(v, xx, train=False))(variables, x)

    pf = np.asarray(jax.nn.softmax(out_fp["logits"]))
    pq = np.asarray(jax.nn.softmax(out_q["logits"]))
    assert np.abs(pf - pq).mean() < 0.05
    agree = (pf.argmax(-1) == pq.argmax(-1)).mean()
    assert agree > 0.9, f"class agreement {agree}"


def test_w8a8_static_pipeline(rng):
    """InferencePipeline accepts a scales dict for the static path."""
    from cvm_tpu.infer.quantize import calibrate_activation_scales

    spec = get_model("centernet")
    p = spec.params_cls(input_hw=(64, 64), num_classes=3, backbone="tiny",
                        neck_features=32, head_features=16, top_k=10)
    model = spec.create_model(p)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)), train=False)
    cal = [jnp.asarray(rng.uniform(-1, 1, (1, 64, 64, 3)).astype(np.float32))]
    scales = calibrate_activation_scales(
        lambda x: model.apply(variables, x, train=False), cal
    )
    batch = synthetic_batch(np.random.default_rng(0), 2, (96, 96), num_classes=3)
    pipe_fp = InferencePipeline(spec, p, variables)
    pipe_q = InferencePipeline(spec, p, variables, w8a8=scales)
    out_fp = pipe_fp(batch)
    out_q = pipe_q(batch)
    assert np.isfinite(np.asarray(out_q["boxes"])).all()
    assert np.abs(np.asarray(out_q["scores"]) - np.asarray(out_fp["scores"])).mean() < 0.05
