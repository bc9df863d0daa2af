"""Integration: N sharded training steps on synthetic data reduce the loss
(SURVEY.md §4 items 3-4) — exercised on the virtual 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cvm_tpu.data.synthetic import synthetic_iterator
from cvm_tpu.models import get_model
from cvm_tpu.train.loop import Trainer

pytestmark = pytest.mark.slow  # every zoo model trains to loss decrease (~2 min)


def _run_steps(name, p, steps=12, two_frame=False, batch=8):
    series = _run_series(name, p, steps, two_frame, batch)
    return series["loss"][0], series["loss"][-1]


def _run_series(name, p, steps, two_frame=False, batch=8):
    """All logged metrics per step, so tests can assert per-head learning."""
    spec = get_model(name)
    trainer = Trainer(spec, p, log_every=1)
    it = synthetic_iterator(0, batch, (96, 128), num_classes=3, max_objects=6, two_frame=two_frame)
    sample = next(it)
    trainer.init_state(sample)
    series = {}
    for i in range(steps):
        raw = next(it)
        raw = jax.tree.map(lambda x: jax.device_put(x, trainer._batch_sh), raw)
        trainer.key, sub = jax.random.split(trainer.key)
        trainer.state, metrics = trainer.train_step(trainer.state, raw, sub)
        for k, v in metrics.items():
            val = float(v)
            assert np.isfinite(val), f"step {i}: non-finite {k}"
            series.setdefault(k, []).append(val)
    return series


def _assert_decreases(series, key, k=3, factor=1.0):
    """Mean of first k vs last k steps (fresh random batches are noisy)."""
    head = float(np.mean(series[key][:k]))
    tail = float(np.mean(series[key][-k:]))
    assert tail < head * factor, f"{key} did not learn: {head:.4f} -> {tail:.4f}"


def test_centernet_loss_decreases():
    p = get_model("centernet").params_cls(
        input_hw=(64, 64), num_classes=3, max_objects=6, backbone="tiny",
        neck_features=32, head_features=16, learning_rate=1e-3, warmup_steps=2,
        total_steps=200,
    )
    first, last = _run_steps("centernet", p)
    assert last < first, f"loss did not decrease: {first} -> {last}"


def test_semseg_loss_decreases():
    p = get_model("semseg").params_cls(
        input_hw=(64, 64), num_classes=3, backbone="tiny", decoder_features=16,
        class_weights=(1.0, 1.0, 1.0), learning_rate=1e-3, warmup_steps=2,
        total_steps=200,
    )
    first, last = _run_steps("semseg", p)
    assert last < first


def test_depth_loss_decreases():
    p = get_model("depth").params_cls(
        input_hw=(64, 64), backbone="tiny", decoder_features=16, num_scales=1,
        learning_rate=1e-3, warmup_steps=2, total_steps=200,
    )
    first, last = _run_steps("depth", p)
    assert last < first


def test_multitask_every_head_learns():
    """Joint loss AND each head's component must decrease (VERDICT r1 #7)."""
    p = get_model("multitask").params_cls(
        input_hw=(64, 64), backbone="tiny", neck_features=32, head_features=16,
        num_det_classes=3, max_objects=6, learning_rate=1e-3, warmup_steps=2,
        total_steps=200,
    )
    s = _run_series("multitask", p, steps=16)
    _assert_decreases(s, "loss")
    _assert_decreases(s, "loss_det")
    _assert_decreases(s, "loss_seg")
    _assert_decreases(s, "loss_depth")


def test_multitask_uncertainty_weighting_learns():
    """Kendall homoscedastic weighting: the learnable log-variances replace
    the static task balance; every head still learns, the log-vars move off
    their zero init, and the total matches the formula
    sum exp(-s_i) L_i + 0.5 sum s_i exactly."""
    p = get_model("multitask").params_cls(
        input_hw=(64, 64), backbone="tiny", neck_features=32, head_features=16,
        num_det_classes=3, max_objects=6, learning_rate=1e-3, warmup_steps=2,
        total_steps=200, uncertainty_weighting=True,
    )
    s = _run_series("multitask", p, steps=16)
    _assert_decreases(s, "loss")
    _assert_decreases(s, "loss_det")
    _assert_decreases(s, "loss_seg")
    _assert_decreases(s, "loss_depth")
    # log-variances are being optimized (moved off the zero init)...
    assert any(abs(s[f"logvar_{t}"][-1]) > 1e-4 for t in ("det", "seg", "depth"))
    # ...and the reported total equals the Kendall formula at every step.
    for i in range(len(s["loss"])):
        want = (np.exp(-s["logvar_det"][i]) * s["loss_det"][i]
                + np.exp(-s["logvar_seg"][i]) * s["loss_seg"][i]
                + np.exp(-s["logvar_depth"][i]) * s["loss_depth"][i]
                + 0.5 * (s["logvar_det"][i] + s["logvar_seg"][i]
                         + s["logvar_depth"][i]))
        np.testing.assert_allclose(s["loss"][i], want, rtol=2e-2)


def test_dmds_photometric_learns():
    """The photometric head (the supervision signal) must decrease, not just
    stay finite (VERDICT r1 #7)."""
    p = get_model("dmds").params_cls(
        input_hw=(64, 64), backbone="tiny", decoder_features=16,
        motion_features=32, learning_rate=5e-4, warmup_steps=2, total_steps=200,
    )
    s = _run_series("dmds", p, steps=16, two_frame=True)
    _assert_decreases(s, "loss")
    _assert_decreases(s, "loss_photo")


def test_training_state_is_replicated_and_batch_sharded():
    """Params replicated over the 8-device mesh; metrics finite."""
    assert len(jax.devices()) == 8
    p = get_model("semseg").params_cls(
        input_hw=(32, 32), num_classes=3, backbone="tiny", decoder_features=16,
        class_weights=(1.0, 1.0, 1.0), warmup_steps=2, total_steps=100,
    )
    spec = get_model("semseg")
    trainer = Trainer(spec, p)
    it = synthetic_iterator(1, 8, (48, 48), num_classes=3)
    trainer.init_state(next(it))
    leaf = jax.tree.leaves(trainer.state.params)[0]
    assert len(leaf.sharding.device_set) == 8  # replicated across mesh
