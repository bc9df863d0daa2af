"""Checkpoint save → restore → exact resume (SURVEY.md §5)."""

import pytest

pytestmark = pytest.mark.slow  # orbax save/restore roundtrips with training (~5 min)

import jax
import jax.numpy as jnp
import numpy as np

from cvm_tpu.data.synthetic import synthetic_iterator
from cvm_tpu.models import get_model
from cvm_tpu.train.checkpoints import CheckpointManager, load_params_cfg
from cvm_tpu.train.loop import Trainer


def test_save_restore_roundtrip(tmp_path):
    spec = get_model("semseg")
    p = spec.params_cls(
        input_hw=(32, 32), num_classes=3, backbone="tiny", decoder_features=16,
        class_weights=(1.0, 1.0, 1.0), warmup_steps=2, total_steps=100,
    )
    ckdir = str(tmp_path / "ck")
    trainer = Trainer(spec, p, checkpoint_dir=ckdir, checkpoint_every=2, log_every=1)
    it = synthetic_iterator(0, 8, (48, 48), num_classes=3)
    trainer.init_state(next(it))
    trainer.fit(it, 4)
    trainer.ckpt.wait()
    assert trainer.ckpt.latest_step() == 4

    # Fresh trainer restores to step 4 with identical params.
    trainer2 = Trainer(spec, p, checkpoint_dir=ckdir)
    trainer2.init_state(next(it))
    assert int(trainer2.state.step) == 4
    a = jax.tree.leaves(trainer.state.params)[0]
    b = jax.tree.leaves(trainer2.state.params)[0]
    np.testing.assert_allclose(np.asarray(a), np.asarray(b))

    # params.json round-trips the typed config.
    cfg = load_params_cfg(ckdir, spec.params_cls)
    assert cfg.input_hw == (32, 32) and cfg.num_classes == 3


def test_resume_continues_training(tmp_path):
    spec = get_model("semseg")
    p = spec.params_cls(
        input_hw=(32, 32), num_classes=3, backbone="tiny", decoder_features=16,
        class_weights=(1.0, 1.0, 1.0), warmup_steps=2, total_steps=100,
    )
    ckdir = str(tmp_path / "ck")
    t1 = Trainer(spec, p, checkpoint_dir=ckdir, checkpoint_every=3, log_every=1)
    it = synthetic_iterator(0, 8, (48, 48), num_classes=3)
    t1.init_state(next(it))
    t1.fit(it, 3)
    t1.ckpt.wait()

    t2 = Trainer(spec, p, checkpoint_dir=ckdir, checkpoint_every=100, log_every=1)
    t2.init_state(next(it))
    m = t2.fit(it, 2)
    assert int(t2.state.step) == 5
    assert np.isfinite(m["loss"])


def test_ema_flag_flip_across_checkpoints(tmp_path):
    """Flipping ema_decay on an existing workdir must not crash the restore
    (ADVICE r2): a missing EMA shadow is seeded from the restored params; a
    stale one is dropped."""
    spec = get_model("semseg")
    base = dict(
        input_hw=(32, 32), num_classes=3, backbone="tiny", decoder_features=16,
        class_weights=(1.0, 1.0, 1.0), warmup_steps=2, total_steps=100,
    )
    ckdir = str(tmp_path / "ck")

    # Train WITHOUT EMA, checkpoint at step 2.
    p0 = spec.params_cls(**base)
    t0 = Trainer(spec, p0, checkpoint_dir=ckdir, checkpoint_every=2, log_every=1)
    it = synthetic_iterator(0, 8, (48, 48), num_classes=3)
    t0.init_state(next(it))
    t0.fit(it, 2)
    t0.ckpt.wait()

    # Enable EMA on the same workdir: restore succeeds, shadow == params.
    p1 = spec.params_cls(**base, ema_decay=0.9)
    t1 = Trainer(spec, p1, checkpoint_dir=ckdir, checkpoint_every=100, log_every=1)
    t1.init_state(next(it))
    assert int(t1.state.step) == 2
    pa = jax.tree.leaves(t1.state.params)[0]
    ea = jax.tree.leaves(t1.state.ema_params)[0]
    np.testing.assert_allclose(np.asarray(pa), np.asarray(ea))
    t1.fit(it, 2)
    t1.ckpt.save(int(t1.state.step), t1.state)
    t1.ckpt.wait()

    # Disable EMA again: the stale shadow is dropped, training continues.
    t2 = Trainer(spec, p0, checkpoint_dir=ckdir, checkpoint_every=100, log_every=1)
    t2.init_state(next(it))
    assert int(t2.state.step) == 4
    assert t2.state.ema_params == {}
    m = t2.fit(it, 1)
    assert np.isfinite(m["loss"])


def test_keep_best_checkpoint(tmp_path):
    """BestCheckpoint keeps exactly the best-by-metric state and the bar
    survives a process restart (best.json sidecar); cli.train wires it via
    --keep_best/--eval_every."""
    from cvm_tpu.train.checkpoints import BestCheckpoint

    spec = get_model("semseg")
    cfg = spec.params_cls(
        input_hw=(32, 32), num_classes=3, backbone="tiny", decoder_features=16,
        class_weights=(1.0, 1.0, 1.0), warmup_steps=2, total_steps=100,
    )
    tr = Trainer(spec, cfg, log_every=1)
    it = synthetic_iterator(0, 8, (48, 48), num_classes=3)
    tr.init_state(next(it))

    d = str(tmp_path / "best")
    b = BestCheckpoint(d, "miou", "max", params_cfg=cfg)
    assert b.update(1, tr.state, 0.50)       # first value always records
    assert not b.update(2, tr.state, 0.40)   # worse: ignored
    assert b.update(3, tr.state, 0.75)       # better: replaces
    b.wait()

    # The bar persists across a fresh process (auto-restart semantics)...
    b2 = BestCheckpoint(d, "miou", "max", params_cfg=cfg)
    assert b2.best == 0.75
    assert not b2.update(4, tr.state, 0.60)
    # ...and a different metric/mode starts a fresh bar rather than
    # comparing apples to oranges.
    b3 = BestCheckpoint(d, "loss", "min", params_cfg=cfg)
    assert b3.best is None

    # A sidecar whose step has no checkpoint behind it (crash between the
    # best.json write and the async save finalizing) must NOT be honored —
    # a phantom bar would block every reachable best from recording.
    import json as _json
    with open(f"{d}/best.json", "w") as f:
        _json.dump({"metric": "miou", "mode": "max", "value": 0.99,
                    "step": 999}, f)
    b4 = BestCheckpoint(d, "miou", "max", params_cfg=cfg)
    assert b4.best is None
    assert b4.update(5, tr.state, 0.10)  # records despite the phantom 0.99
    b4.wait()

    # The directory is a normal self-describing checkpoint dir: params.json
    # + the stored state restores through the standard manager.
    assert load_params_cfg(d, spec.params_cls).num_classes == 3
    mgr = CheckpointManager(d, keep=1)
    assert mgr.latest_step() == 5
    restored = mgr.restore_latest(tr.state)
    np.testing.assert_allclose(
        np.asarray(jax.tree.leaves(restored.params)[0]),
        np.asarray(jax.tree.leaves(tr.state.params)[0]),
    )
