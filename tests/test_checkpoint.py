"""Checkpoint save → restore → exact resume (SURVEY.md §5)."""

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
