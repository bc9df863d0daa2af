"""Checkpoint averaging (train/average.py) + CLI wiring."""

import itertools

import jax
import numpy as np
import pytest

# Each test trains a real Trainer through several checkpoint saves — the
# three together measured 568 s on the loaded single core (top of the
# round-5 fast-lane duration profile); coverage lives in the slow lane.
pytestmark = pytest.mark.slow

from cvm_tpu.data.synthetic import synthetic_batch
from cvm_tpu.models import get_model
from cvm_tpu.train.average import average_checkpoints
from cvm_tpu.train.loop import Trainer


def _trained_trainer(tmp_path, steps=3, ema=0.0):
    spec = get_model("semseg")
    p = spec.params_cls(input_hw=(32, 32), num_classes=3, backbone="tiny",
                        decoder_features=16, class_weights=(1.0, 1.0, 1.0),
                        batch_size=8, warmup_steps=1, total_steps=10,
                        ema_decay=ema)
    ckdir = str(tmp_path / "ck")
    tr = Trainer(spec, p, checkpoint_dir=ckdir, checkpoint_every=1,
                 log_every=1, keep_checkpoints=4)
    tr.init_state()
    pool = [synthetic_batch(np.random.default_rng(i), 8, (48, 48),
                            num_classes=3) for i in range(2)]
    tr.fit(itertools.cycle(pool), steps)
    tr.ckpt.wait()
    return spec, p, ckdir, tr


def test_average_checkpoints_is_the_mean(tmp_path):
    spec, p, ckdir, tr = _trained_trainer(tmp_path, steps=3)
    steps = tr.ckpt.all_steps()
    assert len(steps) >= 3

    # Fresh trainer (restores newest); average the last two checkpoints.
    tr2 = Trainer(spec, p, checkpoint_dir=ckdir)
    tr2.init_state()
    used = average_checkpoints(tr2, 2)
    assert list(used) == steps[-2:]

    # Oracle: the elementwise mean of the two restored param trees.
    tr3 = Trainer(spec, p, checkpoint_dir=ckdir)
    tr3.init_state()
    a = jax.tree.map(np.asarray, tr3.ckpt.restore_step(used[0], tr3.state).params)
    b = jax.tree.map(np.asarray, tr3.ckpt.restore_step(used[1], tr3.state).params)
    want = jax.tree.map(lambda x, y: (x.astype(np.float64) + y) / 2.0, a, b)
    got = jax.tree.map(np.asarray, tr2.state.params)
    flat_w, _ = jax.tree.flatten(want)
    flat_g, _ = jax.tree.flatten(got)
    for w, g in zip(flat_w, flat_g):
        np.testing.assert_allclose(g, w.astype(g.dtype), rtol=0, atol=1e-6)
    # The two sources differ (training moved), so the average is not either.
    assert any(not np.allclose(x, y) for x, y in
               zip(jax.tree.flatten(a)[0], jax.tree.flatten(b)[0]))
    # step/opt_state follow the newest checkpoint.
    assert int(tr2.state.step) == used[-1]


def test_average_checkpoints_includes_ema_shadow(tmp_path):
    spec, p, ckdir, _ = _trained_trainer(tmp_path, steps=3, ema=0.9)
    tr = Trainer(spec, p, checkpoint_dir=ckdir)
    tr.init_state()
    before = jax.tree.map(np.asarray, tr.state.ema_params)
    average_checkpoints(tr, 2)
    after = jax.tree.map(np.asarray, tr.state.ema_params)
    assert jax.tree.leaves(after)  # shadow still populated
    assert any(not np.allclose(x, y) for x, y in
               zip(jax.tree.flatten(before)[0], jax.tree.flatten(after)[0]))


def test_average_checkpoints_needs_two(tmp_path):
    spec, p, ckdir, _ = _trained_trainer(tmp_path, steps=1)
    tr = Trainer(spec, p, checkpoint_dir=ckdir)
    tr.init_state()
    with pytest.raises(ValueError, match=">= 2 retained"):
        average_checkpoints(tr, 5)


@pytest.mark.slow
def test_evaluate_cli_average_last(tmp_path, capsys):
    from cvm_tpu.cli.evaluate import main

    spec, p, ckdir, _ = _trained_trainer(tmp_path, steps=3)
    rc = main(["--model", "semseg", "--checkpoint_dir", ckdir,
               "--data", "synthetic", "--batches", "2",
               "--average_last", "2"])
    assert rc in (0, None)
    err = capsys.readouterr().err
    assert "averaged checkpoints at steps" in err
