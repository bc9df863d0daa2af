"""Checkpoint averaging (stochastic weight averaging over retained saves).

Averaging the last N retained checkpoints flattens the tail of SGD noise and
typically buys a fraction of a point of accuracy for free at export time
(Izmailov et al. 2018); the reference has no analogue (its Keras callback
keeps one model per epoch, SURVEY.md §5 "Checkpoint / resume").

Semantics:
- ``params`` (and the EMA shadow, when present) float leaves are the mean of
  the N restored states; integer leaves keep the newest state's value.
- ``batch_stats`` are averaged too — running means/vars are themselves
  smooth statistics; the exact SWA recipe (re-estimate BN over data) is a
  follow-up eval pass the caller can run, but averaged stats are the
  standard cheap approximation.
- ``opt_state``/``step`` stay the newest checkpoint's (averaging optimizer
  moments is meaningless).
"""

from __future__ import annotations

from typing import Tuple

import jax
import numpy as np


def _is_float(x) -> bool:
    return np.issubdtype(np.asarray(x).dtype, np.floating)


def average_checkpoints(trainer, last_n: int) -> Tuple[int, ...]:
    """Replace ``trainer.state``'s params/ema/batch_stats with the mean of
    the last ``last_n`` retained checkpoints. Returns the steps averaged.

    Requires an initialized trainer with a checkpoint_dir; raises when fewer
    than two checkpoints are on disk (keep_checkpoints bounds availability).
    """
    if trainer.ckpt is None:
        raise ValueError("trainer has no checkpoint_dir to average from")
    assert trainer.state is not None, "call init_state() first"
    steps = trainer.ckpt.all_steps()
    use = steps[-int(last_n):]
    if len(use) < 2:
        raise ValueError(
            f"checkpoint averaging needs >= 2 retained checkpoints, found "
            f"{len(steps)} in {trainer.ckpt.directory} (keep_checkpoints "
            f"bounds how many survive)")

    def sub(state):
        return {"params": state.params, "ema_params": state.ema_params,
                "batch_stats": state.batch_stats}

    acc = None
    newest = None
    for s in use:
        st = trainer.ckpt.restore_step(s, trainer.state)
        newest = st  # ascending order: last iteration is the newest step
        host = jax.tree.map(np.asarray, sub(st))
        if acc is None:
            acc = jax.tree.map(
                lambda x: x.astype(np.float64) if _is_float(x) else x, host)
        else:
            acc = jax.tree.map(
                lambda a, x: a + x if _is_float(x) else x, acc, host)

    k = float(len(use))
    avg = jax.tree.map(
        lambda a, ref: (a / k).astype(np.asarray(ref).dtype)
        if _is_float(ref) else a,
        acc, jax.tree.map(np.asarray, sub(newest)),
    )
    state = newest.replace(
        params=avg["params"], ema_params=avg["ema_params"],
        batch_stats=avg["batch_stats"],
    )
    trainer.state = jax.device_put(state, trainer._state_sh)
    return tuple(int(s) for s in use)
