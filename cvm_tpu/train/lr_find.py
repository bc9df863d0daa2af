"""Learning-rate range finder (Smith, "Cyclical Learning Rates", 2015).

Sweep the learning rate log-linearly from ``lr_min`` to ``lr_max`` over a
short run, record the loss at every step, and suggest a peak LR from the
smoothed curve. The reference leaves LR selection to hand-edited ``Params``
defaults (SURVEY.md §2 "Params/config"); this closes the loop with a
measurement instead of folklore.

Runs through the SAME compiled train step as real training (fused device
preprocessing + fwd/bwd + optimizer) — only the optax schedule differs —
so the suggestion reflects the exact program that will train, including
bf16 numerics, grad clipping, and weight decay.
"""

from __future__ import annotations

import math
from typing import Dict, Iterator, List

import jax
import numpy as np
import optax


def exp_range_schedule(lr_min: float, lr_max: float, num_steps: int):
    """Log-linear LR ramp: lr(0)=lr_min, lr(num_steps-1)=lr_max."""
    if not (0 < lr_min < lr_max):
        raise ValueError(f"need 0 < lr_min < lr_max, got {lr_min}, {lr_max}")
    ratio = lr_max / lr_min
    denom = max(num_steps - 1, 1)

    def sched(step):
        return lr_min * ratio ** (step / denom)

    return sched


def suggest_from_curve(
    lrs: List[float], losses: List[float], beta: float = 0.9
) -> Dict[str, float]:
    """Pick a peak LR from a (lr, loss) sweep.

    Bias-corrected EMA smoothing (the raw per-step loss is batch noise),
    then two standard markers:
    - ``lr_steepest``: LR at the most negative d(smoothed loss)/d(log lr) —
      where the model learns fastest;
    - ``lr_min_loss``: LR at the smoothed-loss minimum.
    The suggestion is the steepest-descent LR (the classic "min/10" rule
    lands near it but is less stable on short sweeps).
    """
    if len(lrs) != len(losses) or len(lrs) < 4:
        raise ValueError("need >= 4 (lr, loss) points")
    sm: List[float] = []
    avg = 0.0
    for i, l in enumerate(losses):
        avg = beta * avg + (1 - beta) * float(l)
        sm.append(avg / (1 - beta ** (i + 1)))
    sm_a = np.asarray(sm)
    i_min = int(np.argmin(sm_a))
    # Slope over log-lr, ignoring the post-divergence tail beyond the min.
    end = max(i_min + 1, 3)
    dlogs = np.diff(np.log(np.asarray(lrs[:end])))
    dloss = np.diff(sm_a[:end])
    slopes = dloss / np.maximum(dlogs, 1e-12)
    i_steep = int(np.argmin(slopes)) + 1 if len(slopes) else i_min
    return {
        "lr_steepest": float(lrs[i_steep]),
        "lr_min_loss": float(lrs[i_min]),
        "suggestion": float(lrs[i_steep]),
        "smoothed_min": float(sm_a[i_min]),
    }


def run_lr_finder(
    spec,
    cfg,
    it: Iterator,
    num_steps: int = 200,
    lr_min: float = 1e-6,
    lr_max: float = 1.0,
    diverge_factor: float = 4.0,
    seed: int = 0,
) -> Dict:
    """Sweep LR over ``num_steps`` batches from ``it``; return curve + picks.

    Stops early once the smoothed loss exceeds ``diverge_factor`` x its best
    (training has diverged; later points carry no information). The model is
    re-initialized fresh — the sweep never touches checkpoints.
    """
    from cvm_tpu.train.loop import Trainer

    sched = exp_range_schedule(lr_min, lr_max, num_steps)
    tx = optax.chain(
        optax.clip_by_global_norm(10.0),
        optax.adamw(sched, weight_decay=getattr(cfg, "weight_decay", 0.0)),
    )
    trainer = Trainer(spec, cfg, tx=tx, seed=seed, log_every=max(num_steps, 1))

    batch = next(it)
    trainer.init_state(batch)

    lrs: List[float] = []
    losses: List[float] = []
    best = math.inf
    avg = 0.0
    stopped_early = False
    for step in range(num_steps):
        hbatch = jax.tree.map(
            lambda x: jax.device_put(x, trainer._batch_sh), batch
        )
        trainer.key, sub = jax.random.split(trainer.key)
        trainer.state, metrics = trainer.train_step(trainer.state, hbatch, sub)
        # Per-step host sync is deliberate here (the finder needs every loss
        # value); this is a 100-300 step diagnostic, not the training loop.
        loss = float(metrics["loss"])
        lrs.append(float(sched(step)))
        losses.append(loss)
        avg = 0.9 * avg + 0.1 * loss
        sm = avg / (1 - 0.9 ** (step + 1))
        if math.isfinite(sm):
            best = min(best, sm)
        if step > 10 and (not math.isfinite(loss) or sm > diverge_factor * best):
            stopped_early = True
            break
        batch = next(it)

    picks = suggest_from_curve(lrs, losses)
    picks.update(
        steps_run=len(lrs), stopped_early=stopped_early,
        lr_min=lr_min, lr_max=lr_max,
    )
    return {"curve": {"lr": lrs, "loss": losses}, **picks}
