"""Optimizer factory: AdamW + warmup-cosine schedule + global-norm clipping."""

from __future__ import annotations

import optax


def make_optimizer(
    learning_rate: float,
    total_steps: int,
    warmup_steps: int = 500,
    weight_decay: float = 1e-5,
    clip_norm: float = 10.0,
    grad_accum_steps: int = 1,
) -> optax.GradientTransformation:
    schedule = optax.warmup_cosine_decay_schedule(
        init_value=0.0,
        peak_value=learning_rate,
        warmup_steps=max(warmup_steps, 1),
        decay_steps=max(total_steps, warmup_steps + 1),
        end_value=learning_rate * 0.01,
    )
    tx = optax.chain(
        optax.clip_by_global_norm(clip_norm),
        optax.adamw(schedule, weight_decay=weight_decay),
    )
    if grad_accum_steps > 1:
        # k micro-batches accumulate in opt-state before one optimizer apply:
        # k * batch_size effective batch at unchanged activation memory.
        tx = optax.MultiSteps(tx, every_k_schedule=grad_accum_steps)
    return tx
