"""Optimizer factory: AdamW + warmup-cosine schedule + global-norm clipping."""

from __future__ import annotations

import optax


def make_schedule(
    kind: str,
    learning_rate: float,
    total_steps: int,
    warmup_steps: int,
) -> optax.Schedule:
    """LR schedule by name: warmup_cosine (default), constant, step
    (x0.1 at 60%/85% of total_steps — the classic detector recipe), or poly
    ((1 - t)^0.9 decay to 0 — the classic semseg/DeepLab recipe). All
    variants keep the linear warmup."""
    warmup_steps = max(warmup_steps, 1)
    if kind == "warmup_cosine":
        return optax.warmup_cosine_decay_schedule(
            init_value=0.0,
            peak_value=learning_rate,
            warmup_steps=warmup_steps,
            decay_steps=max(total_steps, warmup_steps + 1),
            end_value=learning_rate * 0.01,
        )
    warm = optax.linear_schedule(0.0, learning_rate, warmup_steps)
    if kind == "constant":
        return optax.join_schedules(
            [warm, optax.constant_schedule(learning_rate)], [warmup_steps]
        )
    if kind == "step":
        b1, b2 = int(total_steps * 0.6), int(total_steps * 0.85)
        body = optax.piecewise_constant_schedule(
            learning_rate, {max(b1 - warmup_steps, 1): 0.1,
                            max(b2 - warmup_steps, 2): 0.1}
        )
        return optax.join_schedules([warm, body], [warmup_steps])
    if kind == "poly":
        body = optax.polynomial_schedule(
            init_value=learning_rate, end_value=0.0, power=0.9,
            transition_steps=max(total_steps - warmup_steps, 1),
        )
        return optax.join_schedules([warm, body], [warmup_steps])
    raise ValueError(f"unknown lr_schedule {kind!r} "
                     "(warmup_cosine|constant|step|poly)")


def make_optimizer(
    learning_rate: float,
    total_steps: int,
    warmup_steps: int = 500,
    weight_decay: float = 1e-5,
    clip_norm: float = 10.0,
    grad_accum_steps: int = 1,
    lr_schedule: str = "warmup_cosine",
    optimizer: str = "adamw",
) -> optax.GradientTransformation:
    schedule = make_schedule(lr_schedule, learning_rate, total_steps, warmup_steps)
    if optimizer == "adamw":
        core = optax.adamw(schedule, weight_decay=weight_decay)
    elif optimizer == "sgd":
        # Nesterov momentum + the same decoupled decay AdamW uses, so
        # weight_decay means one thing across optimizers.
        core = optax.chain(
            optax.add_decayed_weights(weight_decay),
            optax.sgd(schedule, momentum=0.9, nesterov=True),
        )
    else:
        raise ValueError(f"unknown optimizer {optimizer!r} (adamw|sgd)")
    tx = optax.chain(optax.clip_by_global_norm(clip_norm), core)
    if grad_accum_steps > 1:
        # k micro-batches accumulate in opt-state before one optimizer apply:
        # k * batch_size effective batch at unchanged activation memory.
        tx = optax.MultiSteps(tx, every_k_schedule=grad_accum_steps)
    return tx
