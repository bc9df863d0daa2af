"""Jitted, mesh-sharded training loop (SURVEY.md §1 L5 rebuilt TPU-first).

One compiled program per step contains the ENTIRE per-step pipeline: fused
preprocessing + GT rendering (the reference's host hot loop, SURVEY.md §3.1),
forward, loss, backward, and optimizer update. The host only feeds raw padded
uint8 batches; under GSPMD the batch is sharded over the mesh "data" axis and
gradient/batch-norm reductions become ICI collectives automatically.
"""

from __future__ import annotations

import time
from typing import Any, Callable, Dict, Iterator, Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct
from jax.sharding import Mesh

from cvm_tpu.models.registry import ModelSpec
from cvm_tpu.parallel.mesh import batch_sharding, make_mesh, replicated
from cvm_tpu.train.optim import make_optimizer


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any
    # Shadow EMA of params when cfg.ema_decay > 0, else {} (empty subtree —
    # pytree structure stays static either way).
    ema_params: Any = struct.field(default_factory=dict)


def create_train_state(
    model, params_cfg, tx, sample_input: jnp.ndarray, rngs: Optional[dict] = None
) -> TrainState:
    variables = model.init(rngs or {"params": jax.random.PRNGKey(0)}, sample_input, train=False)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    use_ema = getattr(params_cfg, "ema_decay", 0.0) > 0.0
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=batch_stats,
        opt_state=tx.init(params),
        ema_params=jax.tree.map(jnp.copy, params) if use_ema else {},
    )


def make_train_step(model, spec_loss: Callable, params_cfg, tx, processor) -> Callable:
    """Returns train_step(state, raw_batch, key) → (state, metrics)."""

    def train_step(state: TrainState, raw_batch, key):
        # Derive the per-step key INSIDE the compiled program from the device
        # step counter: the host loop can pass one constant base key for the
        # whole run instead of dispatching jax.random.split every step (each
        # host-side split is a device round-trip — ~2 ms over this relay).
        k_proc = jax.random.fold_in(key, state.step)
        inputs, targets = processor(k_proc, raw_batch)

        def loss_fn(p):
            out, mut = model.apply(
                {"params": p, "batch_stats": state.batch_stats},
                inputs,
                train=True,
                mutable=["batch_stats"],
            )
            loss, metrics = spec_loss(out, targets, params_cfg)
            return loss, (metrics, mut["batch_stats"])

        (_, (metrics, new_bs)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params
        )
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        metrics = dict(metrics)
        metrics["grad_norm"] = optax.global_norm(grads)
        ema_decay = getattr(params_cfg, "ema_decay", 0.0)
        if ema_decay > 0.0:
            # With gradient accumulation, params only move when MultiSteps
            # applies (mini_step wraps to 0); updating the shadow on the
            # frozen micro-steps would silently weaken the effective decay
            # to decay^k per optimizer update.
            applied = jnp.asarray(True)
            if getattr(params_cfg, "grad_accum_steps", 1) > 1:
                applied = new_opt.mini_step == 0
            new_ema = jax.tree.map(
                lambda e, p: jnp.where(
                    applied, ema_decay * e + (1.0 - ema_decay) * p, e
                ),
                state.ema_params,
                new_params,
            )
        else:
            new_ema = state.ema_params
        new_state = TrainState(
            step=state.step + 1,
            params=new_params,
            batch_stats=new_bs,
            opt_state=new_opt,
            ema_params=new_ema,
        )
        return new_state, metrics

    return train_step


def make_eval_step(model, spec_loss, params_cfg, processor) -> Callable:
    use_ema = getattr(params_cfg, "ema_decay", 0.0) > 0.0

    def eval_step(state: TrainState, raw_batch):
        inputs, targets = processor(None, raw_batch)
        p = state.ema_params if use_ema else state.params
        out = model.apply(
            {"params": p, "batch_stats": state.batch_stats}, inputs, train=False
        )
        _, metrics = spec_loss(out, targets, params_cfg)
        return metrics

    return eval_step


class Trainer:
    """Orchestrates jitted steps, checkpointing, and metrics for one model.

    Equivalent of the reference's per-model train.py compile+fit loop
    (SURVEY.md §3.1), with mesh sharding, JSONL metrics, and Orbax-backed
    checkpoint/resume replacing Keras callbacks + MLflow.
    """

    def __init__(
        self,
        spec: ModelSpec,
        params_cfg,
        mesh: Optional[Mesh] = None,
        checkpoint_dir: Optional[str] = None,
        metrics_path: Optional[str] = None,
        tensorboard_dir: Optional[str] = None,
        keep_checkpoints: int = 3,
        checkpoint_every: int = 1000,
        log_every: int = 50,
        seed: int = 0,
    ):
        self.spec = spec
        self.cfg = params_cfg
        self.mesh = mesh if mesh is not None else make_mesh()
        from cvm_tpu.models.registry import build_model

        self.model = build_model(spec, params_cfg, mesh=self.mesh)
        self.tx = make_optimizer(
            params_cfg.learning_rate,
            params_cfg.total_steps,
            params_cfg.warmup_steps,
            params_cfg.weight_decay,
            grad_accum_steps=getattr(params_cfg, "grad_accum_steps", 1),
            lr_schedule=getattr(params_cfg, "lr_schedule", "warmup_cosine"),
        )
        self.processor = spec.make_processor(params_cfg, train=True)
        self.log_every = log_every
        self.checkpoint_every = checkpoint_every
        self.seed = seed
        self.key = jax.random.PRNGKey(seed)

        self._repl = replicated(self.mesh)
        self._batch_sh = batch_sharding(self.mesh)
        # Tensor parallelism: the per-model ``tensor_parallel`` config flag
        # activates the default Megatron-pattern rules over the mesh "model"
        # axis (parallel/sharding.py); params/opt-state leaves matching the
        # rules are physically sharded and GSPMD partitions the convs.
        self.tp_rules = ()
        if getattr(params_cfg, "tensor_parallel", False):
            from cvm_tpu.parallel.sharding import tp_rules_for

            self.tp_rules = tp_rules_for(spec.name)
        self._state_sh = self._repl  # refined in init_state when TP is on
        self._step_fn = make_train_step(
            self.model, spec.loss_fn, params_cfg, self.tx, self.processor
        )
        self.train_step = self._jit_step(self._repl)

        self.metrics_writer = None
        writers = []
        if metrics_path is not None:
            from cvm_tpu.train.metrics import JsonlMetricsWriter

            writers.append(JsonlMetricsWriter(metrics_path))
        if tensorboard_dir is not None:
            from cvm_tpu.train.tensorboard import TensorBoardWriter

            writers.append(TensorBoardWriter(tensorboard_dir))
        if len(writers) == 1:
            self.metrics_writer = writers[0]
        elif writers:
            from cvm_tpu.train.metrics import MultiWriter

            self.metrics_writer = MultiWriter(*writers)

        self.ckpt = None
        if checkpoint_dir is not None:
            from cvm_tpu.train.checkpoints import CheckpointManager

            self.ckpt = CheckpointManager(
                checkpoint_dir, keep=keep_checkpoints, params_cfg=params_cfg
            )

        self.state: Optional[TrainState] = None

    @property
    def eval_params(self):
        """Params to evaluate/export with: the EMA shadow when enabled."""
        assert self.state is not None, "call init_state() first"
        if getattr(self.cfg, "ema_decay", 0.0) > 0.0:
            return self.state.ema_params
        return self.state.params

    def _jit_step(self, state_sh):
        return jax.jit(
            self._step_fn,
            in_shardings=(state_sh, self._batch_sh, self._repl),
            out_shardings=(state_sh, self._repl),
            donate_argnums=(0,),
        )

    def _tp_state_shardings(self, state: TrainState) -> TrainState:
        """Per-leaf shardings: rule-matched params/opt-state sharded on the
        mesh "model" axis, everything else replicated."""
        from cvm_tpu.parallel.sharding import make_param_shardings

        return TrainState(
            step=self._repl,
            params=make_param_shardings(state.params, self.mesh, self.tp_rules),
            batch_stats=make_param_shardings(state.batch_stats, self.mesh, ()),
            opt_state=make_param_shardings(state.opt_state, self.mesh, self.tp_rules),
            ema_params=make_param_shardings(state.ema_params, self.mesh, self.tp_rules),
        )

    def init_state(self, sample_batch=None) -> TrainState:
        """Initialize (or restore) mesh-sharded train state.

        ``sample_batch`` is accepted for API symmetry but unused — the model
        input shape is fully determined by the config (static shapes
        everywhere), so no labels are needed to initialize.
        """
        channels = 6 if self.spec.name == "dmds" else 3
        sample = jnp.zeros((1, *self.cfg.input_hw, channels), jnp.float32)
        with jax.default_device(jax.devices()[0]):
            # The seed must reach weight init too — otherwise every "seed"
            # trains from byte-identical initial weights and only the
            # augmentation stream differs.
            state = create_train_state(
                self.model, self.cfg, self.tx, sample,
                rngs={"params": jax.random.PRNGKey(self.seed)},
            )
        if self.tp_rules:
            self._state_sh = self._tp_state_shardings(state)
            self.train_step = self._jit_step(self._state_sh)
        state = jax.device_put(state, self._state_sh)
        if self.ckpt is not None:
            restored = self.ckpt.restore_latest(state)
            if restored is not None:
                state = jax.device_put(restored, self._state_sh)
        self.state = state
        return state

    def fit(self, data_iter: Iterator, num_steps: int) -> Dict[str, float]:
        """Run ``num_steps`` training steps; returns the last metrics.

        Host batches are double-buffered onto the device (transfers overlap
        the previous step's execution — BASELINE "double-buffered input").
        """
        assert self.state is not None, "call init_state(sample_batch) first"
        from collections import deque
        from itertools import islice

        from cvm_tpu.data.loader import prefetch_to_device

        last: Dict[str, float] = {}
        metrics = None
        t0 = time.perf_counter()
        steps_in_window = 0
        # One base key per fit() call; the per-step key is fold_in(base, step)
        # INSIDE the compiled step. The step counter is tracked on the host —
        # fetching int(state.step) every iteration would force a full
        # host<->device sync per step (measured 3x slower over the relay).
        self.key, base = jax.random.split(self.key)
        step = int(self.state.step)  # one sync at entry (resume-aware)
        inflight: deque = deque()  # bound dispatch run-ahead (device memory)

        # Stall watchdog: a remote backend has been observed to hang an RPC
        # indefinitely (device healthy on restart). We can't interrupt a
        # blocked wait, but we CAN tell the operator loudly instead of
        # looking like slow training.
        import threading

        # heartbeat[1] flips True after the FIRST completed step: before
        # that, long quiet periods are normal (cold-cache XLA compiles take
        # minutes over a remote backend) and must not trigger kill advice.
        heartbeat = [time.monotonic(), False]
        done = threading.Event()

        def _watch():
            while not done.wait(30.0):
                quiet = time.monotonic() - heartbeat[0]
                threshold = 120.0 if heartbeat[1] else 1800.0
                if quiet > threshold:
                    import sys

                    stage = ("no training step completed" if heartbeat[1]
                             else "first step still not finished (compile?)")
                    print(
                        f"[cvm_tpu] WARNING: {stage} in {quiet:.0f}s — the "
                        "device/backend may be stalled (kill and resume from "
                        "the last checkpoint if this persists)",
                        file=sys.stderr, flush=True,
                    )

        threading.Thread(target=_watch, daemon=True).start()
        try:
            batches = prefetch_to_device(islice(data_iter, num_steps), self._batch_sh)
            for raw in batches:
                self.state, metrics = self.train_step(self.state, raw, base)
                step += 1
                steps_in_window += 1
                inflight.append(metrics["loss"])
                if len(inflight) > 8:
                    inflight.popleft().block_until_ready()
                    heartbeat[0] = time.monotonic()
                    heartbeat[1] = True
                if step % self.log_every == 0 or step == 1:
                    last = {k: float(v) for k, v in metrics.items()}
                    heartbeat[0] = time.monotonic()
                    heartbeat[1] = True
                    dt = time.perf_counter() - t0
                    t0 = time.perf_counter()
                    last["steps_per_sec"] = steps_in_window / max(dt, 1e-9)
                    steps_in_window = 0
                    if self.metrics_writer is not None:
                        self.metrics_writer.write(step, last)
                if self.ckpt is not None and step % self.checkpoint_every == 0:
                    self.ckpt.save(step, self.state)
        finally:
            done.set()
        if steps_in_window and metrics is not None:
            # num_steps not a multiple of log_every: the documented "last
            # metrics" must reflect the FINAL step, not the last log point.
            tail = {k: float(v) for k, v in metrics.items()}
            tail["steps_per_sec"] = steps_in_window / max(
                time.perf_counter() - t0, 1e-9)
            last = tail
        if self.ckpt is not None:
            self.ckpt.wait()
        return last
