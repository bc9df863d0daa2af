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


def create_train_state(
    model, params_cfg, tx, sample_input: jnp.ndarray, rngs: Optional[dict] = None
) -> TrainState:
    variables = model.init(rngs or {"params": jax.random.PRNGKey(0)}, sample_input, train=False)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=batch_stats,
        opt_state=tx.init(params),
    )


def make_train_step(model, spec_loss: Callable, params_cfg, tx, processor) -> Callable:
    """Returns train_step(state, raw_batch, key) → (state, metrics)."""

    def train_step(state: TrainState, raw_batch, key):
        k_proc, _ = jax.random.split(key)
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
        new_state = TrainState(
            step=state.step + 1,
            params=new_params,
            batch_stats=new_bs,
            opt_state=new_opt,
        )
        return new_state, metrics

    return train_step


def make_eval_step(model, spec_loss, params_cfg, processor) -> Callable:
    def eval_step(state: TrainState, raw_batch):
        inputs, targets = processor(None, raw_batch)
        out = model.apply(
            {"params": state.params, "batch_stats": state.batch_stats}, inputs, train=False
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
        )
        self.processor = spec.make_processor(params_cfg, train=True)
        self.log_every = log_every
        self.checkpoint_every = checkpoint_every
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
            state = create_train_state(self.model, self.cfg, self.tx, sample)
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
        from itertools import islice

        from cvm_tpu.data.loader import prefetch_to_device

        last: Dict[str, float] = {}
        t0 = time.perf_counter()
        steps_in_window = 0
        batches = prefetch_to_device(islice(data_iter, num_steps), self._batch_sh)
        for raw in batches:
            self.key, sub = jax.random.split(self.key)
            self.state, metrics = self.train_step(self.state, raw, sub)
            step = int(self.state.step)
            steps_in_window += 1
            if step % self.log_every == 0 or step == 1:
                last = {k: float(v) for k, v in metrics.items()}
                dt = time.perf_counter() - t0
                t0 = time.perf_counter()
                last["steps_per_sec"] = steps_in_window / max(dt, 1e-9)
                steps_in_window = 0
                if self.metrics_writer is not None:
                    self.metrics_writer.write(step, last)
            if self.ckpt is not None and step % self.checkpoint_every == 0:
                self.ckpt.save(step, self.state)
        if self.ckpt is not None:
            self.ckpt.wait()
        return last
