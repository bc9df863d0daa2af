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
from cvm_tpu.train import qat


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
            # QAT: trace the apply under the fake-quant interceptor so the
            # loss surface includes int8 rounding noise (train/qat.py).
            with qat.maybe_fake_quant(params_cfg):
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
        # Under QAT, eval through the same fake-quant path: the tracked
        # metrics then approximate the int8 serving artifact, not an fp
        # model that will never be deployed.
        with qat.maybe_fake_quant(params_cfg):
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
        restart_argv: Optional[list] = None,
        max_restarts: int = 3,
        tx=None,
    ):
        self.spec = spec
        self.cfg = params_cfg
        self.mesh = mesh if mesh is not None else make_mesh()
        from cvm_tpu.models.registry import build_model

        self.model = build_model(spec, params_cfg, mesh=self.mesh)
        # ``tx`` overrides the config-derived optimizer (used by the LR-range
        # finder, which sweeps learning rate with its own schedule).
        self.tx = tx if tx is not None else make_optimizer(
            params_cfg.learning_rate,
            params_cfg.total_steps,
            params_cfg.warmup_steps,
            params_cfg.weight_decay,
            grad_accum_steps=getattr(params_cfg, "grad_accum_steps", 1),
            lr_schedule=getattr(params_cfg, "lr_schedule", "warmup_cosine"),
            optimizer=getattr(params_cfg, "optimizer", "adamw"),
        )
        self.processor = spec.make_processor(params_cfg, train=True)
        self.log_every = log_every
        self.checkpoint_every = checkpoint_every
        self.seed = seed
        self.key = jax.random.PRNGKey(seed)
        # Auto-recovery from the observed indefinite-RPC-hang backend failure
        # (VERDICT r2 #7): when set, a device stall re-execs this command
        # (bounded by max_restarts via the CVM_RESTART_COUNT env var) and the
        # restarted process resumes from the latest checkpoint. Library users
        # keep the default None (warn-only) — re-exec is only safe when the
        # command is idempotent, which the CLIs are.
        self.restart_argv = restart_argv
        self.max_restarts = max_restarts
        # Preemption-safe stop (TPU pods are preemptible; the reference's
        # Keras loop dies mid-epoch on SIGTERM and loses progress since the
        # last ModelCheckpoint). request_stop() — typically from a SIGTERM
        # handler in cli.train — makes fit() finish the in-flight window,
        # checkpoint the CURRENT step, and return early.
        self._stop_requested = False

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
        with jax.default_device(jax.local_devices()[0]):
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
        if jax.process_count() > 1:
            # Multi-controller: a COMMITTED single-device array cannot be
            # device_put across hosts. Every process just computed the same
            # init (same seed), so round-trip through host memory and let
            # each controller place its addressable shards (init-time only).
            import numpy as _np

            state = jax.tree.map(_np.asarray, state)
        state = jax.device_put(state, self._state_sh)
        if self.ckpt is not None:
            restored = self._restore_compatible(state)
            if restored is not None:
                state = jax.device_put(restored, self._state_sh)
        self.state = state
        return state

    def _restore_compatible(self, state: TrainState) -> Optional[TrainState]:
        """restore_latest, tolerant of an ema_decay/checkpoint mismatch.

        Flipping ``ema_decay`` on a workdir whose checkpoints predate (or
        postdate) the EMA shadow changes the restore template's structure;
        a raw Orbax structure-mismatch error is unactionable. Retry with the
        other structure and reconcile: seed a missing shadow from the
        restored params, or drop a stale one.
        """
        import sys

        use_ema = getattr(self.cfg, "ema_decay", 0.0) > 0.0
        try:
            return self.ckpt.restore_latest(state)
        except Exception as e:
            try:
                if use_ema:
                    restored = self.ckpt.restore_latest(state.replace(ema_params={}))
                    if restored is not None:
                        print(
                            "[cvm_tpu] checkpoint predates ema_decay: seeding "
                            "the EMA shadow from the restored params",
                            file=sys.stderr, flush=True,
                        )
                        restored = restored.replace(
                            ema_params=jax.tree.map(jnp.copy, restored.params))
                else:
                    restored = self.ckpt.restore_latest(
                        state.replace(ema_params=state.params))
                    if restored is not None:
                        print(
                            "[cvm_tpu] checkpoint carries an EMA shadow but "
                            "ema_decay=0: dropping it",
                            file=sys.stderr, flush=True,
                        )
                        restored = restored.replace(ema_params={})
                return restored
            except Exception:
                raise e  # structure differs in some OTHER way — surface it

    def _maybe_auto_restart(self, quiet_s: float) -> None:
        """Device-stall recovery: re-exec ``restart_argv`` (bounded retries).

        The hung RPC cannot be interrupted from Python — exec replaces the
        whole process image, which is exactly the "kill and restart; the
        chip recovers immediately" remedy, automated. Progress since the
        last checkpoint is lost; the restarted process auto-resumes in
        init_state(). No-op unless both restart_argv and checkpointing are
        configured. Retry count crosses the exec via CVM_RESTART_COUNT.
        """
        import os
        import sys

        if self.restart_argv is None or self.ckpt is None:
            return
        count = int(os.environ.get("CVM_RESTART_COUNT", "0"))
        if count >= self.max_restarts:
            print(
                f"[cvm_tpu] device stalled again after {count} restarts — "
                "giving up on auto-recovery (persistent backend failure)",
                file=sys.stderr, flush=True,
            )
            return
        step = self.ckpt.latest_step()
        os.environ["CVM_RESTART_COUNT"] = str(count + 1)
        print(
            f"[cvm_tpu] AUTO-RESTART {count + 1}/{self.max_restarts}: device "
            f"stalled {quiet_s:.0f}s; re-exec'ing to resume from checkpoint "
            f"step {step}: {' '.join(self.restart_argv)}",
            file=sys.stderr, flush=True,
        )
        try:
            os.execv(self.restart_argv[0], self.restart_argv)
        except OSError as e:  # exec failed: fall back to warn-only behavior
            print(f"[cvm_tpu] auto-restart exec failed: {e}",
                  file=sys.stderr, flush=True)

    def request_stop(self) -> None:
        """Ask fit() to stop at the next step boundary (signal-handler safe:
        only sets a flag). fit() drains its in-flight window, checkpoints the
        current step, and returns; ``stop_requested`` stays True so callers
        running fit in chunks (cli.train --eval_every) know not to continue."""
        self._stop_requested = True

    @property
    def stop_requested(self) -> bool:
        return self._stop_requested

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
        # blocked wait in-thread, but we CAN (a) tell the operator which side
        # stalled — input pipeline vs device (ADVICE r2) — and (b) when a
        # restart command was provided, re-exec ourselves to resume from the
        # latest checkpoint (the SIGKILL fault-injection test proves resume;
        # this wires it to the observed failure mode, VERDICT r2 #7).
        import threading

        # heartbeat[1] flips True after the FIRST completed step: before
        # that, long quiet periods are normal (cold-cache XLA compiles take
        # minutes over a remote backend) and must not trigger kill advice.
        heartbeat = [time.monotonic(), False]
        # loop_stage: "await_batch" while blocked on the input iterator,
        # "stepping" from batch receipt until the next iteration — a stalled
        # loader and a stalled device look identical from step completions
        # alone but need opposite operator responses.
        loop_stage = ["await_batch"]
        done = threading.Event()
        stall_s = float(__import__("os").environ.get("CVM_STALL_THRESHOLD_S", "120"))

        def _watch():
            interval = min(30.0, stall_s / 2)
            last_wake = time.monotonic()
            while not done.wait(interval):
                now = time.monotonic()
                # Suspension detection: if THIS thread overslept its own
                # wait by a lot, the whole process was SIGSTOPped (the
                # measurement queue pauses host-heavy trainers during
                # timing windows) or the host froze. Wall-clock quiet
                # accumulated while suspended says nothing about the
                # device — swallowing it prevents a spurious auto-restart
                # on SIGCONT (observed: a paused CPU run reported "device/
                # backend looks stalled" after resume, 2026-08-19).
                if now - last_wake > interval + stall_s / 2:
                    heartbeat[0] = now
                    last_wake = now
                    continue
                last_wake = now
                quiet = now - heartbeat[0]
                threshold = stall_s if heartbeat[1] else 1800.0
                if quiet <= threshold:
                    continue
                import sys

                if not heartbeat[1]:
                    print(
                        f"[cvm_tpu] WARNING: first step still not finished "
                        f"in {quiet:.0f}s (cold XLA compile over a remote "
                        "backend can take minutes; stalled if it persists)",
                        file=sys.stderr, flush=True,
                    )
                elif loop_stage[0] == "await_batch":
                    print(
                        f"[cvm_tpu] WARNING: no input batch received in "
                        f"{quiet:.0f}s — the HOST input pipeline is starved "
                        "or blocked (device is idle; check the loader and "
                        "storage, restarting will not help)",
                        file=sys.stderr, flush=True,
                    )
                elif loop_stage[0] == "transfer":
                    # host→device transfer is an RPC over the same tunnel as
                    # execution — a hang here IS the device stall (ADVICE r3).
                    print(
                        f"[cvm_tpu] WARNING: host→device batch transfer not "
                        f"completed in {quiet:.0f}s — the device/backend "
                        "looks stalled mid-transfer",
                        file=sys.stderr, flush=True,
                    )
                    self._maybe_auto_restart(quiet)
                else:
                    print(
                        f"[cvm_tpu] WARNING: no training step completed in "
                        f"{quiet:.0f}s with input available — the device/"
                        "backend looks stalled",
                        file=sys.stderr, flush=True,
                    )
                    self._maybe_auto_restart(quiet)

        threading.Thread(target=_watch, daemon=True).start()
        resume_step = step  # restart-budget reset point (ADVICE r3)
        try:
            batches = prefetch_to_device(islice(data_iter, num_steps),
                                         self._batch_sh, stage=loop_stage)
            for raw in batches:
                loop_stage[0] = "stepping"
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
                    if step > resume_step:
                        # Checkpointed progress past the resume point: the
                        # auto-restart budget is per-stall, not per-job-
                        # lifetime — a run that legitimately recovered N
                        # times keeps its recovery (ADVICE r3).
                        __import__("os").environ.pop("CVM_RESTART_COUNT", None)
                if self._stop_requested:
                    # Preemption (SIGTERM): drain the in-flight window so the
                    # state is real, checkpoint the CURRENT step (not just the
                    # last checkpoint_every multiple), and return early.
                    while inflight:
                        inflight.popleft().block_until_ready()
                    if self.ckpt is not None and step % self.checkpoint_every:
                        self.ckpt.save(step, self.state)
                    break
                loop_stage[0] = "await_batch"
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
