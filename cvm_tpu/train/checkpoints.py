"""Checkpoint manager: async Orbax saves with keep-N + exact resume.

Replaces the reference's save-model-each-epoch Keras callback (SURVEY.md §5
"Checkpoint / resume"): full train state (params / batch_stats / opt_state /
step) saved every N steps with atomic swap and async write; restart auto-
resumes from the latest step. Model hyperparameters are stored alongside as
JSON so a checkpoint is self-describing.
"""

from __future__ import annotations

import json
import os
from typing import Any, Optional

import jax
import orbax.checkpoint as ocp


class CheckpointManager:
    def __init__(self, directory: str, keep: int = 3, params_cfg=None):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self._mngr = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=keep,
                enable_async_checkpointing=True,
            ),
        )
        if params_cfg is not None:
            cfg_path = os.path.join(self.directory, "params.json")
            if not os.path.exists(cfg_path):
                with open(cfg_path, "w") as f:
                    f.write(params_cfg.to_json())

    def save(self, step: int, state: Any) -> None:
        self._mngr.save(step, args=ocp.args.StandardSave(state))

    def restore_latest(self, abstract_state: Any) -> Optional[Any]:
        """Restore the newest checkpoint shaped like ``abstract_state`` (or None)."""
        step = self._mngr.latest_step()
        if step is None:
            return None
        target = jax.tree.map(ocp.utils.to_shape_dtype_struct, abstract_state)
        return self._mngr.restore(step, args=ocp.args.StandardRestore(target))

    def latest_step(self) -> Optional[int]:
        return self._mngr.latest_step()

    def all_steps(self) -> list:
        """Steps on disk, ascending (bounded by keep-N)."""
        return sorted(self._mngr.all_steps())

    def restore_step(self, step: int, abstract_state: Any) -> Any:
        """Restore a SPECIFIC retained step shaped like ``abstract_state``."""
        target = jax.tree.map(ocp.utils.to_shape_dtype_struct, abstract_state)
        return self._mngr.restore(step, args=ocp.args.StandardRestore(target))

    def wait(self) -> None:
        self._mngr.wait_until_finished()

    def close(self) -> None:
        self._mngr.close()


class BestCheckpoint:
    """Keep the single best-by-eval-metric checkpoint (``--keep_best``).

    A second keep-1 manager under ``directory`` plus a ``best.json`` sidecar
    ({metric, value, step}) so the bar survives process restarts (including
    ``--auto_restart`` re-execs) and the artifact is self-describing for
    cli.evaluate / cli.export / cli.infer (params.json is written alongside,
    like any checkpoint dir).
    """

    def __init__(self, directory: str, metric: str, mode: str = "max",
                 params_cfg=None):
        assert mode in ("max", "min"), mode
        self.metric = metric
        self.mode = mode
        self._mngr = CheckpointManager(directory, keep=1, params_cfg=params_cfg)
        self._meta = os.path.join(self._mngr.directory, "best.json")
        self.best: Optional[float] = None
        if os.path.exists(self._meta):
            try:
                with open(self._meta) as f:
                    d = json.load(f)
                if d.get("metric") == metric and d.get("mode", "max") == mode:
                    # The sidecar is written as soon as the (async) save is
                    # ISSUED; a crash before the save finalized leaves a bar
                    # with no checkpoint behind it, which would silently
                    # block every reachable best from being recorded. Only
                    # honor a bar whose step actually exists on disk.
                    if self._mngr.latest_step() == int(d.get("step", -1)):
                        self.best = float(d["value"])
            except Exception:
                pass  # unreadable sidecar: start fresh rather than crash

    def update(self, step: int, state: Any, value: float) -> bool:
        """Save ``state`` iff ``value`` beats the stored best. Returns True
        when a new best was recorded."""
        value = float(value)
        better = self.best is None or (
            value > self.best if self.mode == "max" else value < self.best)
        if not better:
            return False
        self.best = value
        self._mngr.save(int(step), state)
        tmp = self._meta + ".tmp"
        with open(tmp, "w") as f:
            json.dump({"metric": self.metric, "mode": self.mode,
                       "value": value, "step": int(step)}, f)
        os.replace(tmp, self._meta)
        return True

    def wait(self) -> None:
        self._mngr.wait()


def load_params_cfg(directory: str, params_cls):
    """Rebuild the typed Params object stored next to the checkpoints."""
    with open(os.path.join(os.path.abspath(directory), "params.json")) as f:
        return params_cls.from_dict(json.load(f))
