"""Experiment tracking: structured JSONL + optional MLflow adapter.

Replaces the reference's MLflow logging + save-to-storage callbacks
(SURVEY.md §5 "Metrics / logging"): file-based JSONL works headless; the
MLflow adapter is optional and only activates if mlflow is importable.
"""

from __future__ import annotations

import json
import os
import time
from typing import Dict, Optional


class JsonlMetricsWriter:
    def __init__(self, path: str):
        self.path = path
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        self._f = open(path, "a", buffering=1)

    def write(self, step: int, metrics: Dict[str, float]) -> None:
        rec = {"step": step, "ts": time.time()}
        rec.update({k: float(v) for k, v in metrics.items()})
        self._f.write(json.dumps(rec) + "\n")

    def close(self) -> None:
        self._f.close()


class MultiWriter:
    """Fan a metrics stream out to several writers (JSONL + TB + MLflow)."""

    def __init__(self, *writers):
        self.writers = [w for w in writers if w is not None]

    def write(self, step: int, metrics: Dict[str, float]) -> None:
        for w in self.writers:
            w.write(step, metrics)

    def write_image(self, step: int, tag: str, rgb) -> None:
        for w in self.writers:
            if hasattr(w, "write_image"):  # TB only; JSONL/MLflow skip
                w.write_image(step, tag, rgb)

    def close(self) -> None:
        for w in self.writers:
            w.close()


class MlflowAdapter:
    """Optional MLflow bridge; no-op if mlflow is unavailable."""

    def __init__(self, experiment: str, run_name: Optional[str] = None, params: Optional[dict] = None):
        self._mlflow = None
        try:
            import mlflow  # type: ignore

            self._mlflow = mlflow
            mlflow.set_experiment(experiment)
            mlflow.start_run(run_name=run_name)
            if params:
                mlflow.log_params(params)
        except Exception:
            self._mlflow = None

    def write(self, step: int, metrics: Dict[str, float]) -> None:
        if self._mlflow is not None:
            self._mlflow.log_metrics({k: float(v) for k, v in metrics.items()}, step=step)

    def close(self) -> None:
        if self._mlflow is not None:
            self._mlflow.end_run()
