"""LR-range finder: suggestion heuristic (fast) + real sweep (slow)."""

import json

import numpy as np
import pytest

from cvm_tpu.train.lr_find import exp_range_schedule, suggest_from_curve


def test_exp_range_schedule_endpoints():
    s = exp_range_schedule(1e-6, 1.0, 100)
    assert s(0) == pytest.approx(1e-6)
    assert s(99) == pytest.approx(1.0)
    assert s(50) > s(10)
    with pytest.raises(ValueError):
        exp_range_schedule(1.0, 1e-6, 100)


def test_suggestion_on_canonical_curve():
    """Classic sweep shape: flat tail, steep descent, valley, divergence.
    The suggestion must land inside the descending region, before the
    minimum, and the min-loss pick at the valley."""
    lrs = list(np.logspace(-6, 0, 120))
    log = np.log10(lrs)
    # loss: 5.0 flat until lr~1e-4, linear descent to 1.0 at lr~1e-2,
    # then explodes.
    loss = np.where(log < -4, 5.0, np.where(log < -2, 5.0 + (log + 4) * -2.0, 1.0 + (log + 2) * 8.0))
    picks = suggest_from_curve(lrs, list(loss))
    assert 1e-5 < picks["suggestion"] <= 2e-2, picks
    assert picks["lr_steepest"] <= picks["lr_min_loss"] * 1.5
    # valley is near 1e-2
    assert 1e-3 < picks["lr_min_loss"] < 1e-1


def test_suggestion_rejects_tiny_input():
    with pytest.raises(ValueError):
        suggest_from_curve([1e-3], [1.0])


@pytest.mark.slow
def test_cli_sweep_runs_and_suggests(tmp_path, capsys):
    from cvm_tpu.cli.lr_find import main

    curve = str(tmp_path / "curve.jsonl")
    rc = main([
        "--model", "semseg", "--data", "synthetic",
        "--num_steps", "24", "--lr_min", "1e-5", "--lr_max", "0.5",
        "--pad_hw", "48,48", "--curve_out", curve,
        "--input_hw", "[32,32]", "--num_classes", "3", "--backbone", "tiny",
        "--decoder_features", "16", "--class_weights", "[1,1,1]",
        "--batch_size", "8",
    ])
    assert rc == 0
    out = capsys.readouterr().out.strip().splitlines()[-1]
    res = json.loads(out)
    assert 1e-5 <= res["suggestion"] <= 0.5
    assert res["steps_run"] >= 12  # may stop early on divergence, not sooner
    with open(curve) as f:
        rows = [json.loads(ln) for ln in f]
    assert len(rows) == res["steps_run"]
    assert all(np.isfinite(r["lr"]) for r in rows)
