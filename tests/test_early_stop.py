"""EarlyStopper unit behavior + cli.train --early_stop validation."""

import pytest

from cvm_tpu.train.early_stop import EarlyStopper


def test_stops_after_patience_non_improving_evals():
    s = EarlyStopper("mAP", patience=2, mode="max")
    assert not s.update({"mAP": 0.30})  # first value = baseline
    assert not s.update({"mAP": 0.40})  # improved
    assert not s.update({"mAP": 0.40})  # stale 1
    assert s.update({"mAP": 0.39})      # stale 2 -> stop
    assert s.best == 0.40


def test_improvement_resets_patience():
    s = EarlyStopper("mAP", patience=2, mode="max")
    s.update({"mAP": 0.30})
    assert not s.update({"mAP": 0.29})  # stale 1
    assert not s.update({"mAP": 0.35})  # improved, reset
    assert not s.update({"mAP": 0.34})  # stale 1 again
    assert s.update({"mAP": 0.33})      # stale 2 -> stop


def test_min_mode_and_min_delta():
    s = EarlyStopper("loss", patience=1, mode="min", min_delta=0.01)
    s.update({"loss": 1.0})
    # 0.995 is inside min_delta of the best -> NOT an improvement -> stop.
    assert s.update({"loss": 0.995})
    s2 = EarlyStopper("loss", patience=1, mode="min", min_delta=0.01)
    s2.update({"loss": 1.0})
    assert not s2.update({"loss": 0.90})  # real improvement
    assert s2.best == 0.90


def test_missing_metric_burns_no_patience():
    s = EarlyStopper("mAP", patience=1, mode="max")
    s.update({"mAP": 0.5})
    assert not s.update({})          # metric absent: no evidence either way
    assert not s.update({"miou": 1})
    assert s.update({"mAP": 0.4})    # real stagnation still stops


def test_invalid_args_rejected():
    with pytest.raises(ValueError):
        EarlyStopper("mAP", patience=0)
    with pytest.raises(ValueError):
        EarlyStopper("mAP", patience=1, mode="sideways")


def test_cli_requires_keep_best(tmp_path):
    from cvm_tpu.cli.train import main

    with pytest.raises(SystemExit):
        main([
            "--model", "semseg", "--data", "synthetic", "--steps", "1",
            "--workdir", str(tmp_path / "x"),
            "--eval_every", "1", "--early_stop", "2",
        ])
