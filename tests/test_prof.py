"""Profiling helpers smoke tests (CPU)."""

import glob
import os

import jax
import jax.numpy as jnp
import pytest

from cvm_tpu.utils.prof import StepTimer, trace


def test_step_timer_sections():
    t = StepTimer()
    x = jnp.ones((64, 64))
    with t.section("mul", block_on=None):
        y = x * 2
    with t.section("sum", block_on=y):
        s = jnp.sum(y)
    jax.block_until_ready(s)
    summary = t.summary()
    assert set(summary) == {"mul", "sum"}
    assert all(v >= 0 for v in summary.values())
    assert "mul=" in t.report()


def test_trace_writes_files(tmp_path):
    d = str(tmp_path / "trace")
    with trace(d):
        jax.block_until_ready(jnp.dot(jnp.ones((128, 128)), jnp.ones((128, 128))))
    files = glob.glob(os.path.join(d, "**", "*"), recursive=True)
    assert any(os.path.isfile(f) for f in files), "no trace artifacts written"


@pytest.mark.slow
def test_cli_train_profile_steps(tmp_path):
    """cli.train --profile_steps captures a steady-state trace to
    <workdir>/trace and still completes the requested training steps."""
    from cvm_tpu.cli.train import main

    wd = str(tmp_path / "run")
    rc = main([
        "--model", "semseg", "--data", "synthetic", "--steps", "8",
        "--workdir", wd, "--pad_hw", "48,48", "--log_every", "4",
        "--checkpoint_every", "8", "--profile_steps", "3",
        "--input_hw", "[32,32]", "--num_classes", "3", "--backbone", "tiny",
        "--decoder_features", "16", "--class_weights", "[1,1,1]",
        "--batch_size", "8", "--warmup_steps", "2", "--total_steps", "8",
    ])
    assert rc == 0
    files = glob.glob(os.path.join(wd, "trace", "**", "*"), recursive=True)
    assert any(os.path.isfile(f) for f in files), "no trace artifacts written"
    # Training still reached the full step count (profiled steps included).
    import json

    with open(os.path.join(wd, "metrics.jsonl")) as f:
        last = json.loads(f.read().strip().splitlines()[-1])
    assert last["step"] == 8
