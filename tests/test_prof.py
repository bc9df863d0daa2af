"""Profiling helpers smoke tests (CPU)."""

import glob
import os

import jax
import jax.numpy as jnp

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
