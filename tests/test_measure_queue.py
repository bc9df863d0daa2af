"""Plumbing tests for the on-chip measurement queue (scripts/measure_all.sh).

The queue has one job: capture every backlog measurement during a healthy
tunnel window without a human in the loop (VERDICT r3 #1). A script bug
discovered DURING the window wastes it, so the control flow is rehearsed
here with the bench fake-probe hook: degraded tunnel -> every step refuses
and is recorded FAILED (exit nonzero, re-runnable); cached .ok markers ->
steps skip instantly and the queue exits 0.
"""

import os
import subprocess

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SCRIPT = os.path.join(REPO, "scripts", "measure_all.sh")
STEPS = ["bench_run1", "bench_run2", "bench_run3", "w8a8_ablation",
         "infer_AE", "train_B", "dmds_accuracy", "flagship_512"]


def _run(out_dir, extra_env):
    env = dict(os.environ)
    env.update({
        "MEASURE_OUT": str(out_dir),
        "MEASURE_MAX_WAIT": "1",
        "JAX_PLATFORMS": "cpu",
    })
    env.update(extra_env)
    return subprocess.run(
        ["bash", SCRIPT], capture_output=True, text=True, timeout=840,
        env=env, cwd=REPO,
    )


def test_all_ok_markers_skip_and_exit_zero(tmp_path):
    out = tmp_path / "measure"
    out.mkdir()
    for s in STEPS:
        (out / f"{s}.ok").touch()
    proc = _run(out, {})
    assert proc.returncode == 0, proc.stdout + proc.stderr
    assert proc.stdout.count("OK(cached)") == len(STEPS), proc.stdout


@pytest.mark.slow
def test_degraded_tunnel_marks_steps_failed_and_rerunnable(tmp_path):
    out = tmp_path / "measure"
    # Degraded probe: every remeasure-gated step must refuse (rc 2), be
    # recorded FAILED, leave a log, and NOT leave an .ok marker (so the
    # watcher re-attempts it at the next window).
    proc = _run(out, {"CVM_BENCH_FAKE_PROBE_MS": "100"})
    assert proc.returncode != 0
    for s in STEPS:
        assert os.path.exists(out / f"{s}.log"), s
        assert not os.path.exists(out / f"{s}.ok"), s
    assert proc.stdout.count("FAILED") >= len(STEPS), proc.stdout
    # A later re-run with two steps already captured skips exactly those.
    (out / "bench_run1.ok").touch()
    (out / "flagship_512.ok").touch()
    proc = _run(out, {"CVM_BENCH_FAKE_PROBE_MS": "100"})
    assert proc.returncode != 0
    assert proc.stdout.count("OK(cached)") == 2, proc.stdout
