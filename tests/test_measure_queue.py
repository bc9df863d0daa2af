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
        # Hermetic by default: never pause a test run on the real driver
        # bench's runs/BENCH_RUNNING mark, and never touch the real
        # runs/MEASURING lock (tests override to rehearse the protocol).
        "BENCH_MARK_PATH": str(out_dir) + ".bench_running",
        "MEASURING_PATH": str(out_dir) + ".measuring",
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


def _mostly_cached(out_dir):
    """All steps pre-captured except bench_run1, so exactly one step
    exercises the wait_for_bench + remeasure path (fast under fake probe)."""
    out_dir.mkdir()
    for s in STEPS:
        if s != "bench_run1":
            (out_dir / f"{s}.ok").touch()


def test_measure_steps_filter_runs_only_named_step(tmp_path):
    """MEASURE_STEPS (the watcher's accuracy tier) runs ONLY the named step;
    everything else is SKIPPED(filter) and the session reports partial
    (exit != 0) even when the named step succeeds, so the full-tier watcher
    exit never triggers off a filtered session."""
    out = tmp_path / "measure"
    out.mkdir()
    (out / "flagship_512.ok").touch()  # the named step: cached OK
    proc = _run(out, {"MEASURE_STEPS": "flagship_512"})
    assert proc.returncode != 0
    assert proc.stdout.count("SKIPPED(filter)") == len(STEPS) - 1, proc.stdout
    assert "flagship_512: OK(cached)" in proc.stdout
    # No filtered step left an .ok marker behind.
    assert sorted(p.name for p in out.glob("*.ok")) == ["flagship_512.ok"]


def test_stale_bench_mark_is_cleared_and_queue_proceeds(tmp_path):
    # bench.py was SIGKILLed mid-measurement (or its watchdog hard-exited
    # before round 4's cleanup): the BENCH_RUNNING pid is dead, so the
    # queue must clear it and run rather than pause for the wait budget.
    out = tmp_path / "measure"
    _mostly_cached(out)
    mark = tmp_path / "BENCH_RUNNING"
    mark.write_text("999999")
    proc = _run(out, {
        "CVM_BENCH_FAKE_PROBE_MS": "100",
        "BENCH_MARK_PATH": str(mark),
        "BENCH_LOCK_WAIT_S": "300",  # would time out the test if waited
    })
    assert "stale BENCH_RUNNING pid=999999" in proc.stdout, proc.stdout
    assert not mark.exists()
    assert proc.stdout.count("FAILED") == 1, proc.stdout


def test_measuring_lock_is_per_step_and_cleaned_up(tmp_path):
    # The queue holds MEASURING around each step (pid-stamped) so the
    # driver's bounded wait can succeed between steps; after the queue
    # exits — even with FAILED steps — the lock must be gone (trap EXIT).
    out = tmp_path / "measure"
    _mostly_cached(out)
    lock = tmp_path / "MEASURING"
    proc = _run(out, {
        "CVM_BENCH_FAKE_PROBE_MS": "100",
        "MEASURING_PATH": str(lock),
    })
    assert proc.returncode != 0  # the one uncached step refused (degraded)
    assert not lock.exists()


def test_live_bench_mark_pauses_then_budget_expires(tmp_path):
    # A live driver bench holds the lock; with a zero wait budget the queue
    # logs that it is proceeding anyway (the real default waits 30 min).
    out = tmp_path / "measure"
    _mostly_cached(out)
    mark = tmp_path / "BENCH_RUNNING"
    mark.write_text(str(os.getpid()))  # this test process: alive
    proc = _run(out, {
        "CVM_BENCH_FAKE_PROBE_MS": "100",
        "BENCH_MARK_PATH": str(mark),
        "BENCH_LOCK_WAIT_S": "0",
    })
    assert "bench still running" in proc.stdout, proc.stdout
    assert mark.exists()  # the queue never removes a live driver's mark


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
