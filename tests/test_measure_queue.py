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
        # bench's runs/BENCH_RUNNING mark, never touch the real
        # runs/MEASURING lock, and never see (or pause!) a real persistent
        # flagship run (tests override to rehearse the protocol).
        "BENCH_MARK_PATH": str(out_dir) + ".bench_running",
        "MEASURING_PATH": str(out_dir) + ".measuring",
        "FLAGSHIP_PID_FILE": str(out_dir) + ".flagship_running",
        "FLAGSHIP_PERSIST_FILE": str(out_dir) + ".flagship_persist",
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


def test_flagship_step_left_to_live_persist_loop(tmp_path):
    """A live scripts/flagship_persist.sh loop OWNS the flagship step: the
    queue must not double-run the 512x512 training (two trainers on one chip)
    but must still report the session partial so the watcher keeps retrying
    until the persist loop drops the .ok marker."""
    out = tmp_path / "measure"
    out.mkdir()
    for s in STEPS:
        if s != "flagship_512":
            (out / f"{s}.ok").touch()
    persist = tmp_path / "persist_pid"
    persist.write_text(str(os.getpid()))  # this test process: alive
    proc = _run(out, {"FLAGSHIP_PERSIST_FILE": str(persist)})
    assert proc.returncode != 0
    assert "flagship_512: EXTERNAL(persist-loop)" in proc.stdout, proc.stdout
    assert not (out / "flagship_512.ok").exists()
    # Once the persist loop records success, the queue reports cached-OK
    # and the session is complete (watcher exit condition).
    (out / "flagship_512.ok").touch()
    proc = _run(out, {"FLAGSHIP_PERSIST_FILE": str(persist)})
    assert proc.returncode == 0
    assert "flagship_512: OK(cached)" in proc.stdout


def test_steps_pause_and_resume_flagship_trainer(tmp_path):
    """Timing-grade steps SIGSTOP the persistent flagship trainer for their
    duration (chip + single-core contention would corrupt the measurement)
    and SIGCONT it after — it must never be left frozen."""
    import signal
    import subprocess as sp
    import sys as _sys

    out = tmp_path / "measure"
    _mostly_cached(out)
    sleeper = sp.Popen([_sys.executable, "-c", "import time; time.sleep(120)"])
    try:
        pidfile = tmp_path / "flagship_running"
        pidfile.write_text(str(sleeper.pid))
        proc = _run(out, {
            "CVM_BENCH_FAKE_PROBE_MS": "100",
            "FLAGSHIP_PID_FILE": str(pidfile),
        })
        assert f"pausing flagship run pid {sleeper.pid}" in proc.stdout, proc.stdout
        with open(f"/proc/{sleeper.pid}/stat") as f:
            state = f.read().split(")")[-1].split()[0]
        assert state != "T", "flagship trainer left SIGSTOPped by the queue"
    finally:
        sleeper.send_signal(signal.SIGCONT)
        sleeper.kill()
        sleeper.wait()


def test_persist_loop_relaunches_until_complete(tmp_path):
    """scripts/flagship_persist.sh: relaunch-on-exit loop converges — a
    failing attempt backs off and retries; an attempt that exits 0 with the
    best checkpoint recorded marks flagship_512.ok and cleans its pid files."""
    out = tmp_path / "measure"
    wd = tmp_path / "wd"
    out.mkdir()
    cnt = tmp_path / "cnt"
    env = dict(os.environ)
    env.update({
        "MEASURE_OUT": str(out),
        "FLAGSHIP_WORKDIR": str(wd),
        "FLAGSHIP_PERSIST_FILE": str(tmp_path / "persist_pid"),
        "FLAGSHIP_RUN_FILE": str(tmp_path / "run_pid"),
        "MEASURING_PATH": str(tmp_path / "measuring"),
        "BENCH_MARK_PATH": str(tmp_path / "bench_running"),
        "FLAGSHIP_BACKOFF_S": "1",
        "FLAGSHIP_MAX_ATTEMPTS": "5",
        # Attempt 1 crashes; attempt 2 "completes through eval" (exit 0 with
        # best.json present) — the loop's success condition, not just rc.
        "FLAGSHIP_TRAIN_CMD": (
            f'c=$(cat "{cnt}" 2>/dev/null || echo 0); c=$((c+1)); '
            f'echo $c > "{cnt}"; '
            f'if [ "$c" -ge 2 ]; then mkdir -p "{wd}/best"; '
            f'echo "{{}}" > "{wd}/best/best.json"; exit 0; fi; exit 1'
        ),
    })
    proc = subprocess.run(
        ["bash", os.path.join(REPO, "scripts", "flagship_persist.sh")],
        capture_output=True, text=True, timeout=120, env=env, cwd=REPO,
    )
    assert proc.returncode == 0, proc.stdout + proc.stderr
    assert (out / "flagship_512.ok").exists()
    assert "flagship attempt 2" in proc.stdout
    assert "COMPLETE (attempt 2)" in proc.stdout
    assert not (tmp_path / "persist_pid").exists()
    assert not (tmp_path / "run_pid").exists()


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
