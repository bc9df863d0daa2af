"""Preemption-safe training: SIGTERM checkpoints the current step and exits 0.

TPU pods are preemptible; schedulers deliver SIGTERM with a short grace
window. The reference's Keras loop dies mid-epoch and loses everything since
the last ModelCheckpoint. Here a child trainer is SIGTERMed mid-run well
BEFORE its first --checkpoint_every multiple; the claims proven:

1. The child exits 0 (clean preemption, not a crash) and reports the
   preemption step.
2. A checkpoint exists at that step — i.e. the preemption save fired, not
   just a periodic one.
3. A re-invocation with the same --workdir resumes from that step and runs
   to the --steps total.
"""

import json
import os
import signal
import subprocess
import sys
import time

import pytest

pytestmark = pytest.mark.slow  # subprocess trainers with XLA compiles

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _train_cmd(workdir: str, steps: int):
    return [
        sys.executable, "-m", "cvm_tpu.cli.train",
        "--model", "semseg", "--data", "synthetic",
        "--steps", str(steps), "--workdir", workdir,
        "--checkpoint_every", "100", "--log_every", "2",
        "--batch_size", "8", "--input_hw", "[32,32]", "--backbone", "tiny",
        "--decoder_features", "16", "--num_classes", "3",
        "--class_weights", "[1,1,1]", "--warmup_steps", "1",
        "--total_steps", "500",
    ]


def _child_env():
    env = dict(os.environ)
    env["PYTHONPATH"] = _REPO + os.pathsep + env.get("PYTHONPATH", "")
    env["CVM_PLATFORM"] = "cpu"
    env["JAX_DISABLE_MOST_OPTIMIZATIONS"] = "1"
    return env


def test_sigterm_checkpoints_current_step_and_resumes(tmp_path):
    wd = str(tmp_path / "wd")
    metrics = os.path.join(wd, "metrics.jsonl")
    proc = subprocess.Popen(
        _train_cmd(wd, steps=400), stdout=subprocess.PIPE,
        stderr=subprocess.STDOUT, text=True, env=_child_env(), cwd=_REPO,
    )
    # Drain the pipe CONTINUOUSLY: XLA's cpu_aot_loader warnings alone can
    # fill the 64K pipe buffer and block the child before its first step.
    import threading

    out_lines = []
    drain = threading.Thread(
        target=lambda: [out_lines.append(l) for l in proc.stdout], daemon=True)
    drain.start()
    try:
        # Wait until training demonstrably progresses (metrics.jsonl is
        # written every log_every=2 steps), then preempt.
        deadline = time.monotonic() + 900  # cold XLA compile on a loaded core
        while time.monotonic() < deadline:
            if os.path.exists(metrics) and len(open(metrics).readlines()) >= 2:
                break
            if proc.poll() is not None:
                pytest.fail(f"trainer died early:\n{''.join(out_lines)}")
            time.sleep(1.0)
        else:
            pytest.fail("trainer never reached step 4 before the deadline")
        proc.send_signal(signal.SIGTERM)
        proc.wait(timeout=180)
        drain.join(timeout=30)
        out = "".join(out_lines)
    finally:
        if proc.poll() is None:
            proc.kill()
            proc.wait(timeout=30)

    assert proc.returncode == 0, f"expected clean exit, got:\n{out}"
    assert "preempted at step" in out, out
    preempt_step = int(out.rsplit("preempted at step", 1)[1].split(":")[0])
    # Preempted long before the first periodic save at step 100, yet a
    # checkpoint exists at exactly the preemption step.
    assert 0 < preempt_step < 100
    from cvm_tpu.train.checkpoints import CheckpointManager

    assert CheckpointManager(os.path.join(wd, "checkpoints")).latest_step() \
        == preempt_step

    # Resume with a small total: picks up from the preemption step and
    # finishes the remainder.
    total = preempt_step + 4
    out2 = subprocess.run(
        _train_cmd(wd, steps=total), stdout=subprocess.PIPE,
        stderr=subprocess.STDOUT, text=True, env=_child_env(), cwd=_REPO,
        timeout=420,
    )
    assert out2.returncode == 0, out2.stdout
    assert f"start_step={preempt_step}" in out2.stdout
    assert "done:" in out2.stdout
    # log_every=2 guarantees at least one metrics line past the resume point.
    steps_logged = [json.loads(ln)["step"] for ln in open(metrics)]
    assert max(steps_logged) > preempt_step


def test_max_seconds_budget_stops_cleanly(tmp_path, capsys):
    """--max_seconds drives the same clean-stop path as SIGTERM: the step
    target is deliberately unreachable; the run must checkpoint whatever step
    it reached and exit 0."""
    from cvm_tpu.cli.train import main as train_main
    from cvm_tpu.train.checkpoints import CheckpointManager

    wd = str(tmp_path / "wd")
    rc = train_main([
        "--model", "semseg", "--data", "synthetic",
        "--steps", "1000000", "--workdir", wd,
        "--checkpoint_every", "1000000", "--log_every", "5",
        "--max_seconds", "6",
        "--batch_size", "8", "--input_hw", "[32,32]", "--backbone", "tiny",
        "--decoder_features", "16", "--num_classes", "3",
        "--class_weights", "[1,1,1]", "--warmup_steps", "1",
        "--total_steps", "500",
    ])
    assert rc == 0
    out = capsys.readouterr().out
    assert "preempted at step" in out
    step = CheckpointManager(os.path.join(wd, "checkpoints")).latest_step()
    assert step is not None and 0 < step < 1000000


def test_sigstop_pause_does_not_trigger_auto_restart(tmp_path):
    """The measurement queue SIGSTOPs host-heavy trainers during timing
    windows. Wall-clock quiet accumulated while suspended says nothing about
    the device, so the stall watchdog must NOT count it: before the
    suspension-detection fix, a paused run with --auto_restart re-exec'd
    itself on SIGCONT (wasting the restart budget and a compile). The child
    here runs with a 10 s stall threshold, is paused for 20 s mid-training,
    and must finish all steps with zero restarts."""
    wd = str(tmp_path / "wd")
    metrics = os.path.join(wd, "metrics.jsonl")
    cmd = _train_cmd(wd, steps=60) + ["--auto_restart", "2"]
    env = _child_env()
    env["CVM_STALL_THRESHOLD_S"] = "10"
    proc = subprocess.Popen(
        cmd, stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        env=env, cwd=_REPO,
    )
    import threading

    out_lines = []
    drain = threading.Thread(
        target=lambda: [out_lines.append(l) for l in proc.stdout], daemon=True)
    drain.start()
    try:
        deadline = time.monotonic() + 900
        while time.monotonic() < deadline:
            if os.path.exists(metrics) and len(open(metrics).readlines()) >= 2:
                break
            if proc.poll() is not None:
                pytest.fail(f"trainer died early:\n{''.join(out_lines)}")
            time.sleep(1.0)
        else:
            pytest.fail("trainer never started stepping before the deadline")
        # Suspend well past the 10 s stall threshold, then resume.
        proc.send_signal(signal.SIGSTOP)
        time.sleep(20.0)
        proc.send_signal(signal.SIGCONT)
        proc.wait(timeout=600)
        drain.join(timeout=30)
        out = "".join(out_lines)
    finally:
        if proc.poll() is None:
            proc.kill()
            proc.wait(timeout=30)

    assert proc.returncode == 0, f"expected clean finish, got:\n{out}"
    assert "re-exec'ing" not in out, f"spurious auto-restart after SIGCONT:\n{out}"
    assert "done:" in out, out
    steps_logged = [json.loads(ln)["step"] for ln in open(metrics)]
    assert max(steps_logged) == 60, steps_logged
