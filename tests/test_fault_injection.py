"""Kill/restart fault injection (SURVEY.md §5 "fault injection = kill/restart
test in CI"; VERDICT r1 missing #5).

A child process trains with an async Orbax checkpoint dispatched every step
and is SIGKILLed immediately after a step completes — i.e. while the write is
typically still in flight. The claims proven here:

1. **Atomic swap**: after an uncontrolled kill, the checkpoint directory never
   yields a corrupt/partial checkpoint — `latest_step()` only ever points at a
   fully-committed step, and restoring it succeeds.
2. **Auto-resume**: a restarted process picks up from that committed step and
   continues training (twice, to prove crash→resume→crash→resume).
"""

import os
import signal
import subprocess
import sys
import time

import pytest

pytestmark = pytest.mark.slow  # SIGKILL/hang children re-exec + resume (~3 min)

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_CHILD = os.path.join(_REPO, "tests", "fault_child.py")


def _run_and_kill(ckdir: str, kill_after_steps: int, timeout: float = 180.0):
    """Start the child; SIGKILL it right after it reports `kill_after_steps`
    completed steps (past its resume point). Returns (resumed_from, last_step)."""
    env = dict(os.environ)
    env["PYTHONPATH"] = _REPO + os.pathsep + env.get("PYTHONPATH", "")
    proc = subprocess.Popen(
        [sys.executable, _CHILD, ckdir],
        stdout=subprocess.PIPE, stderr=subprocess.DEVNULL,
        text=True, env=env, cwd=_REPO,
    )
    resumed_from = None
    last_step = None
    seen = 0
    deadline = time.monotonic() + timeout

    # Read through a drained queue so the deadline fires even when the
    # child emits NOTHING (a blocked `for line in proc.stdout` would hang
    # the whole test session on a stalled child).
    import queue as _queue
    import threading

    lines: "_queue.Queue[str]" = _queue.Queue()
    threading.Thread(
        target=lambda: [lines.put(l) for l in proc.stdout], daemon=True
    ).start()

    def _lines_until_deadline():
        while True:
            remaining = deadline - time.monotonic()
            if remaining <= 0:
                raise TimeoutError("child made no progress before deadline")
            try:
                yield lines.get(timeout=min(remaining, 5.0))
            except _queue.Empty:
                continue

    try:
        for line in _lines_until_deadline():
            if line.startswith("RESUMED"):
                resumed_from = int(line.split()[1])
            elif line.startswith("STEP"):
                last_step = int(line.split()[1])
                seen += 1
                if seen >= kill_after_steps:
                    # Kill with the async save of `last_step` racing us.
                    proc.kill()
                    break
    finally:
        if proc.poll() is None:
            proc.kill()
        proc.wait(timeout=30)
    assert proc.returncode == -signal.SIGKILL
    assert resumed_from is not None and last_step is not None
    return resumed_from, last_step


def test_kill_mid_async_save_then_resume(tmp_path):
    from cvm_tpu.data.synthetic import synthetic_iterator
    from cvm_tpu.models import get_model
    from cvm_tpu.train.checkpoints import CheckpointManager
    from cvm_tpu.train.loop import Trainer

    ckdir = str(tmp_path / "ck")

    # Crash #1: fresh run killed after 3 steps (save of step 3 in flight).
    r0, s0 = _run_and_kill(ckdir, kill_after_steps=3)
    assert r0 == 0 and s0 >= 3

    # The directory must already be usable: latest_step points at a committed
    # checkpoint no newer than the last completed step.
    spec = get_model("semseg")
    p = spec.params_cls(
        input_hw=(32, 32), num_classes=3, backbone="tiny", decoder_features=16,
        class_weights=(1.0, 1.0, 1.0), warmup_steps=2, total_steps=100,
    )
    mngr = CheckpointManager(ckdir)
    k1 = mngr.latest_step()
    mngr.close()
    assert k1 is not None and 1 <= k1 <= s0

    # Crash #2: resume from the crashed directory, kill again mid-save.
    r1, s1 = _run_and_kill(ckdir, kill_after_steps=2)
    assert r1 == k1, f"child resumed from {r1}, committed latest was {k1}"
    assert s1 >= r1 + 2

    # Final restart in-process: restore must succeed (no partial/corrupt
    # checkpoint is ever selected) and training must continue from there.
    trainer = Trainer(spec, p, checkpoint_dir=ckdir, checkpoint_every=100,
                      log_every=1)
    it = synthetic_iterator(0, 8, (48, 48), num_classes=3)
    trainer.init_state(next(it))
    k2 = int(trainer.state.step)
    assert r1 <= k2 <= s1
    m = trainer.fit(it, 2)
    assert int(trainer.state.step) == k2 + 2
    import numpy as np

    assert np.isfinite(m["loss"])


def test_device_hang_auto_restart(tmp_path):
    """The stall watchdog must RECOVER from a hung device, not just warn.

    tests/hang_child.py blocks forever inside a train step on its first run
    (the observed backend failure mode); the Trainer was constructed with
    restart_argv, so the watchdog re-execs the child, which resumes from the
    latest checkpoint and finishes all steps (VERDICT r2 next-round #7).
    """
    child = os.path.join(_REPO, "tests", "hang_child.py")
    ckdir = str(tmp_path / "ck")
    env = dict(os.environ)
    env["PYTHONPATH"] = _REPO + os.pathsep + env.get("PYTHONPATH", "")
    env["CVM_STALL_THRESHOLD_S"] = "15"  # trip fast in CI, but above step time
    env.pop("CVM_RESTART_COUNT", None)
    # Don't inherit conftest's 8-virtual-device flag: on one CPU core it
    # makes a legitimate step slow enough to false-trip the short threshold.
    env.pop("XLA_FLAGS", None)
    proc = subprocess.run(
        [sys.executable, child, ckdir, "8"],
        capture_output=True, text=True, env=env, cwd=_REPO, timeout=300,
    )
    out, err = proc.stdout, proc.stderr
    assert "HANGING" in out, f"fake hang never armed:\n{out}\n{err}"
    assert "AUTO-RESTART 1/" in err, f"watchdog did not re-exec:\n{err}"
    # One process object, TWO process images: exec preserves the pid, so the
    # captured stdout contains both runs' lines.
    resumes = [int(l.split()[1]) for l in out.splitlines() if l.startswith("RESUMED")]
    assert len(resumes) == 2 and resumes[0] == 0 and resumes[1] >= 1, resumes
    assert proc.returncode == 0
    done = [int(l.split()[1]) for l in out.splitlines() if l.startswith("DONE")]
    assert done and done[-1] == 8, f"training did not reach 8 steps: {out}"
