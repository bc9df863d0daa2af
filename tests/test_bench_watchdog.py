"""bench.py must print ONE parseable JSON line no matter what the backend does.

Round 2's driver bench (BENCH_r02.json) was rc=124 with empty output: a
degraded-but-alive tunnel let the health probe burn its whole budget and the
measurement then ran at seconds-per-dispatch until the outer timeout killed
the process. These tests rehearse every failure mode through the real
bench.py entry point in a subprocess (VERDICT r2 next-round #1: "done = valid
JSON on stdout regardless of tunnel state").
"""

import json
import os
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BENCH = os.path.join(REPO, "bench.py")


def _run_bench(env_extra, timeout=480):
    # Generous vs the fake-probe fast path (seconds): when the suite runs
    # under scripts/host_heavy.sh, a live watcher probe SIGSTOPs pytest for
    # up to ~3 min while this child's wall clock keeps running — a tight
    # timeout here reads that external pause as a bench hang (flaked
    # 2026-08-20 at timeout=150).
    env = dict(os.environ)
    env.update(env_extra)
    # The subprocess must not inherit a TPU pin; CPU keeps it hermetic.
    env["JAX_PLATFORMS"] = "cpu"
    # Keep the queue-coordination marks out of the real runs/ directory
    # (a test bench must never pause a live measurement watcher).
    env.setdefault("CVM_BENCH_RUNS_DIR", tempfile.mkdtemp(prefix="benchruns"))
    proc = subprocess.run(
        [sys.executable, BENCH], capture_output=True, text=True,
        timeout=timeout, env=env,
    )
    return proc


def _parse_single_json_line(stdout):
    lines = [ln for ln in stdout.strip().splitlines() if ln.strip()]
    assert len(lines) == 1, f"expected exactly one output line, got: {lines!r}"
    return json.loads(lines[0])


def test_degraded_tunnel_reports_and_refuses():
    proc = _run_bench({
        "CVM_BENCH_FAKE_PROBE_MS": "120",
        "CVM_BENCH_PROBE_WAIT_S": "1",
        "CVM_BENCH_DEADLINE_S": "120",
    })
    assert proc.returncode == 0
    out = _parse_single_json_line(proc.stdout)
    assert out["value"] == 0.0
    assert "degraded" in out["error"]
    assert out["tunnel_probe_ms"] == 120.0
    assert out["metric"] == "centernet_512x512_e2e_images_per_sec_per_chip"


def test_stalled_tunnel_reports_and_refuses():
    proc = _run_bench({
        "CVM_BENCH_FAKE_PROBE_MS": "inf",
        "CVM_BENCH_PROBE_WAIT_S": "1",
        "CVM_BENCH_DEADLINE_S": "120",
    })
    assert proc.returncode == 0
    out = _parse_single_json_line(proc.stdout)
    assert out["value"] == 0.0
    assert "stalled" in out["error"]


def test_failure_line_carries_last_good(tmp_path):
    # VERDICT r3 next-round #2: a degraded tunnel at the driver's round-end
    # instant must not zero the evidence — the refusal line attaches the
    # last healthy measurement plus an explicit staleness field.
    cache = tmp_path / "last_good.json"
    cache.write_text(json.dumps({
        "result": {"metric": "centernet_512x512_e2e_images_per_sec_per_chip",
                   "value": 1050.0, "unit": "images/sec",
                   "vs_baseline": 12.3, "tunnel_probe_ms": 2.1},
        "saved_at_unix": 1_700_000_000.0,
        "saved_at": "2023-11-14T22:13:20+0000",
    }))
    proc = _run_bench({
        "CVM_BENCH_FAKE_PROBE_MS": "100",
        "CVM_BENCH_PROBE_WAIT_S": "1",
        "CVM_BENCH_DEADLINE_S": "120",
        "CVM_BENCH_LAST_GOOD_PATH": str(cache),
    })
    assert proc.returncode == 0
    out = _parse_single_json_line(proc.stdout)
    assert out["value"] == 0.0 and "degraded" in out["error"]
    assert out["last_good"]["value"] == 1050.0
    assert out["last_good_age_h"] > 0
    # Missing cache: the failure line simply omits the field (no crash).
    proc = _run_bench({
        "CVM_BENCH_FAKE_PROBE_MS": "100",
        "CVM_BENCH_PROBE_WAIT_S": "1",
        "CVM_BENCH_DEADLINE_S": "120",
        "CVM_BENCH_LAST_GOOD_PATH": str(tmp_path / "absent.json"),
    })
    out = _parse_single_json_line(proc.stdout)
    assert "last_good" not in out


def test_failure_line_lists_captured_queue_steps(tmp_path):
    """A refusal also points at runs/measure/*.ok — fresh on-chip evidence
    exists even though THIS instant was degraded."""
    runs = tmp_path / "runs"
    (runs / "measure").mkdir(parents=True)
    (runs / "measure" / "bench_run1.ok").touch()
    (runs / "measure" / "flagship_512.ok").touch()
    proc = _run_bench({
        "CVM_BENCH_FAKE_PROBE_MS": "100",
        "CVM_BENCH_PROBE_WAIT_S": "1",
        "CVM_BENCH_DEADLINE_S": "120",
        "CVM_BENCH_LAST_GOOD_PATH": str(tmp_path / "absent.json"),
        "CVM_BENCH_RUNS_DIR": str(runs),
    })
    out = _parse_single_json_line(proc.stdout)
    assert out["measure_steps_ok"] == ["bench_run1", "flagship_512"]


def test_failure_line_carries_flagship_accuracy(tmp_path):
    """The flagship train-to-eval result rides along BY VALUE: a timing
    refusal still shows the headline-resolution mAP the chip produced."""
    import json as _json

    runs = tmp_path / "runs"
    (runs / "flagship_512" / "best").mkdir(parents=True)
    (runs / "flagship_512" / "best" / "best.json").write_text(_json.dumps(
        {"metric": "mAP", "mode": "max", "value": 0.9049, "step": 5000}))
    proc = _run_bench({
        "CVM_BENCH_FAKE_PROBE_MS": "100",
        "CVM_BENCH_PROBE_WAIT_S": "1",
        "CVM_BENCH_DEADLINE_S": "120",
        "CVM_BENCH_LAST_GOOD_PATH": str(tmp_path / "absent.json"),
        "CVM_BENCH_RUNS_DIR": str(runs),
    })
    out = _parse_single_json_line(proc.stdout)
    assert out["flagship_512_best"] == {"metric": "mAP", "value": 0.9049,
                                        "step": 5000}


def test_measure_lock_wait_then_proceed_with_flag(tmp_path):
    # Mutual exclusion with the measurement queue: a live runs/MEASURING
    # lock makes bench wait its budget, then proceed with the contention
    # flagged in the output line (both sides on one host core corrupt both
    # numbers — the driver's bench has priority but must say so).
    runs = tmp_path / "runs"
    runs.mkdir()
    (runs / "MEASURING").write_text(str(os.getpid()))  # live pid: this test
    proc = _run_bench({
        "CVM_BENCH_RUNS_DIR": str(runs),
        "CVM_BENCH_MEASURE_LOCK_WAIT_S": "0.2",
        "CVM_BENCH_MEASURE_LOCK_TICK_S": "0.1",
        "CVM_BENCH_FAKE_PROBE_MS": "100",
        "CVM_BENCH_PROBE_WAIT_S": "1",
        "CVM_BENCH_DEADLINE_S": "120",
    })
    assert proc.returncode == 0
    out = _parse_single_json_line(proc.stdout)
    assert out["measuring_lock_seen"] is True
    assert "measurement queue active" in proc.stderr
    # The lock belongs to the queue; bench must not remove it.
    assert (runs / "MEASURING").exists()
    # Bench's own mark must be gone after a normal exit (atexit cleanup).
    assert not (runs / "BENCH_RUNNING").exists()


def test_measure_lock_stale_pid_cleared_no_wait(tmp_path):
    # A MEASURING lock whose pid is dead (watcher SIGKILLed mid-session)
    # must be cleared immediately, not waited on.
    runs = tmp_path / "runs"
    runs.mkdir()
    (runs / "MEASURING").write_text("999999")  # beyond pid_max defaults
    proc = _run_bench({
        "CVM_BENCH_RUNS_DIR": str(runs),
        "CVM_BENCH_MEASURE_LOCK_WAIT_S": "300",  # would time out the test
        "CVM_BENCH_FAKE_PROBE_MS": "100",
        "CVM_BENCH_PROBE_WAIT_S": "1",
        "CVM_BENCH_DEADLINE_S": "120",
    }, timeout=120)
    assert proc.returncode == 0
    out = _parse_single_json_line(proc.stdout)
    assert "measuring_lock_seen" not in out
    assert "stale MEASURING" in proc.stderr
    assert not (runs / "MEASURING").exists()


def test_bench_pauses_and_resumes_flagship_trainer(tmp_path):
    """The driver's bench SIGSTOPs a live persistent flagship trainer
    (runs/FLAGSHIP_RUNNING) for the measurement's duration and SIGCONTs it
    at exit — on every path, including an early refusal."""
    import signal
    import subprocess as sp

    runs = tmp_path / "runs"
    runs.mkdir()
    sleeper = sp.Popen([sys.executable, "-c", "import time; time.sleep(120)"])
    try:
        (runs / "FLAGSHIP_RUNNING").write_text(str(sleeper.pid))
        proc = _run_bench({
            "CVM_BENCH_RUNS_DIR": str(runs),
            "CVM_BENCH_FAKE_PROBE_MS": "100",
            "CVM_BENCH_PROBE_WAIT_S": "1",
            "CVM_BENCH_DEADLINE_S": "120",
        })
        assert proc.returncode == 0
        assert f"paused flagship trainer pid {sleeper.pid}" in proc.stderr
        with open(f"/proc/{sleeper.pid}/stat") as f:
            state = f.read().split(")")[-1].split()[0]
        assert state != "T", "bench left the flagship trainer SIGSTOPped"
    finally:
        sleeper.send_signal(signal.SIGCONT)
        sleeper.kill()
        sleeper.wait()


def test_deadline_watchdog_fires_during_hung_measurement(tmp_path):
    # A healthy probe lets measurement start; the CPU compile of the full
    # e2e program takes far longer than 6 s, so the deadline fires while the
    # main thread is busy inside jit — exactly the hung-RPC shape the
    # watchdog exists for. os._exit from the daemon timer must still leave
    # one valid line on stdout with rc 0.
    runs = tmp_path / "runs"
    proc = _run_bench({
        "CVM_BENCH_RUNS_DIR": str(runs),
        "CVM_BENCH_FAKE_PROBE_MS": "1.0",
        "CVM_BENCH_DEADLINE_S": "6",
    })
    assert proc.returncode == 0
    out = _parse_single_json_line(proc.stdout)
    assert "deadline" in out["error"]
    assert out["vs_baseline"] == 0.0
    # os._exit skips atexit — the watchdog path must still drop the
    # queue-coordination mark so the measurement queue is not paused on
    # a dead pid.
    assert not (runs / "BENCH_RUNNING").exists()
