"""Evidence durability (scripts/collect_results.py): completed runs are
immutable — a relaunch must mirror under its own run id and never downgrade
a mirror whose recorded progress is ahead (VERDICT r4 weak #2 / #3: the
round-4 working tree had an in-progress relaunch clobbering the completed
flagship run's tracked artifacts)."""

import importlib.util
import json
import os

import pytest


@pytest.fixture(scope="module")
def cr():
    path = os.path.join(os.path.dirname(__file__), "..", "scripts",
                        "collect_results.py")
    spec = importlib.util.spec_from_file_location("collect_results", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _write_metrics(path, start_ts, steps):
    with open(path, "w") as f:
        for s in steps:
            f.write(json.dumps({"step": s, "ts": start_ts + s, "loss": 1.0})
                    + "\n")


def test_run_id_from_first_ts(cr, tmp_path):
    a = tmp_path / "a.jsonl"
    b = tmp_path / "b.jsonl"
    _write_metrics(a, 1787200000.0, [100, 200])
    _write_metrics(b, 1787290000.0, [100])
    assert cr._metrics_run_id(str(a)) != cr._metrics_run_id(str(b))
    # A resume APPENDS — same first line, same id.
    _write_metrics(a, 1787200000.0, [100, 200, 300])
    id1 = cr._metrics_run_id(str(a))
    _write_metrics(a, 1787200000.0, [100, 200, 300, 400])
    assert cr._metrics_run_id(str(a)) == id1


def test_mirror_never_downgrades_same_run(cr, tmp_path):
    src = tmp_path / "flagship_512"
    snap = tmp_path / "snap"
    (src / "best").mkdir(parents=True)
    snap.mkdir()
    _write_metrics(src / "metrics.jsonl", 1787200000.0, [1000, 5000])
    (src / "best" / "best.json").write_text(
        json.dumps({"metric": "mAP", "step": 5000, "value": 0.9}))
    cr._mirror_run(str(src), str(snap))
    mirrors = sorted(os.listdir(snap))
    assert len(mirrors) == 2  # metrics + best, run-id keyed
    assert all("@" in m for m in mirrors)

    # Same run id, source truncated behind the mirror → REFUSED.
    _write_metrics(src / "metrics.jsonl", 1787200000.0, [1000])
    logged = []
    cr._mirror_run(str(src), str(snap), log=logged.append)
    assert any("REFUSING" in m for m in logged)
    m = [f for f in mirrors if f.endswith("metrics.jsonl")][0]
    assert cr._metrics_progress(str(snap / m)) == 5000

    # Same run id, source AHEAD (a resume) → upgraded in place.
    _write_metrics(src / "metrics.jsonl", 1787200000.0, [1000, 5000, 6000])
    cr._mirror_run(str(src), str(snap))
    assert cr._metrics_progress(str(snap / m)) == 6000
    assert len(os.listdir(snap)) == 2


def test_relaunch_mirrors_separately(cr, tmp_path):
    src = tmp_path / "flagship_512"
    snap = tmp_path / "snap"
    src.mkdir()
    snap.mkdir()
    _write_metrics(src / "metrics.jsonl", 1787200000.0, [1000, 5000])
    cr._mirror_run(str(src), str(snap))
    # Fresh relaunch in the same workdir: new first ts → NEW mirror entry;
    # the completed run's mirror survives untouched.
    _write_metrics(src / "metrics.jsonl", 1787290000.0, [100])
    cr._mirror_run(str(src), str(snap))
    metrics = [f for f in os.listdir(snap) if f.endswith("metrics.jsonl")]
    assert len(metrics) == 2
    assert {cr._metrics_progress(str(snap / f)) for f in metrics} == {5000, 100}


def test_in_progress_vs_failed_status(cr, tmp_path, monkeypatch):
    out = tmp_path / "measure"
    out.mkdir()
    (out / "live_step.log").write_text('{"metric": "x", "value": 1}\n')
    stale = out / "dead_step.log"
    stale.write_text("boom\n")
    old = os.path.getmtime(stale) - 7200
    os.utime(stale, (old, old))
    monkeypatch.chdir(tmp_path)
    cr.main(["--out", str(out)])
    md = (out / "RESULTS.md").read_text()
    assert "live_step — IN PROGRESS" in md
    assert "dead_step — FAILED/partial" in md
