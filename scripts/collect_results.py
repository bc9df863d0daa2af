"""Collect the measurement session's outputs into one auditable file.

``python scripts/collect_results.py [--out runs/measure]``

Every queue step (scripts/measure_all.sh) writes a log under runs/measure/;
the benchmarks inside emit JSON lines. This gathers, per step: captured
JSON records, OK/FAILED status (the ``.ok`` marker), and the remeasure
pre/post probes — emitting ``RESULTS.json`` + a human ``RESULTS.md`` next
to the logs. The doc tables (PARITY.md "Benchmark surface", DESIGN.md §9)
are then updated FROM this file, so every number in the repo traces to one
timestamped capture (VERDICT r3 #1 "single-source the results").
"""

from __future__ import annotations

import argparse
import json
import os
import re
import shutil
import sys
import time
from typing import Any, Dict, List


def parse_log(path: str) -> Dict[str, Any]:
    records: List[Dict[str, Any]] = []
    probes: Dict[str, float] = {}
    eval_lines: List[str] = []
    with open(path, errors="replace") as f:
        for line in f:
            line = line.strip()
            m = re.match(r"\[remeasure\] (pre|post)-probe: ([0-9.]+)", line)
            if m:
                probes[m.group(1)] = float(m.group(2))
            if "[cvm_tpu] eval" in line:
                eval_lines.append(line)
            if line.startswith("{"):
                try:
                    d = json.loads(line)
                except ValueError:
                    continue
                if isinstance(d, dict):
                    records.append(d)
    return {"records": records, "probes": probes, "eval_lines": eval_lines}


def _metrics_run_id(path: str) -> str:
    """Stable id for a training run = its FIRST metrics line's timestamp.

    A resume appends to the same metrics.jsonl (same first ts → same id), so
    a longer file legitimately refreshes that run's mirror; a fresh relaunch
    starts a new file (new first ts → new id) and mirrors SEPARATELY instead
    of clobbering the completed run's evidence (VERDICT r4 weak #2)."""
    try:
        with open(path, errors="replace") as f:
            for line in f:
                line = line.strip()
                if line.startswith("{"):
                    ts = json.loads(line).get("ts")
                    if ts:
                        return time.strftime("%Y%m%dT%H%M%SZ",
                                             time.gmtime(float(ts)))
    except (OSError, ValueError):
        pass
    return "unknown"


def _metrics_progress(path: str) -> int:
    """max step recorded in a metrics.jsonl (0 when unreadable) — the
    no-downgrade comparison key for same-run-id mirrors."""
    step = 0
    try:
        with open(path, errors="replace") as f:
            for line in f:
                line = line.strip()
                if line.startswith("{"):
                    try:
                        step = max(step, int(json.loads(line).get("step", 0)))
                    except (ValueError, TypeError):
                        continue
    except OSError:
        pass
    return step


def _mirror_run(src_dir: str, snap: str, log=print) -> None:
    """Mirror one training workdir's evidence, keyed by run id, refusing to
    downgrade: a mirror whose recorded progress is ahead of the source is
    left untouched (completed runs are immutable — VERDICT r4 #3)."""
    metrics = os.path.join(src_dir, "metrics.jsonl")
    if not os.path.exists(metrics):
        return
    run_id = _metrics_run_id(metrics)
    if run_id == "unknown":
        return  # no first step logged yet — nothing worth mirroring
    base = f"{os.path.basename(src_dir.rstrip('/'))}@{run_id}"
    dst_metrics = os.path.join(snap, f"{base}_metrics.jsonl")
    if os.path.exists(dst_metrics):
        have, new = _metrics_progress(dst_metrics), _metrics_progress(metrics)
        if new < have:
            log(f"REFUSING to downgrade {dst_metrics} "
                f"(mirror step {have} > source step {new})")
            return
    shutil.copy2(metrics, dst_metrics)
    best = os.path.join(src_dir, "best", "best.json")
    if os.path.exists(best):
        shutil.copy2(best, os.path.join(snap, f"{base}_best.json"))


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--out", default="runs/measure")
    parser.add_argument(
        "--snapshot", nargs="?", const="benchmarks/data/results", default=None,
        help="also mirror RESULTS.json/.md (plus flagship metrics files) "
             "into this git-TRACKED directory. runs/ is gitignored AND "
             "ephemeral — the 2026-08-20 workspace reset destroyed every "
             "on-disk artifact of the 2026-08-19 captures; evidence that "
             "is not committed does not survive a round boundary.")
    args = parser.parse_args(argv)
    out = args.out
    if not os.path.isdir(out):
        raise SystemExit(f"no measurement directory at {out}")

    steps: Dict[str, Any] = {}
    for name in sorted(os.listdir(out)):
        if not name.endswith(".log"):
            continue
        step = name[:-4]
        parsed = parse_log(os.path.join(out, name))
        parsed["ok"] = os.path.exists(os.path.join(out, f"{step}.ok"))
        mtime = os.path.getmtime(os.path.join(out, name))
        parsed["log_mtime"] = time.strftime(
            "%Y-%m-%dT%H:%M:%SZ", time.gmtime(mtime))
        # A step without its .ok marker is IN PROGRESS while its log is
        # still being written — labeling a live run "FAILED" misreports the
        # evidence (VERDICT r4 weak #2).
        parsed["in_progress"] = (not parsed["ok"]
                                 and time.time() - mtime < 900)
        steps[step] = parsed

    # Accuracy-tier artifacts live OUTSIDE the on-chip queue (they are valid
    # at any relay speed): deployed-numerics variant tables (runs/acc512*/)
    # and completed flagship train-to-eval runs (<workdir>/best/best.json).
    accuracy: Dict[str, Any] = {}
    import glob as _glob

    for d in sorted(_glob.glob("runs/acc512*")):
        if not os.path.isdir(d):
            continue
        table = {}
        for j in sorted(_glob.glob(os.path.join(d, "*.json"))):
            with open(j) as f:
                table[os.path.basename(j)[:-5]] = json.load(f)
        if table:
            accuracy[os.path.basename(d)] = table
    for best in sorted(_glob.glob("runs/flagship*/best/best.json")):
        with open(best) as f:
            accuracy[best] = json.load(f)

    result = {"collected_at": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
              "steps": steps, "accuracy_tier": accuracy}
    with open(os.path.join(out, "RESULTS.json"), "w") as f:
        json.dump(result, f, indent=2, sort_keys=True)

    lines = [f"# Measurement session results ({result['collected_at']})", ""]
    for step, p in steps.items():
        status = ("OK" if p["ok"]
                  else "IN PROGRESS" if p.get("in_progress")
                  else "FAILED/partial")
        probe = ", ".join(f"{k} {v:.1f} ms" for k, v in p["probes"].items())
        lines.append(f"## {step} — {status} ({p['log_mtime']}"
                     + (f"; probes: {probe}" if probe else "") + ")")
        lines.append("")
        for r in p["records"]:
            lines.append(f"- `{json.dumps(r, sort_keys=True)}`")
        for e in p["eval_lines"]:
            lines.append(f"- {e}")
        lines.append("")
    if accuracy:
        lines.append("## accuracy tier (CPU-valid, relay-independent)")
        lines.append("")
        for k, v in accuracy.items():
            lines.append(f"- `{k}`: `{json.dumps(v, sort_keys=True)}`")
        lines.append("")
    with open(os.path.join(out, "RESULTS.md"), "w") as f:
        f.write("\n".join(lines))
    print(f"wrote {out}/RESULTS.json and RESULTS.md "
          f"({len(steps)} steps, "
          f"{sum(1 for p in steps.values() if p['ok'])} ok)")

    if args.snapshot:
        snap = args.snapshot
        os.makedirs(snap, exist_ok=True)
        for name in ("RESULTS.json", "RESULTS.md"):
            shutil.copy2(os.path.join(out, name), os.path.join(snap, name))
        # Flagship training curves + kept-best evals are the accuracy-tier
        # evidence PARITY.md cites — mirror the small files whole, keyed by
        # run id so a relaunch never clobbers a completed run's mirror.
        for src_dir in sorted(_glob.glob("runs/flagship*")):
            if os.path.isdir(src_dir):
                _mirror_run(src_dir, snap)
        for src in sorted(_glob.glob("runs/roofline*.json")):
            shutil.copy2(src, os.path.join(snap, os.path.basename(src)))
        # Ad-hoc eval --json_out records land next to the step logs but
        # have no .log of their own — mirror them verbatim (tiny files).
        for src in sorted(_glob.glob(os.path.join(out, "*.json"))):
            if os.path.basename(src) != "RESULTS.json":
                shutil.copy2(src, os.path.join(snap, os.path.basename(src)))
        print(f"snapshot mirrored into {snap}/ (commit it: evidence under "
              f"runs/ does not survive a workspace reset)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
