"""Tunnel-health-gated perf re-measurement runner.

The relay to the TPU chip has two failure modes that poison measurements
(CLAUDE.md "Environment gotchas"): extended degradation windows (dispatches
10-1000x the ~2 ms floor) and full stalls. bench.py guards its own headline;
this wraps ANY benchmark command with the same guard so ad-hoc re-measurement
runs (e.g. ``cli.benchmark --configs B --train``) inherit it:

  1. probe before (waits out degradation up to --max_wait seconds),
  2. run the command,
  3. probe after — if the tunnel is degraded NOW, the window likely went bad
     mid-run and the numbers are suspect; exit 3 so callers don't record them.

Usage (from the repo root, ambient axon TPU platform):

  python scripts/remeasure.py -- -m cvm_tpu.cli.benchmark --configs B --train
  python scripts/remeasure.py --max_wait 600 -- bench.py
"""

from __future__ import annotations

import argparse
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

DEGRADED_MS = 10.0  # healthy relay dispatch is ~2-4 ms


def main(argv=None):
    parser = argparse.ArgumentParser(
        description=__doc__, formatter_class=argparse.RawDescriptionHelpFormatter
    )
    parser.add_argument("--max_wait", type=float, default=1200.0,
                        help="seconds to wait for the tunnel to recover")
    parser.add_argument("--degraded_ms", type=float, default=DEGRADED_MS,
                        help="probe threshold to accept (ms/dispatch). Keep "
                             "the default for PERF numbers; ACCURACY runs "
                             "(train-to-eval) may relax it — degradation "
                             "slows them without poisoning the result")
    parser.add_argument("--no_post", action="store_true",
                        help="skip the post-run probe: for ACCURACY runs "
                             "(train-to-eval), where a mid-run degraded "
                             "window costs wall time but does not poison the "
                             "result the way it poisons a perf number")
    parser.add_argument("cmd", nargs=argparse.REMAINDER,
                        help="command after -- : either a script path or "
                             "-m module args, run under this interpreter")
    args = parser.parse_args(argv)
    cmd = [c for c in args.cmd if c != "--"]
    if not cmd:
        parser.error("no command given (pass it after --)")

    from bench import _tunnel_health_probe, _probe_once  # noqa: E402

    thr = args.degraded_ms
    pre_ms = _tunnel_health_probe(max_wait_s=args.max_wait)
    print(f"[remeasure] pre-probe: {pre_ms:.2f} ms/dispatch", flush=True)
    if pre_ms == float("inf") or pre_ms > thr:
        print(f"[remeasure] tunnel degraded (> {thr} ms) after "
              f"{args.max_wait:.0f}s wait — refusing to measure", flush=True)
        return 2

    rc = subprocess.run([sys.executable] + cmd, cwd=REPO).returncode
    if rc != 0:
        print(f"[remeasure] command failed rc={rc}", flush=True)
        return rc

    if args.no_post:
        print("[remeasure] post-probe skipped (--no_post accuracy mode)",
              flush=True)
        return 0

    post_ms = _probe_once()
    print(f"[remeasure] post-probe: {post_ms:.2f} ms/dispatch", flush=True)
    if post_ms == float("inf") or post_ms > DEGRADED_MS:
        print("[remeasure] tunnel degraded AFTER the run — the measurement "
              "window may have gone bad mid-run; treat numbers as suspect",
              flush=True)
        return 3
    print("[remeasure] tunnel healthy before and after — numbers valid",
          flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
