#!/usr/bin/env bash
# Probe-loop watcher: captures the on-chip measurement backlog at the FIRST
# healthy tunnel window without a human in the loop (VERDICT r3 #1/#7 —
# degraded windows have outlasted whole work sessions; a one-shot queue
# misses the recovery).
#
#   nohup scripts/measure_watch.sh > runs/watch.log 2>&1 &
#
# Loop: probe (subprocess, bounded). Healthy (<10 ms/dispatch) -> touch
# runs/MEASURING (so concurrent host-heavy work can yield), run the resumable
# measure_all.sh; exit when every step has an .ok marker. Degraded -> sleep
# and re-probe. State files under runs/: PROBE_LAST (ms + timestamp),
# MEASURING (lock while a session is active).
set -uo pipefail
cd "$(dirname "$0")/.."
export PYTHONPATH="$PWD:${PYTHONPATH:-}"

INTERVAL="${WATCH_INTERVAL_S:-600}"
OUT="${MEASURE_OUT:-runs/measure}"
mkdir -p runs "$OUT"

probe_ms() {
  # Hold runs/PROBING (pid) so scripts/host_heavy.sh pauses host-heavy work
  # during the probe — a probe sharing the single core with a test suite or
  # e2e run reads falsely degraded/stalled and can miss a real window.
  # The persistent flagship trainer shares the CHIP as well: SIGSTOP it for
  # the probe's duration or its in-flight dispatches queue ahead of the
  # probe matmul and every window reads falsely degraded.
  echo "$$" > runs/PROBING
  local out fpid="" state
  fpid="$(cat runs/FLAGSHIP_RUNNING 2>/dev/null || true)"
  if [[ -n "$fpid" ]] && kill -0 "$fpid" 2>/dev/null; then
    # Already-stopped = another measurer's pause transaction; never CONT a
    # trainer we did not STOP (it would wake mid-way through their timing
    # window). fpid stays empty so the CONT below is skipped too.
    state="$(ps -o stat= -p "$fpid" 2>/dev/null || true)"
    if [[ "$state" == T* ]]; then
      fpid=""
    else
      kill -STOP "$fpid" 2>/dev/null || fpid=""
      sleep 3  # let its ~8-deep in-flight window drain off the chip
    fi
  else
    fpid=""
  fi
  out="$(timeout 180 python - <<'EOF' 2>/dev/null | tail -1
import sys
sys.path.insert(0, ".")
from bench import _probe_once
print(_probe_once())
EOF
)"
  [[ -n "$fpid" ]] && kill -CONT "$fpid" 2>/dev/null
  rm -f runs/PROBING
  echo "$out"
}

lock_live() { # <path> — pid-stamped lock liveness (stale pid = not live)
  local p
  [[ -e "$1" ]] || return 1
  p="$(cat "$1" 2>/dev/null || true)"
  [[ -z "$p" ]] && return 0
  kill -0 "$p" 2>/dev/null
}

# The flagship accuracy run is owned by scripts/flagship_persist.sh — ungated
# (a train-to-eval result is valid at any relay speed; the old accuracy tier's
# gate-then-launch sequence kept losing the oscillating tunnel). The watcher
# supervises it: restart a dead loop, and SIGCONT an orphaned-SIGSTOP trainer
# (a measurement step pauses it; a SIGKILLed measurer could leave it frozen).
ensure_flagship() {
  [[ -e "$OUT/flagship_512.ok" ]] && return 0
  local p run_pid state
  run_pid="$(cat runs/FLAGSHIP_RUNNING 2>/dev/null || true)"
  if [[ -n "$run_pid" ]] && kill -0 "$run_pid" 2>/dev/null; then
    state="$(ps -o stat= -p "$run_pid" 2>/dev/null || true)"
    if [[ "$state" == T* ]] && ! lock_live runs/MEASURING \
        && ! lock_live runs/BENCH_RUNNING; then
      echo "$(date -Is) flagship pid $run_pid orphaned in SIGSTOP — resuming"
      kill -CONT "$run_pid" 2>/dev/null || true
    fi
  fi
  # Any live persist loop (centernet's runs/FLAGSHIP_PERSIST or a variant
  # like runs/FLAGSHIP_SEMSEG_PERSIST) blocks spawning another: two trainers
  # on the one chip + single host core corrupt each other AND both write
  # runs/FLAGSHIP_RUNNING, breaking SIGSTOP coordination.
  for f in runs/FLAGSHIP_PERSIST runs/FLAGSHIP_*_PERSIST; do
    [[ -e "$f" ]] || continue
    p="$(cat "$f" 2>/dev/null || true)"
    [[ -n "$p" ]] && kill -0 "$p" 2>/dev/null && return 0
  done
  echo "$(date -Is) starting persistent flagship run (scripts/flagship_persist.sh)"
  nohup bash scripts/flagship_persist.sh >> runs/flagship_persist.log 2>&1 &
}

while true; do
  # Driver priority: never dispatch a probe (or STOP/CONT the trainer)
  # while the driver's bench.py is mid-measurement.
  if lock_live runs/BENCH_RUNNING; then
    echo "$(date -Is) driver bench running — skipping this probe cycle"
    sleep "$INTERVAL"
    continue
  fi
  ensure_flagship
  # Mirror whatever evidence exists into the git-tracked snapshot dir every
  # cycle (cheap log parse): runs/ is ephemeral across workspace resets.
  # Log (don't discard) the collector's output: a persistent mirroring
  # failure must be auditable, not silent (ADVICE r4 low).
  python scripts/collect_results.py --out "$OUT" --snapshot \
    > runs/SNAPSHOT_LAST 2>&1 || echo "$(date -Is) snapshot FAILED rc=$?" >> runs/SNAPSHOT_LAST
  ms="$(probe_ms || true)"
  ms="${ms:-inf}"
  echo "$(date -Is) probe=${ms} ms/dispatch" | tee -a runs/PROBE_LAST
  # Timing tier: <10 ms/dispatch = timing-grade window, run the full queue.
  # Anything else -> 'compile': compile RPCs are served even when every
  # EXECUTION probe hangs (verified 2026-08-19 probe=inf and again
  # 2026-08-20 probe=5-17 s — the round-5 fused-kernel rows were captured
  # manually in exactly such a window while this tier sat at 'none').
  # The attempt is bounded (timeout 2400) and skipped once .ok exists.
  tier="$(python -c "
m='$ms'
try:
    v = float(m)
    print('full' if v < 10.0 else 'compile')
except ValueError:
    print('compile')
")"
  if [[ "$tier" == "full" ]]; then
    echo "$(date -Is) tunnel HEALTHY — starting measurement session"
    # measure_all.sh holds runs/MEASURING per STEP (its own pid + trap
    # cleanup), so the driver's bench.py waits out a step, not the session.
    if MEASURE_OUT="$OUT" bash scripts/measure_all.sh; then
      python scripts/collect_results.py --out "$OUT" --snapshot || true
      echo "$(date -Is) ALL steps captured — watcher done"
      exit 0
    fi
    # Partial evidence is still evidence: mirror whatever landed into the
    # git-tracked snapshot dir so a workspace reset cannot destroy it.
    python scripts/collect_results.py --out "$OUT" --snapshot || true
    echo "$(date -Is) some steps FAILED (window closed?) — will retry"
  elif [[ "$tier" == "compile" && ! -e "$OUT/roofline_tpu.ok" ]]; then
    # Alive-but-degraded window: timing is garbage but compile RPCs serve.
    # Capture the TPU-LOWERED roofline (real fusion/bytes for DESIGN §9b's
    # serving-variant ablation) — compile-only, zero steps dispatched.
    echo "$(date -Is) tunnel ALIVE (degraded, ${ms} ms) — capturing TPU-lowered roofline"
    echo "$$" > runs/MEASURING
    if timeout 2400 python benchmarks/roofline.py --tpu --configs B \
        --out runs/roofline_tpu.json > "$OUT/roofline_tpu.log" 2>&1; then
      touch "$OUT/roofline_tpu.ok"
      echo "$(date -Is) TPU roofline captured -> runs/roofline_tpu.json"
    else
      echo "$(date -Is) TPU roofline attempt failed (window closed?) — will retry"
    fi
    rm -f runs/MEASURING
  fi
  sleep "$INTERVAL"
done
