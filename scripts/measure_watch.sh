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
  echo "$$" > runs/PROBING
  local out
  out="$(timeout 180 python - <<'EOF' 2>/dev/null | tail -1
import sys
sys.path.insert(0, ".")
from bench import _probe_once
print(_probe_once())
EOF
)"
  rm -f runs/PROBING
  echo "$out"
}

while true; do
  ms="$(probe_ms || true)"
  ms="${ms:-inf}"
  echo "$(date -Is) probe=${ms} ms/dispatch" | tee -a runs/PROBE_LAST
  # Tiers: full (<10 ms — timing-grade, every step) / accuracy (<300 ms —
  # a train-to-eval result is valid at any relay speed; only wall time
  # suffers, so don't let a never-healthy round lose the flagship mAP).
  tier="$(python -c "
m='$ms'
try:
    v = float(m)
    print('full' if v < 10.0 else ('accuracy' if v < 300.0 else 'none'))
except ValueError:
    print('none')
")"
  if [[ "$tier" == "full" ]]; then
    echo "$(date -Is) tunnel HEALTHY — starting measurement session"
    # measure_all.sh holds runs/MEASURING per STEP (its own pid + trap
    # cleanup), so the driver's bench.py waits out a step, not the session.
    if MEASURE_OUT="$OUT" bash scripts/measure_all.sh; then
      echo "$(date -Is) ALL steps captured — watcher done"
      exit 0
    fi
    echo "$(date -Is) some steps FAILED (window closed?) — will retry"
  elif [[ "$tier" == "accuracy" && ! -e "$OUT/flagship_512.ok" ]]; then
    echo "$(date -Is) tunnel usable (${ms} ms) — accuracy-tier: flagship run"
    MEASURE_OUT="$OUT" MEASURE_STEPS="flagship_512" \
      FLAGSHIP_EXTRA_FLAGS="--degraded_ms 300 --max_wait 60" \
      bash scripts/measure_all.sh || true
  fi
  sleep "$INTERVAL"
done
