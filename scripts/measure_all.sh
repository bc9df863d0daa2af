#!/usr/bin/env bash
# On-chip measurement session (run when the tunnel is HEALTHY). RESUMABLE:
# re-running with the same MEASURE_OUT skips steps that already produced
# trustworthy numbers (marker file <step>.ok), so the probe-loop watcher
# (scripts/measure_watch.sh) can fire it at every healthy window until the
# whole queue is captured (VERDICT r3 weak #7).
#
# Every step goes through scripts/remeasure.py, which probes the relay
# before AND after (exit 3 = window went bad mid-run; numbers are suspect
# and must not be recorded — CLAUDE.md "Environment gotchas"). Results
# land in $OUT (default runs/measure/), one log per step, plus a summary
# of which steps produced trustworthy numbers.
#
# Queue (VERDICT r2 #2/#3/#4, r3 #1/#3):
#   1. bench.py headline x3            (driver contract evidence)
#   2. w8a8_bench ablation             (bf16/fold_bn/w8a8_static/+both, HBM bytes)
#   3. cli.benchmark A-E infer         (replace stale round-1 table)
#   4. cli.benchmark B --train         (post fp32-heads-fix, post relay-aware fit)
#   5. dmds_accuracy (KITTI-raw)       (median-scaled delta1 for config E)
set -uo pipefail
cd "$(dirname "$0")/.."
export PYTHONPATH="$PWD:${PYTHONPATH:-}"
# Child bench.py steps must not treat this queue's own MEASURING lock as
# contention (they ARE the measurement session) — skip their coordination.
export CVM_BENCH_IN_QUEUE=1

OUT="${MEASURE_OUT:-runs/measure}"
mkdir -p "$OUT"
declare -A status
ALL_OK=1

# The driver's bench.py marks runs/BENCH_RUNNING while it measures; both
# sides sharing the single host core + chip would corrupt both numbers, and
# the driver has priority. Pause between steps while the mark is live; a
# mark whose pid is dead is stale (bench was SIGKILLed) and is cleared.
wait_for_bench() {
  local waited=0 budget="${BENCH_LOCK_WAIT_S:-1800}" tick="${BENCH_LOCK_TICK_S:-15}"
  local mark="${BENCH_MARK_PATH:-runs/BENCH_RUNNING}"
  while [[ -e "$mark" ]]; do
    local pid
    pid="$(cat "$mark" 2>/dev/null || true)"
    if [[ -n "$pid" ]] && ! kill -0 "$pid" 2>/dev/null; then
      echo "(stale BENCH_RUNNING pid=$pid — clearing)"
      rm -f "$mark"
      break
    fi
    if (( waited >= budget )); then
      echo "(bench still running after ${budget}s — proceeding)"
      break
    fi
    if (( waited == 0 )); then echo "(driver bench active — pausing queue)"; fi
    sleep "$tick"; waited=$((waited + tick))
  done
}

# runs/MEASURING is held around each STEP (not the whole session): the
# driver's bench.py waits a bounded budget on it, and a per-step lock means
# that wait can actually succeed between steps. The lock carries this
# script's pid so bench can detect a SIGKILLed session as stale; the trap
# covers every normal/TERM exit.
MEASURING_PATH="${MEASURING_PATH:-runs/MEASURING}"

# The persistent flagship run (scripts/flagship_persist.sh) shares the chip
# and the single host core. Timing-grade steps SIGSTOP it for the duration
# and SIGCONT it after — a paused trainer costs wall time only (its stall
# watchdog pauses with it; progress is checkpointed).
FLAGSHIP_PID_FILE="${FLAGSHIP_PID_FILE:-runs/FLAGSHIP_RUNNING}"
FLAGSHIP_PAUSED=""
flagship_pid() {
  local p
  p="$(cat "$FLAGSHIP_PID_FILE" 2>/dev/null || true)"
  [[ -n "$p" ]] && kill -0 "$p" 2>/dev/null && echo "$p"
}
pause_flagship() {
  local p state
  p="$(flagship_pid || true)"
  if [[ -n "$p" ]]; then
    # Already-stopped means another measurer owns the pause transaction —
    # do not take ownership or our resume_flagship would SIGCONT the
    # trainer into the middle of their timing window.
    state="$(ps -o stat= -p "$p" 2>/dev/null || true)"
    if [[ "$state" == T* ]]; then
      echo "(flagship pid $p already paused by another measurer)"
      return 0
    fi
    echo "(pausing flagship run pid $p for this step)"
    kill -STOP "$p" 2>/dev/null && FLAGSHIP_PAUSED="$p"
  fi
}
resume_flagship() {
  if [[ -n "$FLAGSHIP_PAUSED" ]]; then
    kill -CONT "$FLAGSHIP_PAUSED" 2>/dev/null
    FLAGSHIP_PAUSED=""
  fi
}
trap 'rm -f "$MEASURING_PATH"; [[ -n "$FLAGSHIP_PAUSED" ]] && kill -CONT "$FLAGSHIP_PAUSED" 2>/dev/null' EXIT

run() { # [REMEASURE_FLAGS=...] run <name> <max_wait> <cmd...>
        # (MEASURE_MAX_WAIT overrides max_wait, for tests)
  local name="$1" wait="${MEASURE_MAX_WAIT:-$2}"; shift 2
  # MEASURE_STEPS (space-separated names) restricts the session to a subset —
  # the watcher's accuracy tier runs ONLY the train-to-eval step during
  # moderately degraded windows. Skipped-by-filter is not a failure, but the
  # session is partial: report rc!=0 so the watcher keeps going.
  if [[ -n "${MEASURE_STEPS:-}" ]] && [[ " $MEASURE_STEPS " != *" $name "* ]]; then
    status[$name]="SKIPPED(filter)"
    ALL_OK=0
    return
  fi
  if [[ -e "$OUT/$name.ok" ]]; then
    status[$name]="OK(cached)"
    echo "== $name == already captured, skipping"
    return
  fi
  wait_for_bench
  pause_flagship
  echo "== $name =="
  echo "$$" > "$MEASURING_PATH"
  # shellcheck disable=SC2086 — REMEASURE_FLAGS is intentionally word-split
  if python scripts/remeasure.py --max_wait "$wait" ${REMEASURE_FLAGS:-} -- "$@" \
      > "$OUT/$name.log" 2>&1; then
    status[$name]=OK
    touch "$OUT/$name.ok"
  else
    status[$name]="FAILED(rc=$?)"
    ALL_OK=0
  fi
  rm -f "$MEASURING_PATH"
  resume_flagship
  tail -3 "$OUT/$name.log"
}

for i in 1 2 3; do
  run "bench_run$i" 900 bench.py
done
run "w8a8_ablation" 600 benchmarks/w8a8_bench.py --iters 20
run "infer_AE" 600 -m cvm_tpu.cli.benchmark --configs A,B,C,D,E --iters 20
run "train_B" 600 -m cvm_tpu.cli.benchmark --configs B --train --iters 20
# KITTI-raw parallax data (e2e leg-5 recipe at on-chip scale): synthetic_batch
# scenes cannot teach depth-from-motion (delta1 ~0.1-0.2 measured 2026-08-19),
# the gen_kitti_raw parallax scenes can (delta1 0.56 in 250 CPU steps).
run "dmds_accuracy" 900 benchmarks/dmds_accuracy.py --steps 1500

# Step 6 (VERDICT r3 #5): the flagship 512x512 train-to-eval accuracy run.
# Normally OWNED by scripts/flagship_persist.sh (ungated, resumes across
# windows — the gate-then-launch sequence kept losing the oscillating
# tunnel); when that loop is live this queue leaves the step to it. The
# gated path below remains as the standalone fallback.
flagship_persist_live() {
  local p
  p="$(cat "${FLAGSHIP_PERSIST_FILE:-runs/FLAGSHIP_PERSIST}" 2>/dev/null || true)"
  [[ -n "$p" ]] && kill -0 "$p" 2>/dev/null
}
if [[ ! -e "$OUT/flagship_512.ok" ]] && flagship_persist_live; then
  status[flagship_512]="EXTERNAL(persist-loop)"
  ALL_OK=0
else
  REMEASURE_FLAGS="--no_post ${FLAGSHIP_EXTRA_FLAGS:-}" run "flagship_512" 900 \
    -m cvm_tpu.cli.train --model centernet --data synthetic \
    --steps 5000 --eval_every 2500 --eval_batches 12 --keep_best mAP \
    --workdir runs/flagship_512 --pad_hw 512,512 \
    --checkpoint_every 500 --log_every 200 --auto_restart 3 \
    --num_classes 10 --max_objects 16 --batch_size 16 \
    --warmup_steps 250 --total_steps 5000
fi

echo; echo "== summary ($OUT) =="
for k in "${!status[@]}"; do echo "$k: ${status[$k]}"; done
[[ $ALL_OK -eq 1 ]] && exit 0 || exit 1
