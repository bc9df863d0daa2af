#!/usr/bin/env bash
# Persistent flagship accuracy run (VERDICT r3 #5): centernet 512x512 b16
# trained to 5000 steps through eval, on whatever tunnel quality exists.
#
# WHY NOT THE GATED QUEUE: a train-to-eval result is valid at any relay
# speed — slow windows cost wall time, not correctness — but the watcher's
# gate-then-launch sequence (probe OK -> remeasure pre-probe) kept losing
# the window because the tunnel oscillates between ~90 ms and stalled within
# a minute (runs/PROBE_LAST, 2026-08-19). So: NO health gate. Launch once,
# let checkpoints accumulate progress across windows, and relaunch on exit
# until the run completes (cli.train --steps is a TOTAL target, so every
# relaunch trains only the remainder).
#
# Coordination on the shared chip + single host core:
#   - runs/FLAGSHIP_PERSIST  — this loop's pid (watcher restarts a dead loop)
#   - runs/FLAGSHIP_RUNNING  — the live python pid; timing-grade work
#     (measure_all.sh steps, watcher probes, the driver's bench.py) SIGSTOPs
#     it for the duration of a measurement and SIGCONTs after
#   - between relaunches, waits while runs/MEASURING or runs/BENCH_RUNNING
#     is live (never START into someone's timing window)
#
# True device hangs are handled INSIDE the run (--auto_restart re-exec,
# resume from checkpoint); this outer loop only relaunches when the process
# exits (restart budget exhausted, crash, or completion without the final
# eval recorded). Env overrides exist so tests rehearse the loop hermetically.
set -uo pipefail
cd "$(dirname "$0")/.."
export PYTHONPATH="$PWD:${PYTHONPATH:-}"

OUT="${MEASURE_OUT:-runs/measure}"
NAME="${FLAGSHIP_NAME:-flagship_512}"  # controls the .ok/.log names
WORKDIR="${FLAGSHIP_WORKDIR:-runs/flagship_512}"
PIDFILE="${FLAGSHIP_PERSIST_FILE:-runs/FLAGSHIP_PERSIST}"
RUNFILE="${FLAGSHIP_RUN_FILE:-runs/FLAGSHIP_RUNNING}"
MEASURING_PATH="${MEASURING_PATH:-runs/MEASURING}"
BENCH_MARK_PATH="${BENCH_MARK_PATH:-runs/BENCH_RUNNING}"
MAX_ATTEMPTS="${FLAGSHIP_MAX_ATTEMPTS:-0}" # 0 = unbounded
mkdir -p runs "$OUT" "$WORKDIR"

# Degraded windows legitimately reach minutes-per-step; only a true wedge
# (no completed step for 10 min) should burn an auto-restart.
export CVM_STALL_THRESHOLD_S="${CVM_STALL_THRESHOLD_S:-600}"

lock_live() { # <path> — pid-stamped lock liveness (stale pid = not live)
  local p
  [[ -e "$1" ]] || return 1
  p="$(cat "$1" 2>/dev/null || true)"
  [[ -z "$p" ]] && return 0               # legacy touch-file: assume live
  kill -0 "$p" 2>/dev/null
}

if lock_live "$PIDFILE" && [[ "$(cat "$PIDFILE")" != "$$" ]]; then
  echo "$(date -Is) another persist loop is live (pid $(cat "$PIDFILE")) — exiting"
  exit 0
fi
echo "$$" > "$PIDFILE"
trap 'rm -f "$PIDFILE" "$RUNFILE"' EXIT

run_train() {
  # exec: the backgrounded subshell REPLACES itself with the trainer, so
  # $! (recorded in $RUNFILE) is the python pid itself — SIGSTOP/SIGCONT
  # from timing-grade work must reach the process that owns the chip, not
  # a wrapper. (cli.train's --auto_restart re-exec also preserves the pid.)
  if [[ -n "${FLAGSHIP_TRAIN_CMD:-}" ]]; then  # test hook
    exec bash -c "$FLAGSHIP_TRAIN_CMD"
  else
    exec python -m cvm_tpu.cli.train --model centernet --data synthetic \
      --steps 5000 --eval_every 2500 --eval_batches 12 --keep_best mAP \
      --workdir "$WORKDIR" --pad_hw 512,512 \
      --checkpoint_every 500 --log_every 100 --auto_restart 3 \
      --num_classes 10 --max_objects 16 --batch_size 16 \
      --warmup_steps 250 --total_steps 5000
  fi
}

attempt=0
while [[ ! -e "$OUT/$NAME.ok" ]]; do
  while lock_live "$MEASURING_PATH" || lock_live "$BENCH_MARK_PATH"; do
    sleep "${FLAGSHIP_LOCK_TICK_S:-15}"
  done
  attempt=$((attempt + 1))
  echo "$(date -Is) flagship attempt $attempt (resumes from latest checkpoint)"
  run_train >> "$OUT/$NAME.log" 2>&1 &
  pid=$!
  echo "$pid" > "$RUNFILE"
  wait "$pid"
  rc=$?
  rm -f "$RUNFILE"
  if [[ $rc -ge 128 ]]; then
    # Signal-killed (rc=137 observed repeatedly in round 4 with no recorded
    # cause): capture WHY — OOM-killer lines and host memory state — so the
    # ~35 min single-core re-warm each kill costs is at least explained
    # (VERDICT r4 weak #7).
    {
      echo "$(date -Is) attempt $attempt pid $pid killed by signal $((rc - 128)) (rc=$rc)"
      dmesg 2>/dev/null | grep -iE "oom|out of memory|killed process" | tail -10 \
        || echo "(no oom lines in dmesg / dmesg unavailable)"
      free -m 2>/dev/null | head -3
    } >> "$OUT/$NAME.killlog"
  fi
  if [[ $rc -eq 0 && -e "$WORKDIR/best/best.json" ]]; then
    echo "$(date -Is) flagship run COMPLETE (attempt $attempt)"
    touch "$OUT/$NAME.ok"
    exit 0
  fi
  echo "$(date -Is) flagship exited rc=$rc (best: $(ls "$WORKDIR/best" 2>/dev/null | tr '\n' ' ')) — relaunching after backoff"
  if [[ "$MAX_ATTEMPTS" != 0 && "$attempt" -ge "$MAX_ATTEMPTS" ]]; then
    echo "$(date -Is) attempt budget exhausted"
    exit 1
  fi
  sleep "${FLAGSHIP_BACKOFF_S:-120}"
done
echo "$(date -Is) flagship already captured — nothing to do"
