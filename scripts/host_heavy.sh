#!/usr/bin/env bash
# Run a host-heavy command that automatically pauses (SIGSTOP) while a live
# measurement session holds runs/MEASURING or runs/BENCH_RUNNING, resuming
# (SIGCONT) when the lock clears.
#
#   scripts/host_heavy.sh python -m pytest tests/ -q
#
# Why: the box has ONE core; host-heavy work running concurrently with an
# on-chip measurement triples host-side timings on both sides (CLAUDE.md).
# The measurement queue can fire at any healthy tunnel window
# (scripts/measure_watch.sh), so long-running host work needs to yield
# automatically, not by operator vigilance.
#
# Caveat: a paused test with its own wall-clock timeout (e.g. the Gloo 30 s
# rendezvous in test_multiprocess) may fail after a long pause — rerun it;
# that is still strictly better than corrupting a measurement window.
set -uo pipefail
cd "$(dirname "$0")/.."

# setsid makes the child a process-group leader so STOP/CONT reach the WHOLE
# tree — stopping only the wrapper script would leave its python children
# burning the single core straight through a measurement window.
setsid "$@" &
pid=$!
trap 'kill -TERM -- "-$pid" 2>/dev/null' TERM INT

stopped=0
while kill -0 "$pid" 2>/dev/null; do
  live=0
  for f in runs/MEASURING runs/BENCH_RUNNING runs/PROBING; do
    if [[ -e "$f" ]]; then
      p="$(cat "$f" 2>/dev/null || true)"
      if [[ -n "$p" ]] && kill -0 "$p" 2>/dev/null; then live=1; fi
    fi
  done
  if [[ "$live" == 1 && "$stopped" == 0 ]]; then
    kill -STOP -- "-$pid" 2>/dev/null
    stopped=1
    echo "[host_heavy] paused: measurement lock is live" >&2
  elif [[ "$live" == 0 && "$stopped" == 1 ]]; then
    kill -CONT -- "-$pid" 2>/dev/null
    stopped=0
    echo "[host_heavy] resumed" >&2
  fi
  sleep 5
done
wait "$pid"
