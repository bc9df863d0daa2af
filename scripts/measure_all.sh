#!/usr/bin/env bash
# One-shot on-chip measurement session (run when the tunnel is HEALTHY).
#
# Every step goes through scripts/remeasure.py, which probes the relay
# before AND after (exit 3 = window went bad mid-run; numbers are suspect
# and must not be recorded — CLAUDE.md "Environment gotchas"). Results
# land in $OUT (default runs/measure_<date>/), one log per step, plus a
# summary of which steps produced trustworthy numbers.
#
# Queue (VERDICT r2 #2/#3/#4):
#   1. bench.py headline x3            (BENCH_r03 evidence, driver contract)
#   2. w8a8_bench ablation             (bf16/fold_bn/w8a8_static/+both, HBM bytes)
#   3. cli.benchmark A-E infer         (replace stale round-1 table)
#   4. cli.benchmark B --train         (post fp32-heads-fix, post relay-aware fit)
#   5. accuracy_demo dmds              (median-scaled delta1 for config E)
set -uo pipefail
cd "$(dirname "$0")/.."
export PYTHONPATH="$PWD:${PYTHONPATH:-}"

OUT="${MEASURE_OUT:-runs/measure_$(date +%Y%m%d_%H%M)}"
mkdir -p "$OUT"
declare -A status

run() { # run <name> <max_wait> <cmd...>
  local name="$1" wait="$2"; shift 2
  echo "== $name =="
  if python scripts/remeasure.py --max_wait "$wait" -- "$@" \
      > "$OUT/$name.log" 2>&1; then
    status[$name]=OK
  else
    status[$name]="FAILED(rc=$?)"
  fi
  tail -3 "$OUT/$name.log"
}

for i in 1 2 3; do
  run "bench_run$i" 900 bench.py
done
run "w8a8_ablation" 600 benchmarks/w8a8_bench.py --iters 20
run "infer_AE" 600 -m cvm_tpu.cli.benchmark --configs A,B,C,D,E --iters 20
run "train_B" 600 -m cvm_tpu.cli.benchmark --configs B --train --iters 20
run "dmds_accuracy" 900 benchmarks/accuracy_demo.py --model dmds --steps 1500

echo; echo "== summary ($OUT) =="
for k in "${!status[@]}"; do echo "$k: ${status[$k]}"; done
