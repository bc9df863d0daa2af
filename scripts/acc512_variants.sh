#!/usr/bin/env bash
# Deployed-numerics accuracy table on the FLAGSHIP 512x512 checkpoint
# (VERDICT r3 #3, accuracy half): score every export variant — bf16,
# fold_bn, weight-only int8, dynamic w8a8, calibrated static w8a8, and
# fold_bn+w8a8_static — with cli.evaluate's full mAP pipeline on the same
# held-out synthetic set. Accuracy is relay-speed-independent, so this runs
# on CPU (the timing half is benchmarks/w8a8_bench.py, queued on-chip).
#
#   scripts/host_heavy.sh scripts/acc512_variants.sh   # yields to probes
#
# Results: runs/acc512/<variant>.json + a printed summary table.
set -uo pipefail
cd "$(dirname "$0")/.."
export PYTHONPATH="$PWD:${PYTHONPATH:-}"
export CVM_PLATFORM=cpu

CK="${ACC512_CKPT:-runs/flagship_512/best}"
OUT="${ACC512_OUT:-runs/acc512}"
BATCHES="${ACC512_BATCHES:-6}"
mkdir -p "$OUT"

run_variant() { # <name> [extra evaluate args...]
  local name="$1"; shift
  if [[ -s "$OUT/$name.json" ]]; then
    echo "== $name: already captured, skipping"
    return 0
  fi
  echo "== $name ($(date -Is))"
  if ! timeout 3600 python -m cvm_tpu.cli.evaluate --model centernet \
      --checkpoint_dir "$CK" --data synthetic --batches "$BATCHES" \
      --pad_hw 512,512 --json_out "$OUT/$name.json" "$@" \
      --batch_size 8 > "$OUT/$name.log" 2>&1; then
    echo "   FAILED (see $OUT/$name.log)"
    rm -f "$OUT/$name.json"
    return 1
  fi
  tail -1 "$OUT/$name.log"
}

rc=0
run_variant bf16 || rc=1
run_variant fold_bn --fold_bn || rc=1
run_variant int8 --quantize int8 || rc=1
run_variant w8a8_dynamic --quantize w8a8 || rc=1
run_variant w8a8_static --quantize w8a8_static || rc=1
run_variant fold_w8a8_static --quantize w8a8_static --fold_bn || rc=1
run_variant tta_hflip --tta hflip || rc=1

echo
echo "== summary (mAP / mAP50 / mAP75) =="
python - <<'EOF'
import glob, json, os
out = os.environ.get("ACC512_OUT", "runs/acc512")
for p in sorted(glob.glob(f"{out}/*.json")):
    try:
        d = json.load(open(p))
    except ValueError:
        continue
    name = os.path.basename(p)[:-5]
    print(f"{name:18s} mAP={d.get('mAP', float('nan')):.4f} "
          f"mAP50={d.get('mAP50', float('nan')):.4f} "
          f"mAP75={d.get('mAP75', float('nan')):.4f}")
EOF
exit "$rc"
