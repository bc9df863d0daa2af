#!/usr/bin/env bash
# QAT→int8 artifact evidence session (VERDICT r4 #4): export the QAT
# fine-tuned flagship checkpoint as int8 artifacts and score each one with
# the full metric pipeline — "evaluate the converted artifact, not the
# training graph" (SURVEY.md §3.5). Resumable via per-step .ok markers.
#
# Run AFTER runs/flagship_512_qat completes (flagship_persist.sh variant).
# Accuracy-tier work: valid at any relay speed — no probe gate, but each
# step marks runs/MEASURING so timing-grade work stays out of the window.
set -uo pipefail
cd "$(dirname "$0")/.."
export PYTHONPATH="$PWD:${PYTHONPATH:-}"

OUT="${MEASURE_OUT:-runs/measure}"
CK="${QAT_CKPT:-runs/flagship_512_qat/best}"
PAD="${QAT_PAD:-512,512}"
BATCHES="${QAT_EVAL_BATCHES:-12}"
MEASURING_PATH="${MEASURING_PATH:-runs/MEASURING}"
mkdir -p "$OUT"
trap 'rm -f "$MEASURING_PATH"' EXIT

step() {
  local name="$1"; shift
  if [[ -e "$OUT/$name.ok" ]]; then
    echo "== $name == cached"
    return 0
  fi
  echo "== $name =="
  echo "$$" > "$MEASURING_PATH"
  if "$@" > "$OUT/$name.log" 2>&1; then
    touch "$OUT/$name.ok"
    tail -2 "$OUT/$name.log"
  else
    echo "$name FAILED rc=$? (log: $OUT/$name.log)"
    tail -3 "$OUT/$name.log"
  fi
  rm -f "$MEASURING_PATH"
}

# Conversion is a HOST job (CVM_PLATFORM=cpu: no tunnel dependency — an
# eager calibration over the relay measured 15+ min of silence in a
# degraded window); artifacts carry the platform check disabled, so the
# chip-side evals below load them directly. Scoring runs on the ambient
# (TPU) backend: one jitted program, the shape of work the tunnel handles
# even degraded (the QAT trainer held ~1 step/s through probe=inf).

# 1. The deployed int8 story: static-calibrated W8A8 artifact + score.
step qat_export_w8a8 env CVM_PLATFORM=cpu python -m cvm_tpu.cli.export \
  --model centernet \
  --checkpoint_dir "$CK" --out runs/export_qat_w8a8 --quantize w8a8 \
  --batch_size 16 --pad_hw "$PAD"
step qat_eval_w8a8_artifact python -m cvm_tpu.cli.evaluate \
  --artifact runs/export_qat_w8a8 --data synthetic --batches "$BATCHES" \
  --json_out "$OUT/qat_eval_w8a8_artifact.json"

# 2. The fused Mosaic-kernel artifact (TPU-only; its export selftest is the
#    first on-hardware EXECUTION of the kernel) + score.
step qat_export_w8a8_fused env CVM_PLATFORM=cpu python -m cvm_tpu.cli.export \
  --model centernet \
  --checkpoint_dir "$CK" --out runs/export_qat_w8a8_fused \
  --quantize w8a8_fused --batch_size 16 --pad_hw "$PAD"
step qat_eval_w8a8_fused_artifact python -m cvm_tpu.cli.evaluate \
  --artifact runs/export_qat_w8a8_fused --data synthetic \
  --batches "$BATCHES" --json_out "$OUT/qat_eval_w8a8_fused_artifact.json"

# 3. Baseline for the comparison: the FP artifact of the SAME QAT
#    checkpoint (what qat=True eval numerics promise to match) and the
#    fp-flagship artifact score is already recorded (mAP 0.9049, train-time
#    eval) — this pins the artifact-eval harness itself.
step qat_export_fp env CVM_PLATFORM=cpu python -m cvm_tpu.cli.export \
  --model centernet \
  --checkpoint_dir "$CK" --out runs/export_qat_fp \
  --batch_size 16 --pad_hw "$PAD"
step qat_eval_fp_artifact python -m cvm_tpu.cli.evaluate \
  --artifact runs/export_qat_fp --data synthetic --batches "$BATCHES" \
  --json_out "$OUT/qat_eval_fp_artifact.json"

python scripts/collect_results.py --out "$OUT" --snapshot || true
echo "== qat artifact session done =="
