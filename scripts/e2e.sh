#!/usr/bin/env bash
# Full product loop on realistic-FORMAT data through the public CLIs
# (VERDICT r1 item 4; call stacks per SURVEY.md §3.1/§3.3/§3.5):
#
#   gen_dataset (COCO json / KITTI layout)
#     → cli.pack        (upload-script analogue)
#     → cli.train       (--data *.cvrec, --eval_every: loader → jitted step)
#     → cli.export      (StableHLO artifact; det leg exports yuv420)
#     → ServingModel    (codeless runtime, real packed batch)
#     → metric gate     (non-toy mAP / mIoU or the script fails)
#
# Runs on CPU by default (CI); CVM_PLATFORM=axon uses the real chip.
# Tunables: E2E_STEPS_DET / E2E_STEPS_SEG / E2E_IMAGES / E2E_WORKDIR.
set -euo pipefail
cd "$(dirname "$0")/.."

export CVM_PLATFORM="${CVM_PLATFORM:-cpu}"
if [ "$CVM_PLATFORM" = "cpu" ]; then
  # Fast XLA compiles for the tiny CI configs (same as tests/conftest.py).
  export JAX_DISABLE_MOST_OPTIMIZATIONS="${JAX_DISABLE_MOST_OPTIMIZATIONS:-1}"
fi

WORK="${E2E_WORKDIR:-$(mktemp -d /tmp/cvm_e2e.XXXXXX)}"
STEPS_DET="${E2E_STEPS_DET:-400}"
STEPS_SEG="${E2E_STEPS_SEG:-300}"
IMAGES="${E2E_IMAGES:-96}"
cleanup() { [ -z "${E2E_WORKDIR:-}" ] && rm -rf "$WORK" || true; }
trap cleanup EXIT
echo "[e2e] workdir=$WORK platform=$CVM_PLATFORM"

echo "== leg 1: detection (COCO-format -> pack -> train -> export yuv420 -> serve) =="
python scripts/gen_dataset.py --format coco --out "$WORK/coco" --images "$IMAGES" --hw 96,96
python -m cvm_tpu.cli.pack --dataset coco --src "$WORK/coco" --out "$WORK/coco.cvrec" --split val2017
python -m cvm_tpu.cli.train --model centernet --data "$WORK/coco.cvrec" \
  --steps "$STEPS_DET" --eval_every "$STEPS_DET" --eval_batches 6 \
  --workdir "$WORK/det" --pad_hw 96,96 --log_every 100 --checkpoint_every "$STEPS_DET" \
  --input_hw "[64,64]" --num_classes 3 --max_objects 8 --backbone tiny \
  --neck_features 32 --head_features 16 --batch_size 8 --top_k 20 \
  --learning_rate 0.001 --warmup_steps 20 --total_steps "$STEPS_DET"
python -m cvm_tpu.cli.evaluate --model centernet --workdir "$WORK/det" \
  --data "$WORK/coco.cvrec" --split val --batches 6 --pad_hw 96,96 \
  --json_out "$WORK/det/eval.json"
python -m cvm_tpu.cli.export --model centernet \
  --checkpoint_dir "$WORK/det/checkpoints" --out "$WORK/det_artifact" \
  --batch_size 4 --input_format yuv420
python scripts/check_e2e.py --workdir "$WORK/det" --artifact "$WORK/det_artifact" \
  --data "$WORK/coco.cvrec" --metric val_mAP --min "${E2E_MIN_MAP:-0.30}" --pad_hw 96,96

echo "== leg 2: semseg (KITTI layout -> pack -> train -> export -> serve) =="
python scripts/gen_dataset.py --format kitti_semseg --out "$WORK/ksem" --images "$IMAGES" --hw 96,96
python -m cvm_tpu.cli.pack --dataset kitti_semseg --src "$WORK/ksem" --out "$WORK/ksem.cvrec"
python -m cvm_tpu.cli.train --model semseg --data "$WORK/ksem.cvrec" \
  --steps "$STEPS_SEG" --eval_every "$STEPS_SEG" --eval_batches 6 \
  --workdir "$WORK/seg" --pad_hw 96,96 --log_every 100 --checkpoint_every "$STEPS_SEG" \
  --input_hw "[64,64]" --num_classes 19 --backbone tiny --decoder_features 16 \
  --class_weights "[1,1,1,1,1,1,1,1,1,1,1,1,1,1,1,1,1,1,1]" \
  --batch_size 8 --learning_rate 0.001 --warmup_steps 20 --total_steps "$STEPS_SEG"
python -m cvm_tpu.cli.export --model semseg \
  --checkpoint_dir "$WORK/seg/checkpoints" --out "$WORK/seg_artifact" --batch_size 4
python scripts/check_e2e.py --workdir "$WORK/seg" --artifact "$WORK/seg_artifact" \
  --data "$WORK/ksem.cvrec" --metric val_miou --min "${E2E_MIN_MIOU:-0.50}" --pad_hw 96,96

echo "[e2e] ALL LEGS OK"
