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
# Tunables: E2E_STEPS_DET / E2E_STEPS_SEG / E2E_IMAGES / E2E_WORKDIR;
# E2E_LEGS="1 2" runs a subset of legs (default: all six).
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
LEGS="${E2E_LEGS:-1 2 3 4 5 6}"
leg() { case " $LEGS " in *" $1 "*) return 0;; *) return 1;; esac; }
cleanup() { [ -z "${E2E_WORKDIR:-}" ] && rm -rf "$WORK" || true; }
trap cleanup EXIT
echo "[e2e] workdir=$WORK platform=$CVM_PLATFORM legs=$LEGS"

if leg 1; then
echo "== leg 1: detection (COCO-format -> pack -> stats -> train -> export yuv420 -> serve) =="
python scripts/gen_dataset.py --format coco --out "$WORK/coco" --images "$IMAGES" --hw 96,96
python -m cvm_tpu.cli.pack --dataset coco --src "$WORK/coco" --out "$WORK/coco.cvrec" --split val2017
# Dataset statistics over the packed shard (class balance / size buckets);
# the record count must match what the pack reported.
python -m cvm_tpu.cli.stats --data "$WORK/coco.cvrec" --json | tee "$WORK/coco_stats.json"
python - "$WORK/coco_stats.json" "$IMAGES" <<'EOF'
import json, sys
s = json.load(open(sys.argv[1]))
assert s["records"] == int(sys.argv[2]), (s["records"], sys.argv[2])
assert s["boxes_total"] > 0 and s["box_classes"]
EOF
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
fi

if leg 2; then
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
# Flip TTA through the public eval CLI must hold the same mIoU bar (the
# merged program is a strict superset of the plain forward).
python -m cvm_tpu.cli.evaluate --model semseg --workdir "$WORK/seg" \
  --data "$WORK/ksem.cvrec" --split val --batches 6 --pad_hw 96,96 \
  --tta hflip --json_out "$WORK/seg/eval_tta.json"
python - "$WORK/seg/eval_tta.json" "${E2E_MIN_MIOU:-0.50}" <<'EOF'
import json, sys
m = json.load(open(sys.argv[1]))
assert m["miou"] >= float(sys.argv[2]), m
EOF
fi

if leg 3; then
echo "== leg 3: depth (KITTI proj_depth -> pack -> train -> export -> serve) =="
STEPS_DEPTH="${E2E_STEPS_DEPTH:-300}"
python scripts/gen_dataset.py --format kitti_depth --out "$WORK/kdep" --images "$IMAGES" --hw 96,96
python -m cvm_tpu.cli.pack --dataset kitti_depth --src "$WORK/kdep/images" \
  --depth_dir "$WORK/kdep/proj_depth" --out "$WORK/kdep.cvrec"
python -m cvm_tpu.cli.train --model depth --data "$WORK/kdep.cvrec" \
  --steps "$STEPS_DEPTH" --eval_every "$STEPS_DEPTH" --eval_batches 6 \
  --workdir "$WORK/dep" --pad_hw 96,96 --log_every 100 --checkpoint_every "$STEPS_DEPTH" \
  --input_hw "[64,64]" --backbone tiny --decoder_features 16 --num_scales 2 \
  --max_depth 45 --min_depth 1 --batch_size 8 \
  --learning_rate 0.001 --warmup_steps 20 --total_steps "$STEPS_DEPTH"
python -m cvm_tpu.cli.export --model depth \
  --checkpoint_dir "$WORK/dep/checkpoints" --out "$WORK/dep_artifact" --batch_size 4
python scripts/check_e2e.py --workdir "$WORK/dep" --artifact "$WORK/dep_artifact" \
  --data "$WORK/kdep.cvrec" --metric val_delta1 --min "${E2E_MIN_DELTA1:-0.50}" --pad_hw 96,96
fi

if leg 4; then
echo "== leg 4: multitask (fused KITTI -> pack -> train -> export -> serve; joint gates) =="
STEPS_MT="${E2E_STEPS_MT:-400}"
python scripts/gen_dataset.py --format kitti_multitask --out "$WORK/kmt" --images "$IMAGES" --hw 96,96
python -m cvm_tpu.cli.pack --dataset kitti_multitask --src "$WORK/kmt" --out "$WORK/kmt.cvrec"
python -m cvm_tpu.cli.train --model multitask --data "$WORK/kmt.cvrec" \
  --steps "$STEPS_MT" --eval_every "$STEPS_MT" --eval_batches 6 \
  --workdir "$WORK/mt" --pad_hw 96,96 --log_every 100 --checkpoint_every "$STEPS_MT" \
  --input_hw "[64,64]" --backbone tiny --neck_features 32 --head_features 16 \
  --num_det_classes 7 --max_objects 8 --top_k 20 \
  --num_seg_classes 19 --class_weights "[1,1,1,1,1,1,1,1,1,1,1,1,1,1,1,1,1,1,1]" \
  --max_depth 45 --min_depth 1 --batch_size 8 \
  --learning_rate 0.001 --warmup_steps 20 --total_steps "$STEPS_MT"
python -m cvm_tpu.cli.export --model multitask \
  --checkpoint_dir "$WORK/mt/checkpoints" --out "$WORK/mt_artifact" --batch_size 4
# Joint gates: every head must have learned (VERDICT r2 #5 "joint gates").
python scripts/check_e2e.py --workdir "$WORK/mt" --artifact "$WORK/mt_artifact" \
  --data "$WORK/kmt.cvrec" --metric val_mAP --min "${E2E_MIN_MT_MAP:-0.20}" --pad_hw 96,96
python scripts/check_e2e.py --workdir "$WORK/mt" --artifact "$WORK/mt_artifact" \
  --data "$WORK/kmt.cvrec" --metric val_miou --min "${E2E_MIN_MT_MIOU:-0.40}" --pad_hw 96,96
python scripts/check_e2e.py --workdir "$WORK/mt" --artifact "$WORK/mt_artifact" \
  --data "$WORK/kmt.cvrec" --metric val_delta1 --min "${E2E_MIN_MT_DELTA1:-0.45}" --pad_hw 96,96
fi

if leg 5; then
echo "== leg 5: dmds (KITTI raw drives -> pack two-frame -> train -> export -> serve) =="
STEPS_DMDS="${E2E_STEPS_DMDS:-250}"
python scripts/gen_dataset.py --format kitti_raw --out "$WORK/kraw" --images "$IMAGES" --hw 96,96
python -m cvm_tpu.cli.pack --dataset kitti_raw --src "$WORK/kraw" --out "$WORK/kraw.cvrec"
python -m cvm_tpu.cli.train --model dmds --data "$WORK/kraw.cvrec" \
  --steps "$STEPS_DMDS" --eval_every "$STEPS_DMDS" --eval_batches 6 \
  --workdir "$WORK/dmds" --pad_hw 96,96 \
  --log_every 10 --checkpoint_every "$STEPS_DMDS" \
  --input_hw "[64,64]" --backbone tiny --decoder_features 16 --motion_features 32 \
  --max_depth 45 --min_depth 1 --batch_size 8 \
  --learning_rate 0.0005 --warmup_steps 20 --total_steps "$STEPS_DMDS"
python -m cvm_tpu.cli.export --model dmds \
  --checkpoint_dir "$WORK/dmds/checkpoints" --out "$WORK/dmds_artifact" --batch_size 4
# Unsupervised: gate on measured photometric improvement over training...
python scripts/check_e2e.py --workdir "$WORK/dmds" --artifact "$WORK/dmds_artifact" \
  --data "$WORK/kraw.cvrec" --metric loss_photo --improve "${E2E_DMDS_IMPROVE:-0.10}" --pad_hw 96,96
# ...AND on accuracy: median-scaled delta1 of the unsupervised depth net vs
# the withheld parallax-consistent GT depth the generator emits (the standard
# monodepth protocol; the generated motion is fx*tx/z so the depth map is
# recoverable from two frames up to scale — VERDICT r3 #8).
python scripts/check_e2e.py --workdir "$WORK/dmds" --artifact "$WORK/dmds_artifact" \
  --data "$WORK/kraw.cvrec" --metric val_delta1 --min "${E2E_MIN_DMDS_DELTA1:-0.40}" --pad_hw 96,96
fi

if leg 6; then
echo "== leg 6: KITTI 3D (label_2+calib -> pack -> train with_3d -> export -> serve; 3D gate) =="
STEPS_3D="${E2E_STEPS_3D:-400}"
python scripts/gen_dataset.py --format kitti_object --out "$WORK/k3d" --images "$IMAGES" --hw 96,96
python -m cvm_tpu.cli.pack --dataset kitti --src "$WORK/k3d" --out "$WORK/k3d.cvrec"
python -m cvm_tpu.cli.train --model centernet --data "$WORK/k3d.cvrec" \
  --steps "$STEPS_3D" --eval_every "$STEPS_3D" --eval_batches 6 \
  --workdir "$WORK/det3d" --pad_hw 96,96 --log_every 100 --checkpoint_every "$STEPS_3D" \
  --input_hw "[64,64]" --num_classes 7 --with_3d true --max_objects 8 --backbone tiny \
  --neck_features 32 --head_features 16 --batch_size 8 --top_k 20 \
  --learning_rate 0.001 --warmup_steps 20 --total_steps "$STEPS_3D"
python -m cvm_tpu.cli.export --model centernet \
  --checkpoint_dir "$WORK/det3d/checkpoints" --out "$WORK/det3d_artifact" --batch_size 4
# matched_3d_frac first: center_err over ZERO matches is a vacuous 0.0 —
# require detections to actually match GT before trusting the error gate.
python scripts/check_e2e.py --workdir "$WORK/det3d" --artifact "$WORK/det3d_artifact" \
  --data "$WORK/k3d.cvrec" --metric val_matched_3d_frac --min "${E2E_MIN_MATCH3D:-0.5}" --pad_hw 96,96
python scripts/check_e2e.py --workdir "$WORK/det3d" --artifact "$WORK/det3d_artifact" \
  --data "$WORK/k3d.cvrec" --metric val_mAP --min "${E2E_MIN_MAP3D:-0.25}" --pad_hw 96,96
python scripts/check_e2e.py --workdir "$WORK/det3d" --artifact "$WORK/det3d_artifact" \
  --data "$WORK/k3d.cvrec" --metric val_center_err_3d_m --max "${E2E_MAX_CENTER3D:-6.0}" --pad_hw 96,96
fi

echo "[e2e] ALL LEGS OK ($LEGS)"
