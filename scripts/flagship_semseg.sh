#!/usr/bin/env bash
# Second flagship accuracy run: semseg at BASELINE config A's headline
# resolution (640x256, 5 classes, "small" backbone — the SemsegParams
# defaults), trained to 4000 steps through eval with --keep_best miou.
# Same persist-loop machinery as the centernet flagship: no health gate
# (accuracy is valid at any relay speed), checkpoint-resume across
# relaunches, SIGSTOP-able via runs/FLAGSHIP_RUNNING during timing work.
set -uo pipefail
cd "$(dirname "$0")/.."

export FLAGSHIP_NAME=flagship_semseg
export FLAGSHIP_WORKDIR=runs/flagship_semseg
export FLAGSHIP_PERSIST_FILE=runs/FLAGSHIP_SEMSEG_PERSIST
# Shares runs/FLAGSHIP_RUNNING with the (completed) centernet flagship so
# watcher probes / measure steps / bench.py SIGSTOP whichever trainer owns
# the chip — only one flagship trains at a time.
# exec: the pid recorded in runs/FLAGSHIP_RUNNING must be the PYTHON
# process (SIGSTOP from timing-grade work has to reach the chip owner,
# not a bash wrapper whose child keeps dispatching).
export FLAGSHIP_TRAIN_CMD="exec python -m cvm_tpu.cli.train --model semseg \
  --data synthetic --steps 4000 --eval_every 2000 --eval_batches 12 \
  --keep_best miou --workdir runs/flagship_semseg \
  --checkpoint_every 500 --log_every 100 --auto_restart 3 \
  --batch_size 16 --warmup_steps 200 --total_steps 4000"

exec bash scripts/flagship_persist.sh
