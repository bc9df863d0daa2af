#!/usr/bin/env python
"""DMDS accuracy measurement: median-scaled depth metrics on parallax-
consistent KITTI-raw-format data (the e2e leg-5 recipe at on-chip scale).

Self-supervised depth-from-motion needs data whose two-frame photometric
signal actually determines depth. `data/synthetic.py::synthetic_batch` scenes
do not (measured 2026-08-19: delta1 ~0.10-0.20 after 250-600 steps even with
depth-consistent motion), while `scripts/gen_dataset.py::gen_kitti_raw`
parallax scenes do (e2e leg 5: delta1 0.56 after 250 CPU steps at 64 px).
This harness therefore generates KITTI-raw drives, packs them to .cvrec,
trains `cli.train --model dmds` with in-loop eval, and reports the final
median-scaled metrics — the number the measurement queue records for
config E accuracy (SURVEY §3.4 DMDS pipeline; BASELINE.json:11).

Prints ONE JSON line: {"model": "dmds", "steps": N, "val_delta1": ...}.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "scripts"))


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--steps", type=int, default=1500)
    ap.add_argument("--workdir", default="runs/dmds_accuracy")
    ap.add_argument("--scene_hw", default="192,192", help="generated scene size H,W")
    ap.add_argument("--input_hw", type=int, default=128, help="square model input")
    ap.add_argument("--images", type=int, default=240)
    ap.add_argument("--batch_size", type=int, default=8)
    ap.add_argument("--backbone", default="small")
    args = ap.parse_args(argv)

    from cvm_tpu.utils.platform import apply_platform_env

    apply_platform_env()  # honors CVM_PLATFORM; sets the persistent jit cache

    scene = tuple(int(x) for x in args.scene_hw.split(","))
    pad_hw = f"{scene[0]},{scene[1]}"
    raw = os.path.join(args.workdir, "raw")
    rec = os.path.join(args.workdir, "kraw.cvrec")
    os.makedirs(args.workdir, exist_ok=True)

    if not os.path.exists(rec):
        from gen_dataset import gen_kitti_raw

        stats = gen_kitti_raw(raw, args.images, scene, num_classes=3, seed=0)
        print(f"[dmds_accuracy] generated {stats}", flush=True)
        from cvm_tpu.cli.pack import main as pack_main

        rc = pack_main(["--dataset", "kitti_raw", "--src", raw, "--out", rec])
        if rc:
            return rc

    from cvm_tpu.cli.train import main as train_main

    eval_every = max(1, args.steps // 2)
    rc = train_main([
        "--model", "dmds", "--data", rec,
        "--steps", str(args.steps),
        "--eval_every", str(eval_every), "--eval_batches", "8",
        "--workdir", args.workdir, "--pad_hw", pad_hw,
        "--log_every", "100", "--checkpoint_every", str(args.steps),
        "--input_hw", f"[{args.input_hw},{args.input_hw}]",
        "--backbone", args.backbone,
        "--decoder_features", "16", "--motion_features", "32",
        "--max_depth", "45", "--min_depth", "1",
        "--batch_size", str(args.batch_size),
        "--learning_rate", "0.0005", "--warmup_steps", "50",
        "--total_steps", str(args.steps),
    ])
    if rc:
        return rc

    last = {}
    with open(os.path.join(args.workdir, "metrics.jsonl")) as f:
        for line in f:
            recd = json.loads(line)
            if "val_delta1" in recd:
                last = recd
    if not last:
        print(json.dumps({"model": "dmds", "error": "no val_delta1 logged"}))
        return 1
    out = {"model": "dmds", "steps": args.steps,
           "input_hw": args.input_hw, "batch_size": args.batch_size}
    for k in ("val_delta1", "val_delta2", "val_abs_rel", "val_rmse",
              "val_loss_photo"):
        if k in last:
            out[k] = round(float(last[k]), 4)
    print(json.dumps(out), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
