#!/usr/bin/env python
"""Final gate of scripts/e2e.sh: assert the trained run reached a non-toy
eval metric, then load the exported artifact with the codeless ServingModel
and run real packed data through it (the serve leg of VERDICT r1 item 4)."""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def metric_series(workdir: str, key: str):
    path = os.path.join(workdir, "metrics.jsonl")
    vals = []
    with open(path) as f:
        for line in f:
            rec = json.loads(line)
            if key in rec:
                vals.append(float(rec[key]))
    if not vals:
        raise SystemExit(f"no {key!r} entries in {path}")
    return vals


def last_eval_metric(workdir: str, key: str) -> float:
    return metric_series(workdir, key)[-1]


def serve_batch(artifact: str, data: str, pad_hw):
    from cvm_tpu.data.loader import RecordLoader
    from cvm_tpu.data.records import RecordDataset
    from cvm_tpu.infer.runtime import ServingModel

    model = ServingModel(artifact)
    bs = int(model.meta.get("batch_size", 1))
    loader = RecordLoader(
        RecordDataset([data]), batch_size=bs, pad_hw=pad_hw, shuffle=False,
        loop=False, output_format=model.input_format, drop_remainder=False,
    )
    batch = next(iter(loader))
    two_frame = model.meta.get("model") == "dmds"
    with_3d = False
    pjson = os.path.join(artifact, "params.json")
    if os.path.exists(pjson):
        with_3d = bool(json.load(open(pjson)).get("with_3d", False))
    # Argument order matches the export signature (cli/export.py).
    if model.input_format == "yuv420":
        args = [batch["y"], batch["u"], batch["v"]]
        if two_frame:
            args += [batch["y_t1"], batch["u_t1"], batch["v_t1"]]
        args.append(batch["image_hw"])
    else:
        args = [batch["image"], batch["image_hw"]]
        if two_frame:
            args.append(batch["image_t1"])
    if with_3d:
        args.append(batch["intrinsics"])
    out = model(*args)
    out = {k: np.asarray(v) for k, v in out.items()}
    for k, v in out.items():
        assert np.isfinite(np.asarray(v, np.float64)).all(), f"non-finite {k}"
    return out


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--workdir", required=True)
    ap.add_argument("--artifact", required=True)
    ap.add_argument("--data", required=True)
    ap.add_argument("--metric", required=True, help="e.g. val_mAP / val_miou")
    ap.add_argument("--min", type=float, default=None,
                    help="quality metric: last value must be >= min")
    ap.add_argument("--max", type=float, default=None,
                    help="error metric (e.g. val_center_err_3d_m): last <= max")
    ap.add_argument("--improve", type=float, default=None,
                    help="training-loss gate (unsupervised legs): the metric's "
                         "final value must be <= first * (1 - improve)")
    ap.add_argument("--pad_hw", default="96,96")
    args = ap.parse_args()
    gates = [g for g in (args.min, args.max, args.improve) if g is not None]
    if len(gates) != 1:
        ap.error("pass exactly one of --min / --max / --improve")

    import jax

    jax.config.update("jax_platforms", os.environ.get("CVM_PLATFORM", "cpu"))

    series = metric_series(args.workdir, args.metric)
    val = series[-1]
    if args.min is not None:
        print(f"[e2e] {args.metric} = {val:.4f} (required >= {args.min})")
        if val < args.min:
            raise SystemExit(f"FAIL: {args.metric} {val:.4f} < {args.min}")
    elif args.max is not None:
        print(f"[e2e] {args.metric} = {val:.4f} (required <= {args.max})")
        if val > args.max:
            raise SystemExit(f"FAIL: {args.metric} {val:.4f} > {args.max}")
    else:
        first = series[0]
        need = first * (1.0 - args.improve)
        print(f"[e2e] {args.metric}: first {first:.4f} -> last {val:.4f} "
              f"(required <= {need:.4f}, {args.improve:.0%} improvement)")
        if val > need:
            raise SystemExit(
                f"FAIL: {args.metric} {val:.4f} did not improve "
                f"{args.improve:.0%} over {first:.4f}")

    pad_hw = tuple(int(x) for x in args.pad_hw.split(","))
    out = serve_batch(args.artifact, args.data, pad_hw)
    summary = {k: list(v.shape) for k, v in out.items()}
    if "scores" in out:
        summary["top_score"] = round(float(out["scores"].max()), 4)
    if "class_map" in out:
        vals, counts = np.unique(out["class_map"], return_counts=True)
        summary["classes_present"] = [int(v) for v in vals[np.argsort(-counts)][:5]]
    print(f"[e2e] served batch through artifact: {json.dumps(summary)}")
    print("[e2e] OK")
    return 0


if __name__ == "__main__":
    sys.exit(main())
