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


def last_eval_metric(workdir: str, key: str) -> float:
    path = os.path.join(workdir, "metrics.jsonl")
    val = None
    with open(path) as f:
        for line in f:
            rec = json.loads(line)
            if key in rec:
                val = float(rec[key])
    if val is None:
        raise SystemExit(f"no {key!r} entries in {path}")
    return val


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
    if model.input_format == "yuv420":
        out = model(batch["y"], batch["u"], batch["v"], batch["image_hw"])
    else:
        out = model(batch["image"], batch["image_hw"])
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
    ap.add_argument("--min", type=float, required=True)
    ap.add_argument("--pad_hw", default="96,96")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", os.environ.get("CVM_PLATFORM", "cpu"))

    val = last_eval_metric(args.workdir, args.metric)
    print(f"[e2e] {args.metric} = {val:.4f} (required >= {args.min})")
    if val < args.min:
        raise SystemExit(f"FAIL: {args.metric} {val:.4f} < {args.min}")

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
