#!/usr/bin/env python
"""Decompose the e2e CenterNet serving step into stage timings on the real
chip (VERDICT r1 item 9: find where the non-MXU time goes before attacking
MFU). Ablation timing is relay-robust (each variant is its own jitted
program, timed pipelined with a terminal block), unlike trace collection
over the tunnel.

Stages:
  preproc  — YUV420 planes → letterboxed normalized RGB (gathers, VPU)
  model    — CenterNet forward (convs, MXU)
  decode   — 3x3 maxpool peaks → top-k → boxes (reduce_window + sort)
  e2e      — all of the above in one program (the bench surface)

Prints one JSON line per variant + a summary with achieved TFLOP/s.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _time_fn(jfn, args, iters=30):
    import jax

    jax.block_until_ready(jfn(*args))
    t0 = time.perf_counter()
    outs = [jfn(*args) for _ in range(iters)]
    jax.block_until_ready(outs)
    return (time.perf_counter() - t0) / iters


def main(batch_size: int = 8) -> int:
    import jax
    import jax.numpy as jnp

    try:
        jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:
        pass

    from cvm_tpu.cli.benchmark import _compiled_flops, _device_peak_tflops
    from cvm_tpu.models import get_model
    from cvm_tpu.ops.decode import decode_centernet
    from cvm_tpu.ops.image import map_boxes_to_input
    from cvm_tpu.pipeline.preprocess import preprocess_yuv420_batch

    spec = get_model("centernet")
    cfg = spec.params_cls(batch_size=batch_size)
    model = spec.create_model(cfg)
    rng = np.random.default_rng(0)
    B = cfg.batch_size
    pad_hw = (768, 768)
    y = jnp.asarray(rng.integers(0, 255, (B, *pad_hw), dtype=np.uint8))
    u = jnp.asarray(rng.integers(0, 255, (B, pad_hw[0] // 2, pad_hw[1] // 2), dtype=np.uint8))
    v = jnp.asarray(rng.integers(0, 255, (B, pad_hw[0] // 2, pad_hw[1] // 2), dtype=np.uint8))
    hw = jnp.asarray(rng.integers(360, 768, (B, 2)), jnp.int32)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, *cfg.input_hw, 3)), train=False)

    def preproc(y, u, v, hw):
        proc, rois = preprocess_yuv420_batch(None, y, u, v, hw, cfg.input_hw, train=False)
        return proc, rois.scale_x

    def model_only(variables, x):
        return model.apply(variables, x, train=False)

    def model_decode(variables, x):
        out = model.apply(variables, x, train=False)
        det = decode_centernet(out["heatmap"], out["offset"], out["size"],
                               stride=cfg.stride, top_k=cfg.top_k)
        return det.boxes, det.scores, det.classes

    def e2e(variables, y, u, v, hw):
        proc, rois = preprocess_yuv420_batch(None, y, u, v, hw, cfg.input_hw, train=False)
        out = model.apply(variables, proc, train=False)
        det = decode_centernet(out["heatmap"], out["offset"], out["size"],
                               stride=cfg.stride, top_k=cfg.top_k)
        boxes = jax.vmap(map_boxes_to_input)(det.boxes, rois)
        return boxes, det.scores, det.classes

    x = jax.block_until_ready(jax.jit(preproc)(y, u, v, hw)[0])
    peak, kind = _device_peak_tflops()

    variants = {
        "preproc": (jax.jit(preproc), (y, u, v, hw)),
        "model": (jax.jit(model_only), (variables, x)),
        "model+decode": (jax.jit(model_decode), (variables, x)),
        "e2e": (jax.jit(e2e), (variables, y, u, v, hw)),
    }
    results = {}
    for name, (jfn, args) in variants.items():
        dt = _time_fn(jfn, args)
        flops = 0.0
        try:
            flops = _compiled_flops(jfn.lower(*args).compile())
        except Exception:
            pass
        rec = {
            "variant": name, "batch": B,
            "ms_per_batch": round(dt * 1e3, 3),
            "images_per_sec": round(B / dt, 1),
        }
        if flops:
            rec["gflops"] = round(flops / 1e9, 2)
            rec["achieved_tflops"] = round(flops / dt / 1e12, 2)
            if peak:
                rec["mfu_pct"] = round(100 * flops / dt / 1e12 / peak, 1)
        results[name] = rec
        print(json.dumps(rec), flush=True)

    t_e2e = results["e2e"]["ms_per_batch"]
    t_model = results["model"]["ms_per_batch"]
    summary = {
        "decode_overhead_ms": round(results["model+decode"]["ms_per_batch"] - t_model, 3),
        "preproc_standalone_ms": results["preproc"]["ms_per_batch"],
        "e2e_minus_model_ms": round(t_e2e - t_model, 3),
        "device": kind,
    }
    print(json.dumps({"summary": summary}), flush=True)
    return 0


if __name__ == "__main__":
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--batch_size", type=int, default=8)
    a = ap.parse_args()
    sys.exit(main(a.batch_size))
