#!/usr/bin/env python
"""Decompose the e2e CenterNet serving step into stage timings on the real
chip (VERDICT r1 item 9: find where the non-MXU time goes before attacking
MFU). Ablation timing is relay-robust: every iteration feeds a DISTINCT
input buffer (identical (executable, buffers) dispatches can be served from
a relay-side cache and time nothing — the round-1 train-harness lesson),
each variant is its own jitted program, timed pipelined with a terminal
block, and any stage whose implied FLOP rate exceeds the chip's bf16 peak
is reported as INVALID instead of printed as a result.

Stages:
  preproc  — YUV420 planes → letterboxed normalized RGB (gathers, VPU)
  model    — CenterNet forward (convs, MXU)
  decode   — sigmoid + 3x3 maxpool peaks → top-k → boxes (non-MXU tail)
  e2e      — all of the above in one program (the bench surface)

Prints one JSON line per variant + a summary.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _fetch_scalar(out):
    """Host readback of one element — the only completion signal the relay
    cannot fake (block_until_ready has been observed to ack at dispatch)."""
    import jax

    leaf = jax.tree_util.tree_leaves(out)[0]
    return float(np.asarray(leaf).ravel()[0])


def _time_fn(jfn, args_list, iters=30):
    """Pipelined wall-clock over `iters` dispatches cycling DISTINCT inputs.

    The TPU executes programs in dispatch order, so fetching one element of
    the LAST output to host bounds the completion of every dispatch before
    it; (wall − one RTT) / iters is the honest per-step time.
    """
    import jax

    warm = [jfn(*a) for a in args_list]
    jax.block_until_ready(warm)
    _fetch_scalar(warm[-1])
    t0 = time.perf_counter()
    outs = [jfn(*args_list[i % len(args_list)]) for i in range(iters)]
    jax.block_until_ready(outs)
    _fetch_scalar(outs[-1])
    return (time.perf_counter() - t0) / iters


def main(batch_size: int = 8, iters: int = 30, n_buffers: int = 12) -> int:
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

    def fresh_planes():
        y = rng.integers(0, 255, (B, *pad_hw), dtype=np.uint8)
        u = rng.integers(0, 255, (B, pad_hw[0] // 2, pad_hw[1] // 2), dtype=np.uint8)
        v = rng.integers(0, 255, (B, pad_hw[0] // 2, pad_hw[1] // 2), dtype=np.uint8)
        hw = rng.integers(360, 768, (B, 2)).astype(np.int32)
        return y, u, v, hw

    plane_args = [fresh_planes() for _ in range(n_buffers)]
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, *cfg.input_hw, 3)), train=False)

    def preproc(y, u, v, hw):
        proc, rois = preprocess_yuv420_batch(None, y, u, v, hw, cfg.input_hw, train=False,
                                             out_dtype=jnp.bfloat16)
        return proc, rois.scale_x

    def preproc_reduced(y, u, v, hw):
        # sum() forces the full resample but keeps the program output tiny,
        # so output materialization doesn't pollute the stage timing.
        proc, rois = preprocess_yuv420_batch(None, y, u, v, hw, cfg.input_hw, train=False,
                                             out_dtype=jnp.bfloat16)
        return jnp.sum(proc, dtype=jnp.float32), rois.scale_x

    def model_only(variables, x):
        return model.apply(variables, x, train=False)

    def model_reduced(variables, x):
        out = model.apply(variables, x, train=False)
        return tuple(jnp.sum(v, dtype=jnp.float32) for v in out.values())

    def model_decode(variables, x):
        out = model.apply(variables, x, train=False)
        det = decode_centernet(out["heatmap"], out["offset"], out["size"],
                               stride=cfg.stride, top_k=cfg.top_k)
        return det.boxes, det.scores, det.classes

    def decode_only(hm, off, sz):
        det = decode_centernet(hm, off, sz, stride=cfg.stride, top_k=cfg.top_k)
        return det.boxes, det.scores, det.classes

    def e2e(variables, y, u, v, hw):
        proc, rois = preprocess_yuv420_batch(None, y, u, v, hw, cfg.input_hw, train=False,
                                             out_dtype=jnp.bfloat16)
        out = model.apply(variables, proc, train=False)
        det = decode_centernet(out["heatmap"], out["offset"], out["size"],
                               stride=cfg.stride, top_k=cfg.top_k)
        boxes = jax.vmap(map_boxes_to_input)(det.boxes, rois)
        return boxes, det.scores, det.classes

    # Distinct device-resident inputs for the device-to-device stages.
    jpre = jax.jit(preproc)
    xs = [jax.block_until_ready(jpre(*a))[0] for a in plane_args]
    jmodel = jax.jit(model_only)
    head_outs = []
    for x in xs:
        o = jax.block_until_ready(jmodel(variables, x))
        head_outs.append((o["heatmap"], o["offset"], o["size"]))

    peak, kind = _device_peak_tflops()

    def null_op(s):
        return s + 1.0

    scalars = [jax.device_put(np.float32(i)) for i in range(n_buffers)]
    jax.block_until_ready(scalars)

    dev_planes = [tuple(jax.device_put(np.asarray(p)) for p in a) for a in plane_args]
    jax.block_until_ready(dev_planes)
    variants = {
        "null": (jax.jit(null_op), [(s,) for s in scalars]),
        "h2d+preproc": (jax.jit(preproc_reduced), plane_args),
        "preproc_dev": (jax.jit(preproc_reduced), dev_planes),
        "model": (jax.jit(model_reduced), [(variables, x) for x in xs]),
        "decode": (jax.jit(decode_only), head_outs),
        "model+decode": (jax.jit(model_decode), [(variables, x) for x in xs]),
        "e2e": (jax.jit(e2e), [(variables, *a) for a in plane_args]),
        "e2e_dev": (jax.jit(e2e), [(variables, *a) for a in dev_planes]),
    }
    results = {}
    for name, (jfn, args_list) in variants.items():
        dt = _time_fn(jfn, args_list, iters=iters)
        flops = 0.0
        try:
            flops = _compiled_flops(jfn.lower(*args_list[0]).compile())
        except Exception:
            pass
        rec = {
            "variant": name, "batch": B,
            "ms_per_batch": round(dt * 1e3, 3),
            "images_per_sec": round(B / dt, 1),
        }
        if flops:
            rec["gflops"] = round(flops / 1e9, 2)
            achieved = flops / dt / 1e12
            rec["achieved_tflops"] = round(achieved, 2)
            if peak:
                rec["mfu_pct"] = round(100 * achieved / peak, 1)
                if achieved > peak:
                    rec["INVALID"] = (
                        f"implied {achieved:.0f} TFLOP/s > {peak:.0f} peak — "
                        "timing did not capture real execution"
                    )
        results[name] = rec
        print(json.dumps(rec), flush=True)

    t_e2e = results["e2e"]["ms_per_batch"]
    t_model = results["model"]["ms_per_batch"]
    floor = results["null"]["ms_per_batch"]
    summary = {
        "dispatch_floor_ms": floor,
        "model_compute_ms_floor_corrected": round(t_model - floor, 3),
        "decode_standalone_ms": results["decode"]["ms_per_batch"],
        "decode_overhead_in_fused_ms": round(
            results["model+decode"]["ms_per_batch"] - t_model, 3),
        "preproc_dev_ms": results["preproc_dev"]["ms_per_batch"],
        "h2d_cost_ms": round(results["h2d+preproc"]["ms_per_batch"]
                             - results["preproc_dev"]["ms_per_batch"], 3),
        "e2e_minus_model_ms": round(t_e2e - t_model, 3),
        "e2e_dev_ms": results["e2e_dev"]["ms_per_batch"],
        "device": kind,
        "iters": iters,
        "distinct_buffers": len(plane_args),
    }
    print(json.dumps({"summary": summary}), flush=True)
    return 0


if __name__ == "__main__":
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--batch_size", type=int, default=8)
    ap.add_argument("--iters", type=int, default=30)
    a = ap.parse_args()
    sys.exit(main(a.batch_size, a.iters))
