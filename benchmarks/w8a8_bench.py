"""Serving-variant ablation on the real chip: bf16 / BN-fold / W8A8.

Round-1 parked W8A8 after measuring int8 convs 25x slower than bf16; the
round-2 relay-robust probe (int8_probe.py) shows int8 convs at ~1.15x and
int8 matmuls at ~1.28x bf16 throughput on this backend — so re-measure the
actual CenterNet forward under the w8a8 interceptor (infer/quantize.py)
with the relay-robust harness and decide whether the int8 path graduates
from opt-in (VERDICT r2 #3). The same run ablates export-time BN folding
(infer/fold_bn.py) and its composition with W8A8, and reports XLA
cost-analysis FLOPs + bytes-accessed per variant — the evidence DESIGN.md
§9's MFU-gap attack needs (VERDICT r2 #4).

Usage: PYTHONPATH=/root/repo python benchmarks/w8a8_bench.py
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from benchmarks.profile_e2e import _time_fn  # relay-robust pipelined timer


def main(batch_size: int = 8, iters: int = 20, input_hw=None,
         backbone: str = None) -> int:
    import jax
    import jax.numpy as jnp

    from cvm_tpu.utils.platform import apply_platform_env

    apply_platform_env()  # CVM_PLATFORM=cpu for CI smoke + persistent cache
    try:
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:
        pass

    # Never benchmark a degraded relay (CLAUDE.md): probe + bounded wait.
    import importlib.util as _ilu

    _spec = _ilu.spec_from_file_location(
        "bench", os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "bench.py"))
    _bench = _ilu.module_from_spec(_spec)
    _spec.loader.exec_module(_bench)
    probe_ms = _bench._tunnel_health_probe()
    print(json.dumps({"tunnel_probe_ms": round(probe_ms, 2)}), flush=True)

    from cvm_tpu.cli.benchmark import _compiled_flops, _device_peak_tflops
    from cvm_tpu.infer.quantize import w8a8_inference
    from cvm_tpu.models import get_model

    spec = get_model("centernet")
    overrides = {"batch_size": batch_size}
    if input_hw is not None:
        overrides["input_hw"] = tuple(input_hw)
    if backbone is not None:
        overrides["backbone"] = backbone
    cfg = spec.params_cls(**overrides)
    model = spec.create_model(cfg)
    rng = np.random.default_rng(0)
    B = cfg.batch_size

    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, *cfg.input_hw, 3)), train=False)
    xs = [jax.device_put(np.asarray(
        rng.standard_normal((B, *cfg.input_hw, 3)), np.float32).astype(jnp.bfloat16))
        for _ in range(8)]
    jax.block_until_ready(xs)

    def fwd_bf16(variables, x):
        out = model.apply(variables, x, train=False)
        return tuple(jnp.sum(v, dtype=jnp.float32) for v in out.values())

    def fwd_w8a8(variables, x):
        with w8a8_inference():
            out = model.apply(variables, x, train=False)
        return tuple(jnp.sum(v, dtype=jnp.float32) for v in out.values())

    # Static-calibrated path: elementwise quantize (fixed scales) can fuse
    # into conv epilogues → int8-resident activations (DESIGN.md §8).
    from cvm_tpu.infer.quantize import (
        calibrate_activation_scales,
        w8a8_static_inference,
    )

    scales = calibrate_activation_scales(
        lambda x: model.apply(variables, x, train=False), xs[:2]
    )
    print(json.dumps({"calibrated_convs": len(scales)}), flush=True)

    def fwd_w8a8_static(variables, x):
        with w8a8_static_inference(scales):
            out = model.apply(variables, x, train=False)
        return tuple(jnp.sum(v, dtype=jnp.float32) for v in out.values())

    # Fused Pallas path (ops/pallas/fused_qconv.py): same calibrated int8
    # lattice, but quantize + int8 dot + BN/act stay VMEM-resident — the
    # kernel §9b says W8A8 cannot win without. On the real chip this row IS
    # the Pallas-invariant compile check (Mosaic lowering, no interpreter).
    from cvm_tpu.infer.quantize import (
        prequantize_fused_weights,
        w8a8_fused_inference,
    )

    fused_wtab = prequantize_fused_weights(variables)

    def fwd_w8a8_fused(variables, x):
        with w8a8_fused_inference(scales, weight_table=fused_wtab):
            out = model.apply(variables, x, train=False)
        return tuple(jnp.sum(v, dtype=jnp.float32) for v in out.values())

    def fwd_w8a8_fused_chain(variables, x):
        # Int8-resident ResBlock chaining on top of the fused kernels:
        # c1→c2 buffers live in HBM as int8 (DESIGN.md §9c open lever).
        with w8a8_fused_inference(scales, weight_table=fused_wtab,
                                  chain=True):
            out = model.apply(variables, x, train=False)
        return tuple(jnp.sum(v, dtype=jnp.float32) for v in out.values())

    # BN-fold variants (infer/fold_bn.py): the normalize disappears; the
    # folded kernels are what the conv reads. Note the variables differ.
    from cvm_tpu.infer.fold_bn import bn_folded_inference, fold_batchnorm

    folded_vars, bias_table = fold_batchnorm(variables)
    folded_vars = jax.device_put(folded_vars)

    def fwd_fold(variables, x):
        with bn_folded_inference(bias_table):
            out = model.apply(variables, x, train=False)
        return tuple(jnp.sum(v, dtype=jnp.float32) for v in out.values())

    def fwd_fold_w8a8(variables, x):
        with bn_folded_inference(bias_table), w8a8_static_inference(scales):
            out = model.apply(variables, x, train=False)
        return tuple(jnp.sum(v, dtype=jnp.float32) for v in out.values())

    # Space-to-depth stem ablation (DESIGN §9 "epilogue/space-to-depth"
    # lever, VERDICT r2 #4 / r3 #4): same architecture with the plain
    # stride-2 RGB stem — separate params (stem kernel reads 3 channels,
    # not 12), so it gets its own init.
    flat_model = spec.create_model(cfg.replace(space_to_depth_stem=False))
    flat_vars = flat_model.init(jax.random.PRNGKey(0),
                                jnp.zeros((1, *cfg.input_hw, 3)), train=False)
    flat_vars = jax.device_put(flat_vars)

    def fwd_flat_stem(variables, x):
        out = flat_model.apply(variables, x, train=False)
        return tuple(jnp.sum(v, dtype=jnp.float32) for v in out.values())

    def _compiled_bytes(compiled) -> float:
        try:
            ca = compiled.cost_analysis()
        except Exception:
            return 0.0
        if isinstance(ca, (list, tuple)):
            ca = ca[0] if ca else {}
        return float(ca.get("bytes accessed", 0.0) or 0.0)

    peak, kind = _device_peak_tflops()
    res = {}
    variants = (("bf16", fwd_bf16, variables),
                ("fold_bn", fwd_fold, folded_vars),
                ("w8a8", fwd_w8a8, variables),
                ("w8a8_static", fwd_w8a8_static, variables),
                ("w8a8_fused", fwd_w8a8_fused, variables),
                ("w8a8_fused_chain", fwd_w8a8_fused_chain, variables),
                ("fold_bn+w8a8", fwd_fold_w8a8, folded_vars),
                ("flat_stem", fwd_flat_stem, flat_vars))
    for name, fn, vs in variants:
        jfn = jax.jit(fn)
        try:
            dt = _time_fn(jfn, [(vs, x) for x in xs], iters=iters)
        except Exception as e:
            # One variant failing to compile/run (e.g. Mosaic rejecting a
            # Pallas kernel interpret-mode accepted) must not cost the rest
            # of the ablation — record the failure as a first-class result.
            rec = {"variant": name,
                   "FAILED": f"{type(e).__name__}: {str(e)[:300]}"}
            res[name] = rec
            print(json.dumps(rec), flush=True)
            continue
        flops = hbm = 0.0
        try:
            compiled = jfn.lower(vs, xs[0]).compile()
            flops = _compiled_flops(compiled)
            hbm = _compiled_bytes(compiled)
        except Exception:
            pass
        rec = {"variant": name, "ms_per_batch": round(dt * 1e3, 3),
               "images_per_sec": round(B / dt, 1)}
        if flops:
            achieved = flops / dt / 1e12
            rec["gflops"] = round(flops / 1e9, 2)
            rec["achieved_tflops"] = round(achieved, 2)
            if peak and achieved > 2 * peak:  # int8 peak is 2x bf16 peak
                rec["INVALID"] = "implied rate above int8 peak"
        if hbm:
            rec["hbm_gb_per_batch"] = round(hbm / 1e9, 3)
        res[name] = rec
        print(json.dumps(rec), flush=True)

    summary = {"device": kind}
    for name, _, _ in variants[1:]:
        if "ms_per_batch" in res.get(name, {}) and "ms_per_batch" in res["bf16"]:
            summary[f"{name}_speedup_vs_bf16"] = round(
                res["bf16"]["ms_per_batch"] / res[name]["ms_per_batch"], 3)
    print(json.dumps(summary), flush=True)
    return 0


if __name__ == "__main__":
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--batch_size", type=int, default=8)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--input_hw", default=None, help="e.g. 64,64 (CI smoke)")
    ap.add_argument("--backbone", default=None, help="e.g. tiny (CI smoke)")
    a = ap.parse_args()
    hw = tuple(int(x) for x in a.input_hw.split(",")) if a.input_hw else None
    sys.exit(main(a.batch_size, a.iters, hw, a.backbone))
