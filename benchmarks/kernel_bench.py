"""Kernel microbenchmarks: Pallas vs XLA implementations on the real chip.

``python benchmarks/kernel_bench.py`` prints one JSON line per kernel pair.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np


def _time(fn, *args, iters=30, warmup=3):
    import jax

    for _ in range(warmup):
        jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    outs = [fn(*args) for _ in range(iters)]
    jax.block_until_ready(outs)
    return (time.perf_counter() - t0) / iters


def bench_gaussian_splat(B=8, K=128, C=80, HW=128):
    import jax
    import jax.numpy as jnp

    from cvm_tpu.ops.heatmap import render_centernet_targets_batch
    from cvm_tpu.ops.pallas.gaussian_splat import render_heatmap_pallas

    rng = np.random.default_rng(0)
    x0 = rng.uniform(0, HW - 20, (B, K)).astype(np.float32)
    y0 = rng.uniform(0, HW - 20, (B, K)).astype(np.float32)
    w = rng.uniform(2, 30, (B, K)).astype(np.float32)
    h = rng.uniform(2, 30, (B, K)).astype(np.float32)
    boxes = jnp.asarray(np.stack([x0, y0, x0 + w, y0 + h], -1))
    classes = jnp.asarray(rng.integers(0, C, (B, K)), jnp.int32)
    valid = jnp.asarray(rng.uniform(size=(B, K)) < 0.7)

    xla = jax.jit(
        lambda b, c, v: render_centernet_targets_batch(b, c, v, (HW, HW), C).heatmap
    )
    pls = jax.jit(
        lambda b, c, v: render_heatmap_pallas(b, c, v, (HW, HW), C)
    )
    t_xla = _time(xla, boxes, classes, valid)
    t_pls = _time(pls, boxes, classes, valid)
    a = np.asarray(xla(boxes, classes, valid))
    b_ = np.asarray(pls(boxes, classes, valid))
    max_diff = float(np.abs(a - b_).max())
    return {
        "kernel": "gaussian_splat",
        "shape": f"B{B}xK{K}xC{C}x{HW}x{HW}",
        "xla_ms": round(t_xla * 1e3, 3),
        "pallas_ms": round(t_pls * 1e3, 3),
        "speedup": round(t_xla / t_pls, 2),
        "max_diff": max_diff,
    }


def main():
    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:
        pass
    print(json.dumps(bench_gaussian_splat()), flush=True)
    return 0


if __name__ == "__main__":
    sys.path.insert(0, ".")
    sys.exit(main())
