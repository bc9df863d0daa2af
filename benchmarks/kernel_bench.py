"""Kernel microbenchmarks: Pallas vs XLA implementations on the real chip.

``python benchmarks/kernel_bench.py`` prints one JSON line per kernel pair.

Relay-robust (same discipline as profile_e2e.py): every timed dispatch uses
a DISTINCT input buffer (identical (executable, buffers) pairs can be served
from a relay-side cache and time nothing) and a one-element host readback of
the final output is the completion signal.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _time(fn, args_list, iters=30):
    import jax

    outs = [fn(*a) for a in args_list]
    jax.block_until_ready(outs)
    float(np.asarray(jax.device_get(jax.tree_util.tree_leaves(outs[-1])[0]
                                    )).ravel()[0])
    t0 = time.perf_counter()
    outs = [fn(*args_list[i % len(args_list)]) for i in range(iters)]
    jax.block_until_ready(outs)
    float(np.asarray(jax.device_get(jax.tree_util.tree_leaves(outs[-1])[0]
                                    )).ravel()[0])
    return (time.perf_counter() - t0) / iters


def bench_gaussian_splat(B=8, K=128, C=80, HW=128, n_buffers=6):
    import jax
    import jax.numpy as jnp

    from cvm_tpu.ops.heatmap import render_centernet_targets_batch
    from cvm_tpu.ops.pallas.gaussian_splat import render_heatmap_pallas

    rng = np.random.default_rng(0)

    def fresh():
        x0 = rng.uniform(0, HW - 20, (B, K)).astype(np.float32)
        y0 = rng.uniform(0, HW - 20, (B, K)).astype(np.float32)
        w = rng.uniform(2, 30, (B, K)).astype(np.float32)
        h = rng.uniform(2, 30, (B, K)).astype(np.float32)
        boxes = jnp.asarray(np.stack([x0, y0, x0 + w, y0 + h], -1))
        classes = jnp.asarray(rng.integers(0, C, (B, K)), jnp.int32)
        valid = jnp.asarray(rng.uniform(size=(B, K)) < 0.7)
        return boxes, classes, valid

    pool = [fresh() for _ in range(n_buffers)]

    xla = jax.jit(
        lambda b, c, v: render_centernet_targets_batch(b, c, v, (HW, HW), C).heatmap
    )
    pls = jax.jit(
        lambda b, c, v: render_heatmap_pallas(b, c, v, (HW, HW), C)
    )
    t_xla = _time(xla, pool)
    t_pls = _time(pls, pool)
    a = np.asarray(xla(*pool[0]))
    b_ = np.asarray(pls(*pool[0]))
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
    sys.exit(main())
