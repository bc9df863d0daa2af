"""Probe: does this backend lower int8 matmuls/convs onto the MXU int8 path?

Decides whether W8A8 serving is viable: v5e int8 peak is ~394 TOPS vs ~197
bf16 TFLOPS. Round-1 measured int8 convs 25x slower than bf16; int8
dot_general is a different lowering path and a conv is expressible as a
matmul (1x1 directly, 3x3 via im2col).

Relay-robust methodology (the naive chained-repeat probe reported 8987
TFLOP/s on a 197-TFLOP chip — the relay caches identical dispatches):
- values renormalized every step so chains never saturate (saturated values
  make every iteration's input identical → cacheable),
- a pool of DISTINCT device-resident inputs, one per timed dispatch,
- a long in-program chain (compute >> the ~2 ms relay dispatch floor),
- a scalar host readback per timed call as the completion signal.

Usage: PYTHONPATH=/root/repo python benchmarks/int8_probe.py
"""

from __future__ import annotations

import time

import numpy as np


def _time_calls(cfn, pool, read):
    ts = []
    for x in pool:
        t0 = time.perf_counter()
        r = cfn(x)
        read(r)
        ts.append(time.perf_counter() - t0)
    return min(ts)


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    print("device:", jax.devices()[0], flush=True)

    rng = np.random.default_rng(0)
    CHAIN = 32

    def run(name, make_pool, step, flops_per_step, read):
        def chained(x):
            o = x
            for _ in range(CHAIN):
                o = step(o)
            return o

        cfn = jax.jit(chained)
        pool = make_pool(4)
        jax.block_until_ready(cfn(pool[0]))  # compile
        t = _time_calls(cfn, pool, read) / CHAIN
        print(f"{name}: {t*1e3:.3f} ms/op -> {flops_per_step/t/1e12:.1f} "
              f"T(FL)OP/s", flush=True)
        return t

    # ---- matmul 4096^3 ----
    N = 4096
    mm_flops = 2 * N * N * N

    def pool_bf16(k):
        return [jnp.asarray(rng.standard_normal((N, N)), jnp.bfloat16)
                for _ in range(k)]

    def pool_i8(k):
        return [jnp.asarray(rng.integers(-127, 128, (N, N)), jnp.int8)
                for _ in range(k)]

    read0 = lambda r: float(np.asarray(jax.device_get(r[:1, :1])).ravel()[0])

    run("bf16 4096^3 matmul", pool_bf16,
        lambda o: (lax.dot(o, o) * (1.0 / np.sqrt(N))).astype(jnp.bfloat16),
        mm_flops, read0)

    run("int8 4096^3 dot_general", pool_i8,
        lambda o: (lax.dot(o, o, preferred_element_type=jnp.int32) >> 8
                   ).astype(jnp.int8),
        mm_flops, read0)

    # ---- conv 3x3, B8 64x64 C256 ----
    B, H, W, C = 8, 64, 64, 256
    cv_flops = 2 * B * H * W * 9 * C * C
    wf = jnp.asarray(rng.standard_normal((3, 3, C, C)) / np.sqrt(9 * C),
                     jnp.bfloat16)
    wi = jnp.asarray(rng.integers(-127, 128, (3, 3, C, C)), jnp.int8)

    def pool_xbf(k):
        return [jnp.asarray(rng.standard_normal((B, H, W, C)), jnp.bfloat16)
                for _ in range(k)]

    def pool_xi8(k):
        return [jnp.asarray(rng.integers(-127, 128, (B, H, W, C)), jnp.int8)
                for _ in range(k)]

    dn = ("NHWC", "HWIO", "NHWC")

    run("bf16 conv3x3", pool_xbf,
        lambda o: lax.conv_general_dilated(o, wf, (1, 1), "SAME",
                                           dimension_numbers=dn
                                           ).astype(jnp.bfloat16),
        cv_flops, read0)

    run("int8 conv3x3", pool_xi8,
        lambda o: (lax.conv_general_dilated(
            o, wi, (1, 1), "SAME", dimension_numbers=dn,
            preferred_element_type=jnp.int32) >> 11).astype(jnp.int8),
        cv_flops, read0)

    wmat = wi.reshape(9 * C, C)

    def im2col_step(o):
        p = lax.conv_general_dilated_patches(
            o, (3, 3), (1, 1), "SAME", dimension_numbers=dn)
        y = lax.dot(p.reshape(B * H * W, 9 * C), wmat,
                    preferred_element_type=jnp.int32)
        return (y.reshape(B, H, W, C) >> 11).astype(jnp.int8)

    run("int8 conv3x3 im2col+dot", pool_xi8, im2col_step, cv_flops, read0)

    # ---- 1x1 conv as matmul (neck/head case) ----
    w1 = jnp.asarray(rng.integers(-127, 128, (C, C)), jnp.int8)
    f1 = 2 * B * H * W * C * C

    def one_step(o):
        y = lax.dot(o.reshape(B * H * W, C), w1,
                    preferred_element_type=jnp.int32)
        return (y.reshape(B, H, W, C) >> 11).astype(jnp.int8)

    run("int8 1x1 as matmul", pool_xi8, one_step, f1, read0)

    w1f = (w1.astype(jnp.bfloat16) * (1.0 / np.sqrt(C)))

    def one_step_bf(o):
        y = lax.dot(o.reshape(B * H * W, C), w1f)
        return y.reshape(B, H, W, C).astype(jnp.bfloat16)

    run("bf16 1x1 as matmul", pool_xbf, one_step_bf, f1, read0)


if __name__ == "__main__":
    main()
