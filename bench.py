"""Benchmark: CenterNet 512x512 end-to-end images/sec/chip + p50 latency.

Measures the BASELINE.json headline metric on the real TPU chip: raw padded
uint8 batch → device letterbox/normalize → CenterNet forward → NMS-free peak
decode → boxes in original coords, all one jitted program (batch 8, COCO-size
config B). Prints ONE JSON line.

vs_baseline: ratio against a reference-equivalent CPU pipeline (host cv2
preprocess + torch CPU convnet of identical architecture + numpy host decode
— see benchmarks/reference_baseline.py; the reference repo publishes no
numbers and its mount was empty, SURVEY.md §0/§6). The baseline measurement
is cached in .bench_baseline.json so repeated bench runs stay fast.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)
_BASELINE_CACHE = os.path.join(REPO, ".bench_baseline.json")


def measure_tpu(batch_size: int = 8, iters: int = 30, warmup: int = 3) -> dict:
    import jax
    import jax.numpy as jnp

    fn_args = None
    from __graft_entry__ import entry

    fn, (variables, images, image_hw) = entry()
    jfn = jax.jit(fn)

    # Re-randomize host batches so we also pay the host→device transfer,
    # like a real serving loop (new images every batch).
    rng = np.random.default_rng(1)
    host_batches = [
        (
            rng.integers(0, 255, images.shape, dtype=np.uint8),
            np.asarray(image_hw),
        )
        for _ in range(4)
    ]

    for _ in range(warmup):
        out = jfn(variables, images, image_hw)
        jax.block_until_ready(out)

    lat = []
    t_all0 = time.perf_counter()
    for i in range(iters):
        img, hw = host_batches[i % len(host_batches)]
        t0 = time.perf_counter()
        out = jfn(variables, img, hw)
        jax.block_until_ready(out)
        lat.append(time.perf_counter() - t0)
    total = time.perf_counter() - t_all0

    lat = np.asarray(lat)
    B = images.shape[0]
    return {
        "images_per_sec": float(B * iters / total),
        "p50_latency_ms": float(np.percentile(lat, 50) * 1e3),
        "p90_latency_ms": float(np.percentile(lat, 90) * 1e3),
        "batch_size": B,
        "device": str(jax.devices()[0]),
    }


def get_reference_baseline(refresh: bool = False) -> dict:
    if not refresh and os.path.exists(_BASELINE_CACHE):
        with open(_BASELINE_CACHE) as f:
            return json.load(f)
    from benchmarks.reference_baseline import measure_reference_cpu

    ref = measure_reference_cpu(num_images=6)
    with open(_BASELINE_CACHE, "w") as f:
        json.dump(ref, f)
    return ref


def main() -> int:
    ours = measure_tpu()
    try:
        ref = get_reference_baseline()
        vs = ours["images_per_sec"] / max(ref["images_per_sec"], 1e-9)
    except Exception as e:  # baseline emulation failure must not kill bench
        ref = {"error": str(e)}
        vs = 0.0
    result = {
        "metric": "centernet_512x512_e2e_images_per_sec_per_chip",
        "value": round(ours["images_per_sec"], 2),
        "unit": "images/sec",
        "vs_baseline": round(vs, 2),
        "p50_latency_ms": round(ours["p50_latency_ms"], 2),
        "p90_latency_ms": round(ours["p90_latency_ms"], 2),
        "batch_size": ours["batch_size"],
        "baseline_images_per_sec": round(ref.get("images_per_sec", 0.0), 3),
        "device": ours.get("device", "?"),
    }
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    sys.exit(main())
