#!/usr/bin/env python
"""Host-side input-pipeline benchmark — NO device, NO tunnel.

The serving/training host is a single core behind a flaky relay; the input
pipeline's decode throughput is the hard ceiling on host-bound configs
(BENCH_r01 was host-decode-bound; reference analogue: the TF dataset /
OpenCV decode path, SURVEY.md §2 "data reading/batching"). This measures
the pieces that never touch the device, so it produces trustworthy numbers
even while the tunnel is degraded:

  decode_rgb[_out]     — native libjpeg batch decode into a fresh / reused
                         (N,H,W,3) buffer (out= is the round-4 fast path:
                         all-JPEG batches skip the per-frame memcpy)
  decode_yuv[_out]     — same for the YUV420 wire format (half the bytes)
  loader_rgb/yuv420    — full RecordLoader (.cvrec read + decode + label
                         assembly + bounded queue) images/s, plus its own
                         per-stage ms/batch breakdown
  loader_yuv_scaled    — scale-aware DCT decode (target_hw): the decoder
                         picks the smallest M/8 scale covering the model
                         input instead of decoding full-res

Prints one JSON line per measurement. Run via scripts/remeasure.py only if
you want relay health gating — this benchmark itself needs none. It DOES
respect the host-load locks (runs/MEASURING, runs/BENCH_RUNNING): the box
has one core, so running this concurrently with an on-chip measurement
session corrupts BOTH sides' host-bound numbers (~3x under load).
"""

from __future__ import annotations

import io
import json
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _make_jpegs(n: int, hw=(480, 640), quality: int = 90):
    """Realistic-entropy JPEGs: smooth gradients + structured noise compress
    like road scenes (~1-2 bit/px), unlike white noise (which defeats the
    DCT and times the worst case only)."""
    from PIL import Image

    rng = np.random.default_rng(0)
    h, w = hw
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    out = []
    for i in range(n):
        base = (
            127
            + 60 * np.sin(xx / (20 + i % 7) + i)
            + 50 * np.cos(yy / (25 + i % 5))
        )
        img = np.stack(
            [
                np.clip(base + rng.normal(0, 12, (h, w)), 0, 255),
                np.clip(base * 0.8 + 30, 0, 255),
                np.clip(255 - base, 0, 255),
            ],
            -1,
        ).astype(np.uint8)
        b = io.BytesIO()
        Image.fromarray(img).save(b, "JPEG", quality=quality)
        out.append(b.getvalue())
    return out


def _emit(name: str, value: float, unit: str, **extra):
    print(json.dumps({"metric": name, "value": round(value, 2),
                      "unit": unit, **extra}), flush=True)


def _time(fn, iters: int) -> float:
    fn()  # warm (thread pool, page faults)
    t0 = time.perf_counter()
    for _ in range(iters):
        fn()
    return (time.perf_counter() - t0) / iters


def bench_decode(jpegs, hw, iters: int, threads: int):
    from cvm_tpu.native import decode_jpeg_batch, decode_jpeg_batch_yuv420, get_lib

    n = len(jpegs)
    h, w = hw
    backend = "native" if get_lib() is not None else "pil"

    dt = _time(lambda: decode_jpeg_batch(jpegs, h, w, threads), iters)
    _emit("decode_rgb", n / dt, "img/s", batch=n, hw=list(hw),
          backend=backend, threads=threads)

    buf = np.zeros((n, h, w, 3), np.uint8)
    dt_out = _time(lambda: decode_jpeg_batch(jpegs, h, w, threads, out=buf),
                   iters)
    _emit("decode_rgb_out", n / dt_out, "img/s", batch=n,
          speedup_vs_alloc=round(dt / dt_out, 3))

    dt = _time(lambda: decode_jpeg_batch_yuv420(jpegs, h, w, threads), iters)
    _emit("decode_yuv", n / dt, "img/s", batch=n)

    Y = np.zeros((n, h, w), np.uint8)
    U = np.zeros((n, h // 2, w // 2), np.uint8)
    V = np.zeros((n, h // 2, w // 2), np.uint8)
    dt_out = _time(
        lambda: decode_jpeg_batch_yuv420(jpegs, h, w, threads,
                                         out_yuv=(Y, U, V)),
        iters,
    )
    _emit("decode_yuv_out", n / dt_out, "img/s", batch=n,
          speedup_vs_alloc=round(dt / dt_out, 3))


def bench_loader(path: str, hw, batch_size: int, threads: int):
    from cvm_tpu.data.loader import RecordLoader
    from cvm_tpu.data.records import RecordDataset

    ds = RecordDataset([path])
    cases = [
        ("loader_rgb", dict(output_format="rgb")),
        ("loader_yuv420", dict(output_format="yuv420")),
        ("loader_yuv_scaled", dict(output_format="yuv420",
                                   target_hw=(hw[0] // 2, hw[1] // 2))),
    ]
    for name, kw in cases:
        ld = RecordLoader(ds, batch_size, hw, shuffle=False, loop=True,
                          num_decode_threads=threads, **kw)
        it = iter(ld)
        next(it)  # warm: thread start + first prefetch
        nb = max(len(ds) // batch_size, 8)
        t0 = time.perf_counter()
        for _ in range(nb):
            next(it)
        dt = (time.perf_counter() - t0) / nb
        st = ld.stats()
        # No explicit shutdown: the worker is a daemon thread parked on the
        # bounded queue once it is full — leaking a few for the life of this
        # short-lived process is harmless.
        _emit(name, batch_size / dt, "img/s", batch=batch_size,
              ms_per_batch=round(1e3 * dt, 2),
              stage_ms={k: round(v, 2) for k, v in st.items()
                        if k.endswith("_ms_per_batch")})


def _refuse_if_measurement_running() -> None:
    """One core: concurrent host-heavy work triples host-side timings on
    both sides (CLAUDE.md). Refuse while a live measurement holds a lock;
    clear dead-pid locks like bench.py does. CVM_LOADER_BENCH_FORCE=1
    overrides."""
    if os.environ.get("CVM_LOADER_BENCH_FORCE") == "1":
        return
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    for name in ("MEASURING", "BENCH_RUNNING"):
        lock = os.path.join(repo, "runs", name)
        try:
            pid = int(open(lock).read().strip())
        except (OSError, ValueError):
            continue
        try:
            os.kill(pid, 0)
        except OSError:
            print(f"loader_bench: stale runs/{name} (pid {pid} dead) — "
                  "clearing", file=sys.stderr)
            try:
                os.unlink(lock)
            except OSError:
                pass
            continue
        raise SystemExit(
            f"loader_bench: runs/{name} held by live pid {pid} — a "
            "measurement session owns the host core; rerun after it "
            "finishes (CVM_LOADER_BENCH_FORCE=1 overrides)")


def main() -> int:
    _refuse_if_measurement_running()
    n_img = int(os.environ.get("CVM_LOADER_BENCH_IMAGES", "64"))
    batch = int(os.environ.get("CVM_LOADER_BENCH_BATCH", "16"))
    iters = int(os.environ.get("CVM_LOADER_BENCH_ITERS", "8"))
    threads = int(os.environ.get("CVM_LOADER_BENCH_THREADS", "4"))
    hw = (480, 640)

    jpegs = _make_jpegs(n_img, hw)
    _emit("jpeg_bytes_mean", float(np.mean([len(j) for j in jpegs])), "B",
          images=n_img)
    bench_decode(jpegs[:batch], hw, iters, threads)

    from cvm_tpu.data.records import RecordWriter

    with tempfile.TemporaryDirectory() as td:
        path = os.path.join(td, "bench.cvrec")
        with RecordWriter(path) as wtr:
            for i, j in enumerate(jpegs):
                wtr.write(
                    {"boxes": [[10, 10, 100, 100]], "box_classes": [1]},
                    {"jpeg": j},
                )
        bench_loader(path, hw, batch, threads)
    return 0


if __name__ == "__main__":
    sys.exit(main())
