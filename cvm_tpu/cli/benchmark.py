"""Benchmark harness for the BASELINE.json measurement configs A–E.

``python -m cvm_tpu.cli.benchmark [--configs A,B,C,D,E] [--iters N]``

A: semseg 640x256 batch 1 (PR1 ref config)      C: depth KITTI-ish
B: centernet COCO 512x512 batch 8 (headline)    D: multitask NuScenes-ish
E: dmds two-frame + pose + warping loss (training step benchmarked, since
   the warping loss is the workload; BASELINE.json:11)

Prints one JSON line per config: images/sec + p50 latency for the e2e
inference pipeline (preprocess+forward+decode in one jitted program), or
steps/sec for E's train step.
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np


def _bench_infer(spec_name, cfg, iters=20, warmup=3):
    import jax

    from cvm_tpu.data.synthetic import synthetic_batch
    from cvm_tpu.infer.pipeline import InferencePipeline
    from cvm_tpu.models import get_model

    spec = get_model(spec_name)
    model = spec.create_model(cfg)
    variables = model.init(
        jax.random.PRNGKey(0),
        np.zeros((1, *cfg.input_hw, 6 if spec_name == "dmds" else 3), np.float32),
        train=False,
    )
    pipe = InferencePipeline(spec, cfg, variables)

    rng = np.random.default_rng(0)
    pad = (int(cfg.input_hw[0] * 1.5) // 2 * 2, int(cfg.input_hw[1] * 1.5) // 2 * 2)
    # Distinct buffers per dispatch + a one-element host readback as the
    # completion signal: identical dispatches can be served from a relay
    # cache and block_until_ready has been observed to ack at dispatch
    # (the retracted round-1 lesson; same protections as bench.py).
    n_buf = max(8, warmup + 1)
    batches = [
        synthetic_batch(rng, cfg.batch_size, pad, num_classes=5,
                        two_frame=(spec_name == "dmds"))
        for _ in range(n_buf)
    ]

    def _readback(out):
        leaf = next(iter(out.values()))
        return float(np.asarray(jax.device_get(leaf)).ravel()[0])

    for b in batches:
        jax.block_until_ready(pipe(b))

    t0 = time.perf_counter()
    outs = [pipe(batches[i % n_buf]) for i in range(iters)]
    jax.block_until_ready(outs)
    _readback(outs[-1])
    t_pipe = (time.perf_counter() - t0) / iters

    lat = []
    for i in range(max(iters // 3, 3)):
        t0 = time.perf_counter()
        out = pipe(batches[i % n_buf])
        jax.block_until_ready(out)
        _readback(out)
        lat.append(time.perf_counter() - t0)

    res = {
        "images_per_sec": round(cfg.batch_size / t_pipe, 2),
        "p50_latency_ms": round(float(np.percentile(lat, 50)) * 1e3, 2),
        "batch_size": cfg.batch_size,
    }
    # Roofline guard (same contract as the train bench): refuse impossible
    # FLOP rates instead of publishing them.
    try:
        flops = _compiled_flops(
            pipe._predict.lower(pipe._variables, *(
                (batches[0]["y"], batches[0]["u"], batches[0]["v"],
                 batches[0]["image_hw"]) if "y" in batches[0] else
                ((batches[0]["image"], batches[0]["image_hw"],
                  batches[0]["image_t1"]) if spec_name == "dmds" else
                 (batches[0]["image"], batches[0]["image_hw"]))
            )).compile()
        )
        peak, _ = _device_peak_tflops()
        if flops > 0:
            achieved = flops / t_pipe / 1e12
            res["achieved_tflops"] = round(achieved, 2)
            if peak is not None:
                res["mfu_pct"] = round(100 * achieved / peak, 1)
                if achieved > peak:
                    raise RuntimeError(
                        f"IMPOSSIBLE measurement for {spec_name}: "
                        f"{achieved:.0f} TFLOP/s > {peak:.0f} peak — refusing"
                    )
    except RuntimeError:
        raise
    except Exception:
        pass  # cost analysis unavailable → report times without MFU
    return res


# bf16 dense peak per chip, TFLOP/s — the roofline no honest measurement
# can exceed. Matched by substring on device_kind; unknown kinds (CPU, new
# chips) skip the guard.
_CHIP_PEAK_TFLOPS = (
    ("v5 lite", 197.0),   # v5e (device_kind "TPU v5 lite")
    ("v5e", 197.0),       # alternative kind spelling on newer stacks
    ("v5p", 459.0),
    ("v4", 275.0),
    ("v6", 918.0),        # trillium
    # NO generic "v5" catch-all: assigning v5p's 459 to an unrecognized
    # v5-family spelling would report MFU 2.3x too low AND raise the
    # impossible-measurement threshold 2.3x on the chip class we target.
)


def _device_peak_tflops():
    import jax

    kind = getattr(jax.devices()[0], "device_kind", "") or ""
    if "TPU" in kind.upper() or kind.lower().startswith("tpu"):
        for sub, peak in _CHIP_PEAK_TFLOPS:
            if sub in kind.lower():
                return peak, kind
    return None, kind


def _compiled_flops(compiled) -> float:
    """Per-execution FLOPs from XLA's cost analysis (0.0 if unavailable)."""
    try:
        ca = compiled.cost_analysis()
    except Exception:
        return 0.0
    if isinstance(ca, (list, tuple)):
        ca = ca[0] if ca else {}
    return float(ca.get("flops", 0.0) or 0.0)


def _bench_train_step(spec_name, cfg, iters=10, warmup=2):
    """Measurement-honest training throughput (VERDICT r1 weak #2).

    Two independent clocks, both unfalsifiable:
      * blocked: fetch the scalar loss to host EVERY step — each timing
        includes a full device round trip (upper bound on per-step latency).
      * pipelined: issue >=500 steps with no host sync; the donated TrainState
        chains every step, so blocking on the final params + fetching the
        final loss cannot complete before all steps executed (steady-state
        throughput, dispatch overlapped as real training does).
    Achieved TFLOP/s is computed from the compiled program's own cost
    analysis and the report HARD-FAILS if it exceeds the chip's bf16 peak —
    a number above the roofline means the harness (or the relay) lied.
    """
    import jax

    from cvm_tpu.data.synthetic import synthetic_batch
    from cvm_tpu.models import get_model
    from cvm_tpu.train.loop import Trainer

    spec = get_model(spec_name)
    trainer = Trainer(spec, cfg)
    rng = np.random.default_rng(0)
    pad = (int(cfg.input_hw[0] * 1.5) // 2 * 2, int(cfg.input_hw[1] * 1.5) // 2 * 2)
    batch = synthetic_batch(rng, cfg.batch_size, pad, num_classes=5,
                            two_frame=(spec_name == "dmds"))
    trainer.init_state(batch)
    b = jax.tree.map(lambda x: jax.device_put(x, trainer._batch_sh), batch)

    peak_tflops, kind = _device_peak_tflops()
    flops_per_step = 0.0
    try:
        trainer.key, sub = jax.random.split(trainer.key)
        compiled = trainer.train_step.lower(trainer.state, b, sub).compile()
        flops_per_step = _compiled_flops(compiled)
    except Exception:
        pass  # cost analysis is diagnostic; timing below stands alone

    for _ in range(warmup):
        trainer.key, sub = jax.random.split(trainer.key)
        trainer.state, m = trainer.train_step(trainer.state, b, sub)
    jax.block_until_ready(trainer.state.params)

    # Clock 1: per-step blocked (scalar fetched to host every step).
    lat = []
    for _ in range(max(iters, 10)):
        trainer.key, sub = jax.random.split(trainer.key)
        t0 = time.perf_counter()
        trainer.state, m = trainer.train_step(trainer.state, b, sub)
        loss = float(m["loss"])  # host round trip — the sync point
        lat.append(time.perf_counter() - t0)
    dt_blocked = float(np.percentile(lat, 50))
    assert np.isfinite(loss), f"non-finite loss {loss}"

    # Clock 2: pipelined wall clock over a long window (>=500 steps on TPU).
    n_pipe = 500 if peak_tflops is not None else max(iters, 10)
    subs = jax.random.split(trainer.key, n_pipe + 1)
    trainer.key = subs[0]
    t0 = time.perf_counter()
    for i in range(n_pipe):
        trainer.state, m = trainer.train_step(trainer.state, b, subs[i + 1])
    jax.block_until_ready(trainer.state.params)
    final_loss = float(m["loss"])
    dt_pipe = (time.perf_counter() - t0) / n_pipe
    assert np.isfinite(final_loss), f"non-finite loss {final_loss}"

    res = {
        "steps_per_sec": round(1.0 / dt_pipe, 2),
        "images_per_sec": round(cfg.batch_size / dt_pipe, 2),
        "steps_per_sec_blocked": round(1.0 / dt_blocked, 2),
        "p50_step_ms_blocked": round(dt_blocked * 1e3, 3),
        "pipelined_steps": n_pipe,
        "batch_size": cfg.batch_size,
        "device_kind": kind,
    }
    if flops_per_step > 0:
        res["tflops_per_step"] = round(flops_per_step / 1e12, 4)
        achieved = flops_per_step / dt_pipe / 1e12
        res["achieved_tflops"] = round(achieved, 2)
        if peak_tflops is not None:
            res["mfu_pct"] = round(100.0 * achieved / peak_tflops, 1)
            if achieved > peak_tflops:
                raise RuntimeError(
                    f"IMPOSSIBLE measurement: {achieved:.0f} TFLOP/s achieved "
                    f"> {peak_tflops:.0f} TFLOP/s bf16 peak on {kind} — the "
                    "harness is not timing real execution (relay interference "
                    "or a broken sync point). Refusing to report."
                )
    return res


def _configs():
    from cvm_tpu.models import get_model

    return {
        # BASELINE.json:7 — semseg 640x256 single image
        "A": ("semseg", get_model("semseg").params_cls(batch_size=1), "infer"),
        # BASELINE.json:8 — CenterNet COCO 512x512 batch 8 (headline)
        "B": ("centernet", get_model("centernet").params_cls(), "infer"),
        # BASELINE.json:9 — dense depth w/ multi-scale upsampling
        "C": ("depth", get_model("depth").params_cls(), "infer"),
        # BASELINE.json:10 — multitask shared-backbone
        "D": ("multitask", get_model("multitask").params_cls(), "infer"),
        # BASELINE.json:11 — two-frame DMDS with pose + warping loss
        "E": ("dmds", get_model("dmds").params_cls(), "train"),
    }


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--configs", default="A,B,C,D,E")
    parser.add_argument("--iters", type=int, default=20)
    parser.add_argument("--train", action="store_true",
                        help="benchmark the training step instead of inference")
    parser.add_argument("--batch_size", type=int, default=None,
                        help="override the config's batch size")
    args = parser.parse_args(argv)

    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:
        pass

    cfgs = _configs()
    for key in args.configs.split(","):
        key = key.strip().upper()
        if key not in cfgs:
            parser.error(f"unknown config {key!r}; choose from {sorted(cfgs)}")
        spec_name, cfg, mode = cfgs[key]
        if args.train:
            mode = "train"
        if args.batch_size:
            cfg = cfg.replace(batch_size=args.batch_size)
        if mode == "train":
            res = _bench_train_step(spec_name, cfg, iters=max(args.iters // 2, 5))
        else:
            res = _bench_infer(spec_name, cfg, iters=args.iters)
        res.update({"config": key, "model": spec_name, "mode": mode,
                    "input_hw": list(cfg.input_hw)})
        print(json.dumps(res), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
