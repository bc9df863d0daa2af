"""Static roofline analysis of the benchmark surface — no execution needed.

Lowers + compiles each BASELINE config's e2e program (and the serving-variant
ablation: BN-fold / dynamic W8A8 / static W8A8 / fold+static) and reads XLA's
own cost analysis — FLOPs and bytes-accessed per execution — then places each
program on the target chip's roofline: compute floor, bandwidth floor,
arithmetic intensity, bound-ness, and the throughput/MFU *ceiling* no honest
measurement can exceed.

Why this exists (DESIGN.md §9, VERDICT r3 #4): the measured MFU-gap ablation
needs a healthy TPU tunnel, which has been degraded for multi-hour windows.
Cost analysis is a COMPILE-TIME artifact: run under ``CVM_PLATFORM=cpu`` it
produces CPU-lowered numbers today (fusion/layout differ from TPU — treat
bytes as approximate and clearly labeled), and run against the real backend it
produces the TPU-lowered truth without dispatching a single step, so it
tolerates a degraded relay far better than a timing run.

Usage:
    PYTHONPATH=. CVM_PLATFORM=cpu python benchmarks/roofline.py \
        [--configs A,B,C,D,E] [--variants bf16,fold_bn,w8a8_static,...]
        [--chip v5e] [--hw H,W] [--batch N] [--out runs/roofline.json]

Prints one JSON line per (config, variant) row.

Reference anchor: the reference publishes no rooflines (SURVEY.md §6); this
is the TPU-native accounting for BASELINE.json:2's headline metric.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# chip → (bf16 dense peak TFLOP/s, int8 peak TOP/s, HBM GB/s)
CHIPS = {
    "v5e": (197.0, 394.0, 819.0),
    "v5p": (459.0, 918.0, 2765.0),
    "v4": (275.0, 275.0, 1228.0),
    "v6e": (918.0, 1836.0, 1640.0),
}


def _cost(compiled) -> tuple:
    """(flops, bytes_accessed) from XLA cost analysis; 0.0 when unavailable."""
    try:
        ca = compiled.cost_analysis()
    except Exception:
        return 0.0, 0.0
    if isinstance(ca, (list, tuple)):
        ca = ca[0] if ca else {}
    return (float(ca.get("flops", 0.0) or 0.0),
            float(ca.get("bytes accessed", 0.0) or 0.0))


def _lower_infer(spec_name, cfg, variant, rng, cpu_device=None, scope="e2e"):
    """Compile the e2e inference program and return the compiled object.

    With ``cpu_device`` set (--tpu mode): all CONCRETE work — init,
    calibration, BN folding — runs on the CPU backend, and every array is
    pulled back to host numpy before lowering, so the jit targets the
    default (TPU) backend purely from abstract shapes and the only remote
    RPC is the compile itself. No step is ever dispatched to the chip."""
    import contextlib

    import jax

    from cvm_tpu.data.synthetic import synthetic_batch
    from cvm_tpu.infer.pipeline import InferencePipeline
    from cvm_tpu.models import get_model

    ctx = (jax.default_device(cpu_device) if cpu_device is not None
           else contextlib.nullcontext())
    spec = get_model(spec_name)
    model = spec.create_model(cfg)
    two_frame = spec_name == "dmds"
    with ctx:
        variables = model.init(
            jax.random.PRNGKey(0),
            np.zeros((1, *cfg.input_hw, 6 if two_frame else 3), np.float32),
            train=False,
        )
        kw = {}
        if "fold" in variant:
            kw["fold_bn"] = True
        if variant.endswith("w8a8"):
            kw["w8a8"] = True
        elif "w8a8_static" in variant:
            # Calibrate eagerly on one tiny batch — scales only steer which
            # convs take the int8 path; values don't change FLOPs/bytes.
            from cvm_tpu.infer.quantize import calibrate_activation_scales

            calib = np.asarray(
                rng.standard_normal((min(cfg.batch_size, 2), *cfg.input_hw,
                                     6 if two_frame else 3)), np.float32)
            kw["w8a8"] = calibrate_activation_scales(
                lambda x: model.apply(variables, x, train=False), [calib])
        if cpu_device is not None:
            # Host numpy leaves are UNCOMMITTED, so the lowering below
            # follows the default backend (TPU) instead of sticking to the
            # CPU arrays' placement.
            variables = jax.tree.map(np.asarray, variables)
        pipe = InferencePipeline(spec, cfg, variables, **kw)

    pvars = pipe._variables
    if cpu_device is not None:
        pvars = jax.tree.map(np.asarray, pvars)
    if scope == "forward":
        # Model stage only (the program DESIGN.md §9 measured at 2.37 GB /
        # 352 GFLOP): bf16 input, summed outputs — separates the backbone's
        # accounting from the preprocess/decode ops of the e2e program.
        import jax.numpy as jnp

        x = np.zeros((cfg.batch_size, *cfg.input_hw,
                      6 if two_frame else 3), np.float32).astype(jnp.bfloat16)

        def fwd(v, xx):
            out = pipe._apply(v, xx, train=False)
            # tree.leaves: head outputs may nest lists (depth's multi-scale
            # pyramid) or dicts (dmds motion fields).
            return tuple(jnp.sum(t, dtype=jnp.float32)
                         for t in jax.tree.leaves(out))

        return jax.jit(fwd).lower(pvars, x).compile()

    pad = (int(cfg.input_hw[0] * 1.5) // 2 * 2,
           int(cfg.input_hw[1] * 1.5) // 2 * 2)
    b = synthetic_batch(rng, cfg.batch_size, pad, num_classes=5,
                        two_frame=two_frame)
    args = ((b["image"], b["image_hw"], b["image_t1"]) if two_frame
            else (b["image"], b["image_hw"]))
    return pipe._predict.lower(pvars, *args).compile()


def _lower_train(spec_name, cfg, rng):
    import jax

    from cvm_tpu.data.synthetic import synthetic_batch
    from cvm_tpu.models import get_model
    from cvm_tpu.train.loop import Trainer

    spec = get_model(spec_name)
    trainer = Trainer(spec, cfg)
    pad = (int(cfg.input_hw[0] * 1.5) // 2 * 2,
           int(cfg.input_hw[1] * 1.5) // 2 * 2)
    b = synthetic_batch(rng, cfg.batch_size, pad, num_classes=5,
                        two_frame=(spec_name == "dmds"))
    trainer.init_state(b)
    trainer.key, sub = jax.random.split(trainer.key)
    bd = jax.tree.map(lambda x: jax.device_put(x, trainer._batch_sh), b)
    return trainer.train_step.lower(trainer.state, bd, sub).compile()


def roofline_row(flops, bytes_acc, batch, chip, int8=False):
    bf16_peak, int8_peak, hbm = CHIPS[chip]
    peak = int8_peak if int8 else bf16_peak
    t_compute_ms = flops / (peak * 1e12) * 1e3 if flops else None
    t_bw_ms = bytes_acc / (hbm * 1e9) * 1e3 if bytes_acc else None
    row = {
        "gflops": round(flops / 1e9, 2) if flops else None,
        "bytes_gb": round(bytes_acc / 1e9, 4) if bytes_acc else None,
        "arith_intensity": (round(flops / bytes_acc, 1)
                            if flops and bytes_acc else None),
        "peak_tflops_used": peak,
        "t_compute_floor_ms": (round(t_compute_ms, 3)
                               if t_compute_ms is not None else None),
        "t_bandwidth_floor_ms": (round(t_bw_ms, 3)
                                 if t_bw_ms is not None else None),
    }
    floors = [t for t in (t_compute_ms, t_bw_ms) if t]
    if floors:
        t_floor = max(floors)
        row["bound"] = ("bandwidth" if t_bw_ms and t_bw_ms == t_floor
                        else "compute")
        row["ceiling_images_per_sec"] = round(batch / (t_floor / 1e3), 1)
        if t_compute_ms:
            row["mfu_ceiling_pct"] = round(100.0 * t_compute_ms / t_floor, 1)
    return row


def main(argv=None):
    p = argparse.ArgumentParser(
        description=__doc__, formatter_class=argparse.RawDescriptionHelpFormatter)
    p.add_argument("--configs", default="B")
    p.add_argument("--variants",
                   default="bf16,fold_bn,w8a8,w8a8_static,fold_w8a8_static",
                   help="serving variants (applied to infer-mode configs; "
                        "train-mode configs always run bf16)")
    p.add_argument("--chip", default="v5e", choices=sorted(CHIPS))
    p.add_argument("--hw", default=None, help="override input_hw as H,W")
    p.add_argument("--batch", type=int, default=None)
    p.add_argument("--out", default=None, help="also append JSON rows here")
    p.add_argument("--scope", default="e2e", choices=("e2e", "forward"),
                   help="e2e = full serving program (preprocess+forward+"
                        "decode); forward = model stage only (bf16 in, "
                        "summed heads out — DESIGN.md §9's 352-GFLOP unit)")
    p.add_argument("--tpu", action="store_true",
                   help="compile for the ambient TPU backend (concrete work "
                        "on CPU, compile-only RPC to the chip) — TPU-lowered "
                        "FLOPs/bytes without dispatching a single step, so "
                        "it tolerates timing-degraded tunnel windows")
    args = p.parse_args(argv)

    from cvm_tpu.utils.platform import apply_platform_env

    apply_platform_env()
    import jax

    cpu_device = None
    if args.tpu:
        # Both backends in one process: TPU (first = default, the compile
        # target) + CPU (all concrete init/calibration work).
        jax.config.update("jax_platforms", "axon,cpu")
        if jax.default_backend() == "cpu":
            p.error("--tpu: no TPU backend available in this environment")
        cpu_device = jax.devices("cpu")[0]
    backend = jax.default_backend()
    from cvm_tpu.cli.benchmark import _configs

    cfgs = _configs()
    rng = np.random.default_rng(0)
    rows = []
    for key in args.configs.split(","):
        key = key.strip().upper()
        if key not in cfgs:
            p.error(f"unknown config {key!r}; choose from {sorted(cfgs)}")
        spec_name, cfg, mode = cfgs[key]
        if args.hw:
            h, w = (int(v) for v in args.hw.split(","))
            cfg = cfg.replace(input_hw=(h, w))
        if args.batch:
            cfg = cfg.replace(batch_size=args.batch)
        variants = (args.variants.split(",") if mode == "infer" else ["bf16"])
        if mode == "train" and args.tpu:
            # Trainer.init_state executes on the default device — in --tpu
            # mode that would dispatch real steps to a possibly-degraded
            # chip; train-mode FLOPs from the CPU run are lowering-
            # independent anyway.
            log = {"config": key, "model": spec_name, "mode": mode,
                   "skipped": "train-mode configs need state init on-device; "
                              "use the CPU roofline for FLOPs"}
            print(json.dumps(log), flush=True)
            continue
        for variant in variants:
            variant = variant.strip()
            if mode == "train":
                compiled = _lower_train(spec_name, cfg, rng)
            else:
                compiled = _lower_infer(spec_name, cfg, variant, rng,
                                        cpu_device=cpu_device,
                                        scope=args.scope)
            flops, bytes_acc = _cost(compiled)
            row = {"config": key, "model": spec_name, "mode": mode,
                   "scope": args.scope if mode == "infer" else "train_step",
                   "variant": variant, "input_hw": list(cfg.input_hw),
                   "batch_size": cfg.batch_size, "chip": args.chip,
                   "lowering_backend": backend,
                   "bytes_caveat": ("cpu-lowered HLO: fusion/layout differ "
                                    "from TPU — bytes approximate"
                                    if backend == "cpu" else None)}
            row.update(roofline_row(flops, bytes_acc, cfg.batch_size,
                                    args.chip, int8=("w8a8" in variant)))
            print(json.dumps(row), flush=True)
            rows.append(row)
    if args.out:
        os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
        with open(args.out, "a") as f:
            for row in rows:
                f.write(json.dumps(row) + "\n")
    return 0


if __name__ == "__main__":
    sys.exit(main())
