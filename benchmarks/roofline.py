"""Static roofline analysis of the benchmark surface — no execution needed.

Lowers + compiles each BASELINE config's e2e program (and the serving-variant
ablation: BN-fold / dynamic W8A8 / static W8A8 / fold+static), reads XLA's
cost analysis for FLOPs, and estimates HBM traffic two ways:

- ``bytes_gb`` (basis ``hlo_dataflow``): fusion-aware dataflow through the
  optimized module's entry computation — operand+output bytes at scheduled-
  instruction boundaries only. This drives the roofline placement.
- ``bytes_gb_op_sum``: XLA cost analysis "bytes accessed", which sums over
  every instruction INCLUDING fusion-internal ones whose intermediates never
  leave VMEM — a fusion-blind upper bound (measured 4.6x the dataflow number
  on the TPU-lowered e2e CenterNet program, and its implied "floor" exceeded
  the actually measured latency). Kept for reference only.

Each program is then placed on the target chip's roofline: compute floor,
bandwidth floor, arithmetic intensity, bound-ness, and the throughput/MFU
*ceiling* no honest measurement can exceed.

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
import re
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


# --- fusion-aware HBM-traffic estimate from optimized HLO text -------------
#
# XLA's module-level cost analysis sums operand+output bytes over EVERY HLO
# instruction, including those inside fusion computations whose intermediates
# never leave VMEM/registers — measured 2026-08-19 on the TPU-lowered e2e
# CenterNet program: 14.5 GB op-sum vs 3.1 GB of actual entry-level dataflow
# (the op-sum "bandwidth floor" of 17.7 ms was above the *measured* 7.62 ms,
# which is physically impossible for a floor). The estimator below counts
# traffic only at fusion/op boundaries in the entry computation (and in
# computations reached via call/while/etc.), which is what actually moves
# through HBM: per scheduled instruction, bytes = sum(operand buffer sizes)
# + output size. Fusion bodies are skipped; scalar to_apply lambdas of
# reduce/scatter contribute ~nothing. A `while` body is counted ONCE (trip
# count is not recoverable from the text) and flagged in the caveat.

_HLO_DTYPE_BYTES = {
    "pred": 1, "u8": 1, "s8": 1, "f8e4m3fn": 1, "f8e5m2": 1,
    "u16": 2, "s16": 2, "f16": 2, "bf16": 2,
    "u32": 4, "s32": 4, "f32": 4,
    "u64": 8, "s64": 8, "f64": 8, "c64": 8, "c128": 16,
}
_HLO_SHAPE_RE = re.compile(r"(\w+)\[([\d,]*)\]")
_HLO_INSTR_RE = re.compile(
    r"^\s*(?:ROOT\s+)?(%[\w.\-]+)\s*=\s*(.+?)\s+([\w\-]+)\((.*)$")
# Zero-traffic ops: aliases/metadata (bitcast, tuple plumbing), and the
# second half of async pairs (the -start op carries the transfer).
_HLO_NO_TRAFFIC = {
    "bitcast", "tuple", "get-tuple-element", "parameter", "constant",
    "after-all", "copy-done", "async-done", "reshape",
}
_HLO_CALLERS = {"call", "while", "conditional", "sort", "map", "reduce",
                "reduce-window", "scatter", "select-and-scatter", "fusion"}


def _hlo_type_bytes(type_str: str) -> int:
    total = 0
    for dtype, dims in _HLO_SHAPE_RE.findall(type_str):
        if dtype not in _HLO_DTYPE_BYTES:
            continue  # token[...] that isn't an array type
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        total += n * _HLO_DTYPE_BYTES[dtype]
    return total


def hlo_dataflow_bytes(hlo_text: str):
    """(bytes, caveat) — entry-level dataflow traffic of an optimized module.

    Returns (None, reason) if the text can't be parsed into an entry
    computation (defensive: HLO text format is not a stable API).
    """
    defs = {}          # %name -> output buffer bytes
    comps = {}         # computation name -> [(op, out_bytes, operands, calls)]
    fusion_comps = set()
    entry = None
    cur = None
    for line in hlo_text.splitlines():
        # computation header: a top-level line opening a body brace, e.g.
        # "%fused_computation.1 (p0: f32[4]) -> f32[4] {" or
        # "ENTRY %main.30 (a: f32[], /*index=5*/ b: f32[]) -> f32[] {"
        # (the /*index=N*/ markers mean the segment before the brace can
        # contain '=' — match on the trailing brace, not on '=' absence)
        if not line.startswith(" ") and line.rstrip().endswith("{"):
            cur = line.split("(")[0].replace("ENTRY", "").strip().lstrip("%")
            comps[cur] = []
            if line.startswith("ENTRY"):
                entry = cur
            continue
        m = _HLO_INSTR_RE.match(line)
        if m is None or cur is None:
            continue
        name, type_str, op, rest = m.groups()
        out_bytes = _hlo_type_bytes(type_str)
        defs[name] = out_bytes
        # operand list = %names inside the first balanced paren group;
        # computation refs (calls=/body=/condition=/to_apply=/branch lists)
        # are every %name after it
        depth, split_at = 1, len(rest)
        for i, ch in enumerate(rest):
            if ch == "(":
                depth += 1
            elif ch == ")":
                depth -= 1
                if depth == 0:
                    split_at = i
                    break
        operands = re.findall(r"%[\w.\-]+", rest[:split_at])
        calls = [c.lstrip("%")
                 for c in re.findall(r"%[\w.\-]+", rest[split_at:])]
        if op == "fusion":
            fusion_comps.update(calls)
        comps[cur].append((op, out_bytes, operands, calls))
    if entry is None or not comps.get(entry):
        return None, "hlo parse: no entry computation"
    total = 0
    has_while = False
    visited = set()
    stack = [entry]
    while stack:
        comp = stack.pop()
        if comp in visited or comp not in comps:
            continue
        visited.add(comp)
        for op, out_bytes, operands, calls in comps[comp]:
            if op in _HLO_NO_TRAFFIC:
                continue
            if op == "while":
                has_while = True
            if op in _HLO_CALLERS and op != "fusion":
                stack.extend(c for c in calls if c not in fusion_comps)
                if op == "call":
                    continue  # the call itself moves nothing; its body does
            # dict.fromkeys: dedupe REPEATED operands of one op while
            # keeping order — the same buffer passed twice (e.g. a Pallas
            # call taking main + halo views of one array) is one HBM read
            # stream, not N; counting it N times showed the fused-qconv
            # variant +39% over bf16 where the physical traffic is ~parity.
            total += out_bytes + sum(defs.get(o, 0)
                                     for o in dict.fromkeys(operands))
    caveat = ("hlo_dataflow: while body counted once (trip count unknown)"
              if has_while else None)
    return total, caveat


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
        elif "w8a8_static" in variant or "w8a8_fused" in variant:
            # Calibrate eagerly on one tiny batch — scales only steer which
            # convs take the int8 path; values don't change FLOPs/bytes.
            from cvm_tpu.infer.quantize import calibrate_activation_scales

            calib = np.asarray(
                rng.standard_normal((min(cfg.batch_size, 2), *cfg.input_hw,
                                     6 if two_frame else 3)), np.float32)
            kw["w8a8"] = calibrate_activation_scales(
                lambda x: model.apply(variables, x, train=False), [calib])
            if "w8a8_fused" in variant:
                # The Pallas kernel path: in --tpu mode this IS the
                # hardware compile-check the Pallas invariant demands —
                # Mosaic lowering happens inside the compile RPC, and a
                # kernel interpret-mode wrongly accepted fails right here.
                kw["w8a8_fused"] = True
                if "chain" in variant:
                    kw["w8a8_chain"] = True  # int8-resident ResBlock c1→c2
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
                   default="bf16,fold_bn,w8a8,w8a8_static,fold_w8a8_static,"
                           "w8a8_fused",
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
            flops, bytes_op_sum = _cost(compiled)
            try:
                df_bytes, df_caveat = hlo_dataflow_bytes(compiled.as_text())
            except Exception as e:  # text format drift must not kill the run
                df_bytes, df_caveat = None, f"hlo parse failed: {e}"
            # The dataflow estimate drives the roofline when available — the
            # op-sum counts fusion-internal bytes that never touch HBM and
            # has produced "floors" above measured times (see estimator note).
            bytes_acc = df_bytes if df_bytes else bytes_op_sum
            caveats = [c for c in (
                ("cpu-lowered HLO: fusion/layout differ from TPU — bytes "
                 "approximate" if backend == "cpu" else None),
                df_caveat if df_bytes else None,
                (None if df_bytes else
                 "op-sum bytes only (fusion-blind upper bound)"),
                ("pallas custom-call internals invisible to cost analysis: "
                 "FLOPs undercounted (cross-ref the bf16 row); bytes count "
                 "the call's HBM-visible operands/results — exactly the "
                 "byte-parity question" if "fused" in variant else None),
            ) if c]
            row = {"config": key, "model": spec_name, "mode": mode,
                   "scope": args.scope if mode == "infer" else "train_step",
                   "variant": variant, "input_hw": list(cfg.input_hw),
                   "batch_size": cfg.batch_size, "chip": args.chip,
                   "lowering_backend": backend,
                   "bytes_basis": ("hlo_dataflow" if df_bytes
                                   else "cost_analysis_op_sum"),
                   "bytes_gb_op_sum": (round(bytes_op_sum / 1e9, 4)
                                       if bytes_op_sum else None),
                   "bytes_caveat": "; ".join(caveats) or None}
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
