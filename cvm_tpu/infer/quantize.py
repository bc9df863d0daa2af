"""Post-training quantization of model weights (int8, per-output-channel).

The reference's deployment path is full-int8 TFLite for EdgeTPU
(SURVEY.md §3.5). The TPU-native serving analogue here is weight-only int8:
conv/dense kernels are stored as int8 with per-output-channel fp scales
(4x smaller artifacts, less weight HBM traffic), dequantized to bf16 at
load/apply time where the MXU runs them natively. Full W8A8 (int8
activations on the MXU int8 path) is a planned extension; the storage format
already carries what it needs.
"""

from __future__ import annotations

import sys
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

# Kernels eligible for int8: conv/dense weight arrays (name "kernel").
_QUANT_KEY = "kernel"
_MIN_SIZE = 256  # don't bother quantizing tiny tensors


def quantize_params(params: Any) -> Tuple[Any, Dict[str, int]]:
    """fp param pytree → pytree where eligible kernels become
    {"int8": int8 array, "scale": (C_out,) fp32}; everything else unchanged."""
    n_quant = 0
    n_total = 0

    def visit(tree):
        nonlocal n_quant, n_total
        out = {}
        for k, v in tree.items():
            if isinstance(v, dict):
                out[k] = visit(v)
                continue
            n_total += 1
            arr = np.asarray(v)
            if (
                k == _QUANT_KEY
                and arr.ndim >= 2
                and arr.size >= _MIN_SIZE
                and arr.dtype in (np.float32, np.float16)
            ):
                # Per-output-channel symmetric scales (last axis = C_out for
                # both conv HWIO and dense IO kernels).
                amax = np.max(np.abs(arr), axis=tuple(range(arr.ndim - 1)))
                scale = (amax / 127.0 + 1e-12).astype(np.float32)
                q = np.clip(np.round(arr / scale), -127, 127).astype(np.int8)
                out[k] = {"int8": q, "scale": scale}
                n_quant += 1
            else:
                out[k] = v
        return out

    qtree = visit(jax.device_get(params))
    return qtree, {"quantized": n_quant, "total": n_total}


def map_quantized_leaves(tree: Any, fn) -> Any:
    """Walk a (possibly quantized) param pytree, replacing every
    {"int8", "scale"} leaf with ``fn(int8_arr, scale_arr)``. The ONE place
    that knows the quantized-leaf format (runtime + dequantize share it)."""

    def visit(node):
        out = {}
        for k, v in node.items():
            if isinstance(v, dict):
                if set(v.keys()) == {"int8", "scale"}:
                    out[k] = fn(v["int8"], v["scale"])
                else:
                    out[k] = visit(v)
            else:
                out[k] = v
        return out

    return visit(tree)


def dequantize_params(qparams: Any, dtype=jnp.float32) -> Any:
    """Inverse of quantize_params: rebuild an fp pytree for model.apply."""
    return map_quantized_leaves(
        qparams, lambda q, s: jnp.asarray(q, dtype) * jnp.asarray(s, dtype)
    )


# ---------------------------------------------------------------------------
# Full W8A8 int8 inference (dynamic activation quantization).
#
# A flax method interceptor swaps every nn.Conv's matmul for an int8 path at
# apply time — no model-code or checkpoint changes:
#   x_q = round(x / sx) int8 with per-tensor dynamic sx = max|x|/127
#   w_q = round(w / sw) int8 with per-output-channel sw
#   y   = conv(x_q, w_q) accumulated in int32 on the MXU int8 path,
#         dequantized by sx*sw and biased in fp32.
# Weight quantization happens inside the jitted program (one elementwise pass
# over weights, negligible next to the conv); no calibration set is needed.
#
# Status: numerically verified on-chip (decoded scores match fp to ~1e-4),
# but the current backend does NOT lower int8 convolutions onto the MXU int8
# path (measured 25x slower than bf16 on the dev chip), so this stays opt-in;
# weight-only int8 (quantize_params) is the production quantization for now.
# ---------------------------------------------------------------------------

import contextlib

from flax import linen as nn


def conv_geometry(mod: "nn.Conv") -> Dict[str, Any]:
    """lax.conv_general_dilated kwargs reproducing an nn.Conv's geometry —
    the one place that maps flax conv attributes onto lax (shared by the
    int8 inference paths here and train/qat.py's fake-quant conv)."""

    def _pair(v):
        if v is None:
            return (1, 1)
        return v if isinstance(v, (tuple, list)) else (v, v)

    return dict(
        window_strides=_pair(mod.strides), padding=mod.padding,
        lhs_dilation=_pair(mod.input_dilation),
        rhs_dilation=_pair(mod.kernel_dilation),
        feature_group_count=mod.feature_group_count,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def _int8_conv(mod: "nn.Conv", x):
    from jax import lax

    kernel = mod.variables["params"]["kernel"]
    bias = mod.variables["params"].get("bias") if mod.use_bias else None

    xf = x.astype(jnp.float32)
    sx = jnp.max(jnp.abs(xf)) / 127.0 + 1e-8
    xq = jnp.round(jnp.clip(xf / sx, -127, 127)).astype(jnp.int8)

    kf = jnp.asarray(kernel, jnp.float32)
    sw = jnp.max(jnp.abs(kf), axis=tuple(range(kf.ndim - 1))) / 127.0 + 1e-12
    wq = jnp.round(jnp.clip(kf / sw, -127, 127)).astype(jnp.int8)

    y = lax.conv_general_dilated(
        xq, wq, preferred_element_type=jnp.int32, **conv_geometry(mod),
    )
    y = y.astype(jnp.float32) * (sx * sw)
    if bias is not None:
        y = y + jnp.asarray(bias, jnp.float32)
    return y.astype(mod.dtype or jnp.float32)


def _w8a8_interceptor(next_fn, args, kwargs, context):
    mod = context.module
    if isinstance(mod, nn.Conv) and context.method_name == "__call__":
        try:
            return _int8_conv(mod, args[0])
        except (KeyError, TypeError):
            return next_fn(*args, **kwargs)  # unbound/odd conv → fp path
    return next_fn(*args, **kwargs)


@contextlib.contextmanager
def w8a8_inference():
    """Context manager: every nn.Conv inside runs the int8 MXU path."""
    with nn.intercept_methods(_w8a8_interceptor):
        yield


# ---------------------------------------------------------------------------
# Static-calibrated W8A8.
#
# The dynamic path above computes max|x| per conv per batch — a full
# reduction pass over every activation, which costs the HBM bandwidth the
# int8 path is supposed to save. With CALIBRATED static scales the
# quantize op (x/s → round → clip → int8) is purely elementwise, so XLA can
# fuse it into the previous conv's epilogue (conv → BN/ReLU → requant in one
# fusion) and the only buffer materialized between convs is int8 — halving
# activation HBM traffic on the memory-bound serving path (DESIGN.md §8).
# ---------------------------------------------------------------------------


def _module_path(context) -> str:
    return "/".join(str(p) for p in context.module.path)


def calibrate_activation_scales(
    apply_fn, inputs, percentile: float = 99.9
) -> Dict[str, float]:
    """Run ``apply_fn(x)`` over calibration inputs, recording per-conv input
    ranges → {module_path: scale}. ``apply_fn`` must invoke the flax model
    EAGERLY (e.g. lambda x: model.apply(variables, x, train=False) — NOT
    jitted: the recorder reads concrete activation values).

    Percentile-of-|x| calibration (not the max) — a handful of outlier
    activations shouldn't cost the whole tensor its resolution.
    """
    records: Dict[str, list] = {}
    failed: Dict[str, str] = {}

    def interceptor(next_fn, args, kwargs, context):
        if isinstance(context.module, nn.Conv) and context.method_name == "__call__":
            path = _module_path(context)
            try:
                x = np.abs(np.asarray(jax.device_get(args[0]), np.float32))
                amax = float(np.percentile(x, percentile))
                records.setdefault(path, []).append(amax)
            except Exception as e:
                # A conv that fails to record silently serves fp — make
                # partial calibration visible (once per conv, not per input).
                if path not in failed:
                    failed[path] = f"{type(e).__name__}: {e}"
                    print(f"calibrate_activation_scales: {path} NOT "
                          f"calibrated ({failed[path]}) — will serve fp",
                          file=sys.stderr, flush=True)
        return next_fn(*args, **kwargs)

    with nn.intercept_methods(interceptor):
        for x in inputs:
            jax.block_until_ready(apply_fn(x))

    if not records:
        raise RuntimeError(
            "calibration recorded no conv activations — apply_fn must run "
            "the flax model eagerly (un-jitted) over concrete inputs"
        )
    return {k: max(v) / 127.0 + 1e-12 for k, v in records.items()}


def _int8_conv_static(mod: "nn.Conv", x, sx: float):
    from jax import lax

    kernel = mod.variables["params"]["kernel"]
    bias = mod.variables["params"].get("bias") if mod.use_bias else None

    # Purely elementwise quantize with a STATIC scale — fuses into the
    # producer's epilogue; the materialized inter-layer buffer is int8.
    xq = jnp.round(jnp.clip(x.astype(jnp.float32) / sx, -127, 127)).astype(jnp.int8)

    kf = jnp.asarray(kernel, jnp.float32)
    sw = jnp.max(jnp.abs(kf), axis=tuple(range(kf.ndim - 1))) / 127.0 + 1e-12
    wq = jnp.round(jnp.clip(kf / sw, -127, 127)).astype(jnp.int8)

    # int32 accumulator output, DELIBERATELY: the s32 result buffer (plus a
    # layout copy XLA cannot fuse through) costs 540 MB/batch of extra HBM
    # traffic on the 512f b8 serving program (forward dataflow 2.69 GB vs
    # bf16's 1.58, runs/roofline_tpu.json), and preferred_element_type=
    # bfloat16 removes it (2.69 -> 2.13 GB) — but the bf16 rounding of the
    # accumulated preactivation was MEASURED to cost 1.8 mAP on the flagship
    # 512f checkpoint (0.8962 -> 0.8778, runs/acc512_bf16acc/, 2026-08-19),
    # so the byte saving is rejected. This is part of why static W8A8 loses
    # to weight-only int8 on this memory-bound program (DESIGN.md §9b).
    y = lax.conv_general_dilated(
        xq, wq, preferred_element_type=jnp.int32, **conv_geometry(mod),
    )
    y = y.astype(jnp.float32) * (sx * sw)
    if bias is not None:
        y = y + jnp.asarray(bias, jnp.float32)
    return y.astype(mod.dtype or jnp.float32)


@contextlib.contextmanager
def w8a8_static_inference(scales: Dict[str, float]):
    """Every nn.Conv with a calibrated scale runs the static int8 path;
    uncalibrated convs fall back to fp."""

    def interceptor(next_fn, args, kwargs, context):
        mod = context.module
        if isinstance(mod, nn.Conv) and context.method_name == "__call__":
            sx = scales.get(_module_path(context))
            if sx is not None:
                try:
                    return _int8_conv_static(mod, args[0], sx)
                except (KeyError, TypeError):
                    return next_fn(*args, **kwargs)
        return next_fn(*args, **kwargs)

    with nn.intercept_methods(interceptor):
        yield


# ---------------------------------------------------------------------------
# Fused W8A8 (Pallas kernel path).
#
# w8a8_static_inference above composes the int8 path from XLA ops; the
# lowered program materializes the s32 accumulator + f32 dequant/requant
# chain between convs, measured to ADD 70-125% HBM traffic (DESIGN.md §9b).
# This interceptor instead replaces each eligible ConvBN BODY (conv + BN
# inference affine + activation) with ops/pallas/fused_qconv.py: quantize,
# int8 MXU dot, dequant/BN/act epilogue — all VMEM-resident, so HBM sees
# bf16 in / int8 weights / bf16 out, byte-parity with the bf16 conv.
# Numerics match w8a8_static_inference (same per-channel weight grid, same
# static activation lattice; BN runs exactly in fp32 inside the epilogue).
# ---------------------------------------------------------------------------


def prequantize_fused_weights(variables: Dict[str, Any]) -> Dict[str, tuple]:
    """Host-side weight quantization for the fused path: {ConvBN module
    path: (wq int8, sw (C,) fp32)} for every conv kernel nested under a
    conv/ child — the deployment posture. Quantizing IN-program instead
    (the fallback below) makes the compiled program read the fp32 kernels
    from HBM AND materialize int8 copies: the TPU-lowered e2e dataflow
    measured +25% bytes vs bf16 (3.77 vs 3.01 GB, 2026-08-20) where the
    pre-quantized table embeds int8 weight constants and the fp32 kernels
    become dead args. Same grid as the in-program path (identical formula),
    so numerics are unchanged."""
    table: Dict[str, tuple] = {}

    def visit(node, path):
        for k, v in node.items():
            if not isinstance(v, dict):
                continue
            conv = v.get("conv")
            if isinstance(conv, dict) and "kernel" in conv:
                kf = np.asarray(conv["kernel"], np.float32)
                sw = (np.max(np.abs(kf), axis=tuple(range(kf.ndim - 1)))
                      / 127.0 + 1e-12).astype(np.float32)
                wq = np.round(np.clip(kf / sw, -127, 127)).astype(np.int8)
                table["/".join(path + (k,))] = (wq, sw)
            visit(v, path + (k,))

    params = jax.device_get(variables.get("params", {}))
    conv = params.get("conv")
    if isinstance(conv, dict) and "kernel" in conv:  # bare ConvBN at root
        kf = np.asarray(conv["kernel"], np.float32)
        sw = (np.max(np.abs(kf), axis=tuple(range(kf.ndim - 1)))
              / 127.0 + 1e-12).astype(np.float32)
        table[""] = (np.round(np.clip(kf / sw, -127, 127)).astype(np.int8),
                     sw)
    visit(params, ())
    return table


def _fused_convbn(mod, x, sx: float, int8_dot: bool, interpret: bool,
                  wq_sw=None):
    from cvm_tpu.ops.pallas.fused_qconv import fused_qconv

    if mod.act is None:
        act = None
    elif mod.act is nn.silu:
        act = "silu"
    elif mod.act is nn.relu:
        act = "relu"
    else:
        return None  # unknown activation — serve the fp path

    params = mod.variables["params"]
    if wq_sw is not None:
        # Pre-quantized (host) weights: int8 constants in the program; the
        # fp32 kernels are never read.
        wq = jnp.asarray(wq_sw[0])
        sw = jnp.asarray(wq_sw[1])
    else:
        kf = jnp.asarray(params["conv"]["kernel"], jnp.float32)
        sw = (jnp.max(jnp.abs(kf), axis=tuple(range(kf.ndim - 1))) / 127.0
              + 1e-12)
        wq = jnp.round(jnp.clip(kf / sw, -127, 127)).astype(jnp.int8)

    if mod.use_bn:
        bnp = params["bn"]
        stats = mod.variables["batch_stats"]["bn"]
        # flax default epsilon — kept in sync with ConvBN (models/layers.py)
        a = jnp.asarray(bnp["scale"], jnp.float32) * jax.lax.rsqrt(
            jnp.asarray(stats["var"], jnp.float32) + 1e-5)
        b = jnp.asarray(bnp["bias"], jnp.float32) - jnp.asarray(
            stats["mean"], jnp.float32) * a
    else:
        cout = wq.shape[-1]
        a = jnp.ones((cout,), jnp.float32)
        bias = params["conv"].get("bias")
        b = (jnp.asarray(bias, jnp.float32) if bias is not None
             else jnp.zeros((cout,), jnp.float32))

    y = fused_qconv(
        x, wq, scale=float(sx) * sw * a, bias=b,
        inv_sx=1.0 / float(sx), act=act, int8_dot=int8_dot,
        out_dtype=mod.dtype or jnp.bfloat16, interpret=interpret,
    )
    return y


def _bn_affine(bn_params, bn_stats):
    """Inference-time BN as a per-channel (a, b) affine, fp32 —
    flax default epsilon, kept in sync with ConvBN (models/layers.py)."""
    a = jnp.asarray(bn_params["scale"], jnp.float32) * jax.lax.rsqrt(
        jnp.asarray(bn_stats["var"], jnp.float32) + 1e-5)
    b = jnp.asarray(bn_params["bias"], jnp.float32) - jnp.asarray(
        bn_stats["mean"], jnp.float32) * a
    return a, b


def _fused_resblock(mod, x, scales, wtab, path, int8_dot, interpret):
    """Int8-resident chained ResBlock (DESIGN.md §9c's open lever):

    ResBlock's dataflow is STATIC — c1's output feeds ONLY c2 — so c1's
    epilogue can requantize straight into c2's calibrated lattice and the
    h buffer between them lives in HBM as int8 (half the bytes of bf16).
    The lattice values are the ones the unchained path computes (c2's own
    input-quantize does the identical round/clip), so chaining moves the
    quantize, not the math. Returns None when any piece is missing —
    the per-ConvBN interceptor then handles c1/c2/proj individually."""
    params = mod.variables["params"]
    stats = mod.variables.get("batch_stats", {})
    pre = path + "/" if path else ""
    sx1 = scales.get(f"{pre}c1/conv")
    sx2 = scales.get(f"{pre}c2/conv")
    if not wtab or sx1 is None or sx2 is None:
        return None
    need_proj = x.shape[-1] != mod.features
    sxp = scales.get(f"{pre}proj/conv") if need_proj else None
    if need_proj and (sxp is None or f"{pre}proj" not in wtab):
        return None
    if (f"{pre}c1" not in wtab or f"{pre}c2" not in wtab
            or "c1" not in stats or "c2" not in stats):
        return None
    from cvm_tpu.ops.pallas.fused_qconv import fused_qconv

    wq1, sw1 = wtab[f"{pre}c1"]
    wq2, sw2 = wtab[f"{pre}c2"]
    a1, b1 = _bn_affine(params["c1"]["bn"], stats["c1"]["bn"])
    a2, b2 = _bn_affine(params["c2"]["bn"], stats["c2"]["bn"])
    out_dtype = mod.dtype or jnp.bfloat16
    h_q = fused_qconv(
        x, jnp.asarray(wq1), scale=float(sx1) * jnp.asarray(sw1) * a1,
        bias=b1, inv_sx=1.0 / float(sx1), act="silu", int8_dot=int8_dot,
        out_dtype=jnp.int8, inv_s_out=1.0 / float(sx2), interpret=interpret,
    )
    h = fused_qconv(
        h_q, jnp.asarray(wq2), scale=float(sx2) * jnp.asarray(sw2) * a2,
        bias=b2, inv_sx=None, act=None, int8_dot=int8_dot,
        out_dtype=out_dtype, interpret=interpret,
    )
    if need_proj:
        wqp, swp = wtab[f"{pre}proj"]
        ap, bp = _bn_affine(params["proj"]["bn"], stats["proj"]["bn"])
        x = fused_qconv(
            x, jnp.asarray(wqp), scale=float(sxp) * jnp.asarray(swp) * ap,
            bias=bp, inv_sx=1.0 / float(sxp), act=None, int8_dot=int8_dot,
            out_dtype=out_dtype, interpret=interpret,
        )
    return nn.silu(x.astype(out_dtype) + h)


@contextlib.contextmanager
def w8a8_fused_inference(scales: Dict[str, float], int8_dot: bool = True,
                         interpret: bool = None, weight_table=None,
                         chain: bool = False):
    """Every stride-1 1x1/3x3 ConvBN whose inner conv has a calibrated
    scale runs the fused Pallas int8 kernel; everything else (stem,
    strided convs, heads, uncalibrated convs) serves fp. Scales use the
    same {conv_module_path: sx} dict as w8a8_static_inference.
    interpret=None auto-selects the Pallas interpreter off-TPU (CPU CI).
    ``weight_table`` (prequantize_fused_weights): host-prequantized int8
    weights — the deployment posture; without it each eligible conv
    re-quantizes its fp32 kernel inside the program (+25% measured HBM).
    ``chain``: additionally intercept whole ResBlocks and keep the c1→c2
    buffer int8-resident (needs weight_table)."""
    from cvm_tpu.models.layers import ConvBN, ResBlock
    from cvm_tpu.utils.backend import is_tpu_backend

    if interpret is None:
        interpret = not is_tpu_backend()

    def interceptor(next_fn, args, kwargs, context):
        mod = context.module
        if (chain and isinstance(mod, ResBlock)
                and context.method_name == "__call__"):
            train = kwargs.get("train", args[1] if len(args) > 1 else False)
            if not train:
                try:
                    y = _fused_resblock(mod, args[0], scales, weight_table,
                                        _module_path(context), int8_dot,
                                        interpret)
                except (KeyError, TypeError, AssertionError):
                    y = None
                if y is not None:
                    return y
        if isinstance(mod, ConvBN) and context.method_name == "__call__":
            train = kwargs.get("train", args[1] if len(args) > 1 else False)
            path = _module_path(context)
            sx = scales.get(path + "/conv" if path else "conv")
            if (
                not train
                and sx is not None
                and mod.stride == 1
                and mod.kernel in (1, 3)
                and mod.spatial_mesh is None
            ):
                wq_sw = weight_table.get(path) if weight_table else None
                try:
                    y = _fused_convbn(mod, args[0], sx, int8_dot, interpret,
                                      wq_sw=wq_sw)
                except (KeyError, TypeError, AssertionError):
                    y = None
                if y is not None:
                    return y
        return next_fn(*args, **kwargs)

    with nn.intercept_methods(interceptor):
        yield


def quantization_error(params: Any, qparams: Any) -> float:
    """Max relative Frobenius error across quantized tensors (sanity metric)."""
    errs = []

    def visit(a, b):
        for k in a:
            if isinstance(a[k], dict) and not (
                isinstance(b[k], dict) and set(b[k].keys()) == {"int8", "scale"}
            ):
                visit(a[k], b[k])
            elif isinstance(b[k], dict) and set(b[k].keys()) == {"int8", "scale"}:
                orig = np.asarray(a[k], np.float32)
                deq = np.asarray(b[k]["int8"], np.float32) * np.asarray(b[k]["scale"])
                errs.append(
                    float(np.linalg.norm(orig - deq) / (np.linalg.norm(orig) + 1e-12))
                )

    visit(jax.device_get(params), qparams)
    return max(errs) if errs else 0.0
