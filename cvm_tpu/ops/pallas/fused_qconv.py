"""Pallas TPU kernel: fused W8A8 conv — quantize → int8 MXU dot → dequant
→ BN affine → activation, all inside VMEM.

Why this kernel exists (DESIGN.md §9b conclusion 2): the XLA-composed static
W8A8 path (`infer/quantize.py::w8a8_static_inference`) INCREASES HBM traffic
70-125% over bf16 on the memory-bound serving program — the s32 accumulator
buffer, a layout copy XLA cannot fuse through, and the f32 dequant/requant
chain all materialize between convs. The compile-side verdict was "static
W8A8 cannot win on this program without a fused-requant kernel". This is
that kernel: the only HBM traffic is the bf16 input read, the int8 weight
read, and the bf16 output write — byte-parity with the bf16 conv (the s32 /
f32 intermediates never leave VMEM) while the MXU runs the 2x-peak int8
path (394 int8 TOP/s vs 197 bf16 TFLOP/s on v5e).

Scope: stride-1 SAME NHWC convs with 1x1 or 3x3 kernels — the ConvBN bodies
that carry ~all backbone/decoder FLOPs (`models/layers.py`). Strided convs,
the stem, and heads stay on the fallback paths. The BN inference affine and
the activation run in fp32 INSIDE the epilogue on the dequantized values, so
(unlike `fold_bn` + int8, measured −1.3 mAP in DESIGN §8) the int8 weight
grid is NOT coarsened: weights quantize per-output-channel on the raw conv
kernel, exactly like `w8a8_static_inference`.

3x3 halo handling: the H dimension is tiled; each grid step reads its row
block plus two single-row halo blocks (separate BlockSpecs whose row-block
size is 1, so their index maps address raw rows, clamped at the image edge
and zeroed in-kernel). W stays whole per block; the ±1 column taps are
in-VMEM shifts with zero fill (SAME padding).

Reference analogue: the TFLite full-int8 conv kernels the reference's
EdgeTPU deployment runs (SURVEY.md §3.5) — requantization fused into the
conv, integer-resident between ops.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _quantize(x, inv_sx: Optional[float], dot_dtype):
    """f32 tile → quantized-value tile in the dot input dtype.

    int8: exact integer lattice. bfloat16: the SAME lattice values held in
    bf16 (ints ≤ 127 are exact in bf16) — for backends where Mosaic lacks
    the s8 MXU path; products are exact, only the f32 accumulation rounds
    (≲1e-7 relative at these depths).

    inv_sx=None: the input is ALREADY lattice points (int8-resident
    chaining — the producer's epilogue quantized into THIS conv's
    lattice); just cast to the dot dtype.
    """
    if inv_sx is None:
        return x.astype(dot_dtype)
    q = jnp.round(jnp.clip(x.astype(jnp.float32) * inv_sx, -127.0, 127.0))
    return q.astype(dot_dtype)


def _epilogue(acc, sc_ref, bi_ref, act: Optional[str], out_dtype,
              inv_s_out: Optional[float] = None):
    y = acc.astype(jnp.float32) * sc_ref[0][None, :] + bi_ref[0][None, :]
    if act == "silu":
        y = y * jax.nn.sigmoid(y)
    elif act == "relu":
        y = jnp.maximum(y, 0.0)
    if inv_s_out is not None:
        # Int8-resident output: requantize into the CONSUMER's calibrated
        # lattice inside VMEM — the inter-conv HBM buffer becomes int8.
        # Same lattice math the consumer's own input-quantize would do, so
        # chaining changes which buffer holds the values, not the values.
        y = jnp.round(jnp.clip(y * inv_s_out, -127.0, 127.0))
    return y.astype(out_dtype)


def _kernel_1x1(xm_ref, w_ref, sc_ref, bi_ref, out_ref, *,
                inv_sx, act, dot_dtype, acc_dtype, inv_s_out=None):
    bh, W, cin = xm_ref.shape[1:]
    xq = _quantize(xm_ref[0], inv_sx, dot_dtype).reshape(bh * W, cin)
    acc = jax.lax.dot_general(
        xq, w_ref[0, 0], (((1,), (0,)), ((), ())),
        preferred_element_type=acc_dtype,
    )
    out_ref[0] = _epilogue(acc, sc_ref, bi_ref, act, out_ref.dtype,
                           inv_s_out=inv_s_out).reshape(bh, W, -1)


def _kernel_3x3(xm_ref, xt_ref, xb_ref, w_ref, sc_ref, bi_ref, out_ref, *,
                inv_sx, act, dot_dtype, acc_dtype, n_row_blocks,
                inv_s_out=None):
    i = pl.program_id(1)
    bh, W, cin = xm_ref.shape[1:]
    bn = out_ref.shape[-1]

    top = xt_ref[0, 0]  # (W, Cin) — global row i*bh-1, clamped at 0
    bot = xb_ref[0, 0]  # (W, Cin) — global row i*bh+bh, clamped at H-1
    # Clamped halo rows that fall outside the image contribute zeros (SAME).
    top = jnp.where(i == 0, jnp.zeros_like(top), top)
    bot = jnp.where(i == n_row_blocks - 1, jnp.zeros_like(bot), bot)

    xt = jnp.concatenate([top[None], xm_ref[0], bot[None]], axis=0)
    xq = _quantize(xt, inv_sx, dot_dtype)  # (bh+2, W, Cin)

    zcol = jnp.zeros((bh, 1, cin), dtype=xq.dtype)
    acc = jnp.zeros((bh * W, bn), acc_dtype)
    for dy in range(3):
        rows = xq[dy:dy + bh]  # output row r reads input row r+dy-1 ✓
        for dx in range(3):
            # W == 1 (a 1-wide feature map, e.g. a 32x input at the deepest
            # stage): the +-1 column taps fall entirely in the SAME-padding
            # zeros, and the rows[:, :-1] / rows[:, 1:] slices would be
            # ZERO-width — Mosaic rejects zero-sized vectors (caught by the
            # on-hardware compile check; interpret mode accepted them).
            if dx == 0:      # input col c-1: shift right, zero at col 0
                tap = (jnp.concatenate([zcol, rows[:, :-1]], axis=1)
                       if W > 1 else jnp.zeros_like(rows))
            elif dx == 2:    # input col c+1: shift left, zero at col W-1
                tap = (jnp.concatenate([rows[:, 1:], zcol], axis=1)
                       if W > 1 else jnp.zeros_like(rows))
            else:
                tap = rows
            acc = acc + jax.lax.dot_general(
                tap.reshape(bh * W, cin), w_ref[dy, dx],
                (((1,), (0,)), ((), ())),
                preferred_element_type=acc_dtype,
            )
    out_ref[0] = _epilogue(acc, sc_ref, bi_ref, act, out_ref.dtype,
                           inv_s_out=inv_s_out).reshape(bh, W, bn)


def _pick_bh(H: int, W: int) -> int:
    """Largest divisor of H keeping the (bh*W, 128) int32 accumulator (and
    the f32 x tile) within a few MB of the ~16 MB VMEM budget."""
    target = max(1, 4096 // max(W, 1))
    bh = 1
    for d in range(1, min(H, 32) + 1):
        if H % d == 0 and d <= target:
            bh = d
    return bh


@functools.partial(
    jax.jit,
    static_argnames=("inv_sx", "act", "int8_dot", "interpret", "out_dtype",
                     "inv_s_out"),
)
def fused_qconv(
    x: jnp.ndarray,          # (B, H, W, Cin) fp — or int8 lattice points
    w_q: jnp.ndarray,        # (kh, kw, Cin, Cout) int8
    scale: jnp.ndarray,      # (Cout,) f32 — sx * sw * bn_a (combined)
    bias: jnp.ndarray,       # (Cout,) f32 — bn_b (or conv bias)
    *,
    inv_sx: Optional[float],  # static calibrated 1/sx; None = x is ALREADY
                              # int8 lattice points in this conv's scale
                              # (int8-resident chaining)
    act: Optional[str] = "silu",
    int8_dot: bool = True,   # False: bf16 lattice values, f32 accumulate
    out_dtype=jnp.bfloat16,
    interpret: bool = False,
    inv_s_out: Optional[float] = None,  # set (with out_dtype=int8): requant
                                        # the epilogue into the CONSUMER's
                                        # lattice — int8 inter-conv buffer
) -> jnp.ndarray:
    B, H, W, Cin = x.shape
    kh, kw, wcin, Cout = w_q.shape
    assert (kh, kw) in ((1, 1), (3, 3)), "fused_qconv: 1x1/3x3 only"
    assert wcin == Cin, (wcin, Cin)
    assert scale.shape == (Cout,) and bias.shape == (Cout,)
    if inv_sx is None:
        assert x.dtype == jnp.int8, "inv_sx=None needs an int8 lattice input"
    if inv_s_out is not None:
        assert out_dtype == jnp.int8, "inv_s_out emits int8 lattice points"

    bh = _pick_bh(H, W)
    bn = Cout if Cout <= 128 else 128
    assert Cout % bn == 0, f"Cout {Cout} not tileable by {bn}"
    nH, nC = H // bh, Cout // bn
    grid = (B, nH, nC)

    dot_dtype = jnp.int8 if int8_dot else jnp.bfloat16
    acc_dtype = jnp.int32 if int8_dot else jnp.float32

    sc2 = scale.astype(jnp.float32).reshape(1, Cout)
    bi2 = bias.astype(jnp.float32).reshape(1, Cout)

    x_main = pl.BlockSpec((1, bh, W, Cin), lambda b, i, j: (b, i, 0, 0))
    w_spec = pl.BlockSpec((kh, kw, Cin, bn), lambda b, i, j: (0, 0, 0, j))
    sc_spec = pl.BlockSpec((1, bn), lambda b, i, j: (0, j))
    out_spec = pl.BlockSpec((1, bh, W, bn), lambda b, i, j: (b, i, 0, j))

    inv_sx_f = None if inv_sx is None else float(inv_sx)
    inv_s_out_f = None if inv_s_out is None else float(inv_s_out)
    if (kh, kw) == (1, 1):
        kern = functools.partial(
            _kernel_1x1, inv_sx=inv_sx_f, act=act,
            dot_dtype=dot_dtype, acc_dtype=acc_dtype, inv_s_out=inv_s_out_f,
        )
        in_specs = [x_main, w_spec, sc_spec, sc_spec]
        operands = (x, w_q, sc2, bi2)
    else:
        # Halo rows ride as 1-row blocks: with a row-block size of 1 the
        # index map addresses raw rows, so ±1 offsets are expressible
        # (BlockSpec offsets are otherwise block-quantized).
        x_top = pl.BlockSpec(
            (1, 1, W, Cin),
            lambda b, i, j: (b, jnp.maximum(i * bh - 1, 0), 0, 0),
        )
        x_bot = pl.BlockSpec(
            (1, 1, W, Cin),
            lambda b, i, j: (b, jnp.minimum(i * bh + bh, H - 1), 0, 0),
        )
        kern = functools.partial(
            _kernel_3x3, inv_sx=inv_sx_f, act=act,
            dot_dtype=dot_dtype, acc_dtype=acc_dtype, n_row_blocks=nH,
            inv_s_out=inv_s_out_f,
        )
        in_specs = [x_main, x_top, x_bot, w_spec, sc_spec, sc_spec]
        operands = (x, x, x, w_q, sc2, bi2)

    return pl.pallas_call(
        kern,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((B, H, W, Cout), out_dtype),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary", "arbitrary"),
        ),
    )(*operands)
