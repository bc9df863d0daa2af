"""Quantization-aware training: fake-quantized convs with a straight-through
estimator, inside the compiled train step.

The reference's edge story is full-int8 deployment (SURVEY.md §3.5) with
fp training — quantization error is whatever post-training calibration
leaves behind. ``qat=True`` on any model's params instead makes the train
(and eval) step run every nn.Conv through the EXACT numerics of the dynamic
int8 inference path (infer/quantize.py `_int8_conv`): per-tensor activation
scale max|x|/127, per-output-channel symmetric weight scales, values snapped
to the int8 grid. Each quantize→dequantize pair is wrapped as

    fq(x) = x + stop_gradient(qdq(x) - x)

so the forward pass sees quantization noise while the backward pass is the
identity (straight-through estimator) — the optimizer learns weights that
already live on the int8 grid, and ``cli.export --quantize w8a8`` inherits
them with no accuracy cliff to calibrate away.

Design notes (TPU):
- Stateless by construction: scales are recomputed from live tensors inside
  the program, so the whole-step-jit Trainer needs no new variable
  collections, checkpoint fields, or host syncs (CLAUDE.md "never sync per
  step"). The classic learned/EMA-range QAT variants need mutable range
  state threaded through every conv; the dynamic-scale variant matches the
  serving path we actually ship (w8a8 dynamic) and calibration of static
  scales still happens at export on the adapted weights.
- The conv itself runs in the module's compute dtype (bf16 on TPU), keeping
  the MXU path; the deployed int8 conv accumulates exactly in int32, so
  deployment numerics are strictly *cleaner* than the QAT simulation.
- Nothing is clipped in practice: max-based scales put every value inside
  [-127, 127] by construction, so the plain STE (no clip-gradient mask)
  is exact.
"""

from __future__ import annotations

import contextlib

import jax
import jax.numpy as jnp
from flax import linen as nn
from jax import lax

from cvm_tpu.infer.quantize import conv_geometry


def fake_quant_act(x: jnp.ndarray) -> jnp.ndarray:
    """Per-tensor dynamic int8 quantize→dequantize with identity gradient.
    Returns fp32 (the caller casts to the conv's compute dtype)."""
    xf = x.astype(jnp.float32)
    s = jnp.max(jnp.abs(xf)) / 127.0 + 1e-8
    q = jnp.round(jnp.clip(xf / s, -127, 127)) * s
    return xf + lax.stop_gradient(q - xf)


def fake_quant_weight(w: jnp.ndarray) -> jnp.ndarray:
    """Per-output-channel (last axis, HWIO/IO) symmetric int8 qdq with
    identity gradient — the grid `quantize_params` / `_int8_conv` use."""
    wf = w.astype(jnp.float32)
    s = (
        jnp.max(jnp.abs(wf), axis=tuple(range(wf.ndim - 1)), keepdims=True)
        / 127.0
        + 1e-12
    )
    q = jnp.round(jnp.clip(wf / s, -127, 127)) * s
    return wf + lax.stop_gradient(q - wf)


def _fq_conv(mod: "nn.Conv", x):
    kernel = mod.variables["params"]["kernel"]
    bias = mod.variables["params"].get("bias") if mod.use_bias else None

    cdt = mod.dtype or jnp.float32
    y = lax.conv_general_dilated(
        fake_quant_act(x).astype(cdt),
        fake_quant_weight(kernel).astype(cdt),
        **conv_geometry(mod),
    )
    if bias is not None:
        y = y.astype(jnp.float32) + jnp.asarray(bias, jnp.float32)
    return y.astype(cdt)


def _qat_interceptor(next_fn, args, kwargs, context):
    mod = context.module
    if isinstance(mod, nn.Conv) and context.method_name == "__call__":
        try:
            return _fq_conv(mod, args[0])
        except (KeyError, TypeError):
            return next_fn(*args, **kwargs)  # unbound/odd conv → fp path
    return next_fn(*args, **kwargs)


@contextlib.contextmanager
def fake_quant_training():
    """Context manager: every nn.Conv inside runs the fake-quant STE path.
    Active at trace time — wrap the model.apply inside the jitted step."""
    with nn.intercept_methods(_qat_interceptor):
        yield


def maybe_fake_quant(params_cfg):
    """The Trainer's gate: the QAT context when ``params_cfg.qat``, else a
    no-op context (the fq ops are then not even traced)."""
    if bool(getattr(params_cfg, "qat", False)):
        return fake_quant_training()
    return contextlib.nullcontext()
