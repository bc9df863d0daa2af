"""Export-time BatchNorm folding (serving needs no batch statistics).

DESIGN.md §9 attributes part of the serving-MFU gap to VPU epilogues (BN
among them) that overlap the MXU imperfectly. At inference BN is a fixed
per-channel affine, and its SCALE half can be folded into the conv kernel
ahead of time:

    y = (conv(x, W) - mean) * gamma / sqrt(var + eps) + beta
      =  conv(x, W * s) + (beta - mean * s)        with s = gamma/sqrt(var+eps)

so the runtime op shrinks from rsqrt + per-element multiply-add to a single
bias add that XLA fuses into the conv epilogue. The reference's analogue is
the TFLite converter's automatic conv+BN fusion at export (SURVEY.md §3.5);
here it is a weight-level transform (`fold_batchnorm`) plus a flax method
interceptor (`bn_folded_inference`) that replaces each folded BN with the
residual bias add — same composition style as infer/quantize.py's W8A8
interceptor, and freely stackable with it (fold first, then quantize the
folded kernels).
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import contextlib

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

# flax nn.BatchNorm default epsilon (ConvBN leaves it unset).
_BN_EPS = 1e-5


def fold_batchnorm(
    variables: Dict[str, Any], eps: float = _BN_EPS
) -> Tuple[Dict[str, Any], Dict[str, np.ndarray]]:
    """Fold every conv→bn pair's scale into the conv kernel.

    Walks the params tree for nodes holding both a "conv" child (with a
    "kernel" and no bias — ConvBN always disables conv bias under BN) and a
    "bn" child ({scale, bias}), with matching {mean, var} in batch_stats.

    Returns (folded_variables, bias_table):
      - folded_variables: params with each matched kernel pre-multiplied by
        gamma/sqrt(var+eps) along C_out; batch_stats passed through (the
        exported program no longer reads the folded entries).
      - bias_table: {bn module path: (C,) fp32 residual bias beta - mean*s},
        keyed the way flax interceptors see ``context.module.path`` —
        consumed by :func:`bn_folded_inference`.
    """
    params = jax.device_get(variables.get("params", {}))
    stats = jax.device_get(variables.get("batch_stats", {}))
    bias_table: Dict[str, np.ndarray] = {}

    def visit(p_node, s_node, path):
        out = {
            k: (visit(v, s_node.get(k, {}), path + (k,))
                if isinstance(v, dict) else v)
            for k, v in p_node.items()
        }
        # Is THIS node a conv→bn pair (the ConvBN module layout)?
        conv, bn_p = out.get("conv"), out.get("bn")
        bn_s = s_node.get("bn", {})
        if (
            isinstance(conv, dict) and "kernel" in conv and "bias" not in conv
            and isinstance(bn_p, dict) and {"scale", "bias"} <= set(bn_p)
            and isinstance(bn_s, dict) and {"mean", "var"} <= set(bn_s)
        ):
            # Guard the name-based match: the BN must actually normalize
            # THIS conv's output, i.e. one scale per output channel. A
            # module that merely names its children conv/bn with different
            # shapes must fail loudly, not broadcast-fold (ADVICE r3).
            scale = np.asarray(bn_p["scale"], np.float64)
            kernel = np.asarray(conv["kernel"])
            if scale.ndim != 1 or scale.shape[0] != kernel.shape[-1]:
                raise ValueError(
                    f"fold_batchnorm: at params path {'/'.join(path)!r} the "
                    f"bn scale shape {scale.shape} does not match the conv "
                    f"kernel's output channels ({kernel.shape[-1]}) — this "
                    "conv/bn pair is not the ConvBN layout; refusing to fold"
                )
            s = scale / np.sqrt(np.asarray(bn_s["var"], np.float64) + eps)
            out["conv"] = dict(conv)
            out["conv"]["kernel"] = (
                np.asarray(conv["kernel"], np.float64) * s
            ).astype(np.float32)
            bias = (np.asarray(bn_p["bias"], np.float64)
                    - np.asarray(bn_s["mean"], np.float64) * s)
            bias_table["/".join(path + ("bn",))] = bias.astype(np.float32)
        return out

    folded = dict(variables)
    folded["params"] = visit(params, stats, ())
    return folded, bias_table


@contextlib.contextmanager
def bn_folded_inference(bias_table: Dict[str, np.ndarray]):
    """Replace each folded BatchNorm with its residual bias add.

    The add stays in the conv's output dtype (bf16 on TPU) so no fp32
    activation buffer materializes; XLA fuses it into the conv epilogue.
    BNs not in the table (none, for the stock zoo) run normally.
    """

    def interceptor(next_fn, args, kwargs, context):
        if (isinstance(context.module, nn.BatchNorm)
                and context.method_name == "__call__"):
            b = bias_table.get("/".join(str(p) for p in context.module.path))
            if b is not None:
                x = args[0]
                return x + jnp.asarray(b, x.dtype)
        return next_fn(*args, **kwargs)

    with nn.intercept_methods(interceptor):
        yield
