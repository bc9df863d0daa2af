"""Fused W8A8 Pallas conv: kernel vs quantized oracle, interceptor vs fp.

The kernel (ops/pallas/fused_qconv.py) replaces the XLA-composed static
W8A8 path whose s32/f32 inter-conv buffers added 70-125% HBM traffic
(DESIGN.md §9b). CPU CI runs the Pallas interpreter; the int8 lattice math
is exact, so the kernel is checked against a float64 oracle, and the
ConvBN-level interceptor against the fp forward with the same tolerances
the static path meets.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cvm_tpu.infer.pipeline import InferencePipeline
from cvm_tpu.infer.quantize import (
    calibrate_activation_scales,
    w8a8_fused_inference,
)
from cvm_tpu.data.synthetic import synthetic_batch
from cvm_tpu.models import get_model
from cvm_tpu.ops.pallas.fused_qconv import fused_qconv


def _oracle(x, wq, scale, bias, sx, act):
    xq = np.round(np.clip(x.astype(np.float64) / sx, -127, 127))
    B, H, W, _ = x.shape
    kh, kw, _, _ = wq.shape
    pad = kh // 2
    xp = np.pad(xq, ((0, 0), (pad, pad), (pad, pad), (0, 0)))
    y = 0
    for dy in range(kh):
        for dx in range(kw):
            y = y + np.einsum(
                "bhwc,cn->bhwn",
                xp[:, dy:dy + H, dx:dx + W],
                wq[dy, dx].astype(np.float64),
            )
    y = y * scale.astype(np.float64) + bias.astype(np.float64)
    if act == "silu":
        y = y / (1.0 + np.exp(-y))
    elif act == "relu":
        y = np.maximum(y, 0.0)
    return y


@pytest.mark.parametrize(
    "kh,B,H,W,cin,cout,act",
    [
        (1, 2, 8, 16, 32, 64, "silu"),
        (3, 2, 16, 20, 32, 64, "silu"),   # W not a multiple of the lane tile
        (3, 1, 32, 48, 16, 256, None),    # Cout > 128 exercises N tiling
        (3, 1, 8, 96, 8, 32, "relu"),     # W > 4096/bh forces small bh
        (3, 2, 2, 1, 16, 32, "relu"),     # W=1: ±1 col taps are all-pad
    ],                                    # (zero-width slice crashed Mosaic)
)
def test_kernel_matches_quantized_oracle(kh, B, H, W, cin, cout, act):
    rng = np.random.default_rng(kh * 1000 + cout)
    x = rng.normal(0, 1, (B, H, W, cin)).astype(np.float32)
    wq = rng.integers(-127, 128, (kh, kh, cin, cout)).astype(np.int8)
    scale = (rng.uniform(0.5, 2, (cout,)) * 1e-3).astype(np.float32)
    bias = rng.normal(0, 0.1, (cout,)).astype(np.float32)
    sx = 0.021
    ref = _oracle(x, wq, scale, bias, sx, act)
    got = np.asarray(
        fused_qconv(
            jnp.asarray(x), jnp.asarray(wq), jnp.asarray(scale),
            jnp.asarray(bias), inv_sx=1.0 / sx, act=act, int8_dot=True,
            out_dtype=jnp.float32, interpret=True,
        ),
        np.float64,
    )
    # int8 x int8 -> int32 lattice math is exact; only the f32 epilogue rounds.
    np.testing.assert_allclose(got, ref, rtol=2e-5, atol=2e-5)

    # bf16-lattice fallback mode: same lattice values, f32 accumulation —
    # tiny rounding of the (exact-in-int32) sums only.
    got_bf = np.asarray(
        fused_qconv(
            jnp.asarray(x), jnp.asarray(wq), jnp.asarray(scale),
            jnp.asarray(bias), inv_sx=1.0 / sx, act=act, int8_dot=False,
            out_dtype=jnp.float32, interpret=True,
        ),
        np.float64,
    )
    np.testing.assert_allclose(got_bf, ref, rtol=5e-4, atol=5e-4)


def test_kernel_int8_chain_modes_match_oracle():
    """inv_s_out (int8 lattice out, in the consumer's scale) chained into
    inv_sx=None (int8 lattice in) must equal quantize-the-fp-path within
    bf16-rounding noise — chaining moves the quantize, not the math."""
    rng = np.random.default_rng(7)
    B, H, W, cin, cmid, cout = 2, 8, 16, 16, 32, 24
    x = rng.normal(0, 1, (B, H, W, cin)).astype(np.float32)
    wq1 = rng.integers(-127, 128, (3, 3, cin, cmid)).astype(np.int8)
    wq2 = rng.integers(-127, 128, (3, 3, cmid, cout)).astype(np.int8)
    sc1 = (rng.uniform(0.5, 2, (cmid,)) * 1e-3).astype(np.float32)
    sc2 = (rng.uniform(0.5, 2, (cout,)) * 1e-3).astype(np.float32)
    b1 = rng.normal(0, 0.1, (cmid,)).astype(np.float32)
    b2 = rng.normal(0, 0.1, (cout,)).astype(np.float32)
    sx1, sx2 = 0.02, 0.015

    # Unchained reference: fp32 intermediate, consumer quantizes itself.
    y1 = np.asarray(fused_qconv(
        jnp.asarray(x), jnp.asarray(wq1), jnp.asarray(sc1), jnp.asarray(b1),
        inv_sx=1 / sx1, act="silu", int8_dot=True, out_dtype=jnp.float32,
        interpret=True))
    ref = np.asarray(fused_qconv(
        jnp.asarray(y1), jnp.asarray(wq2), jnp.asarray(sc2), jnp.asarray(b2),
        inv_sx=1 / sx2, act=None, int8_dot=True, out_dtype=jnp.float32,
        interpret=True))

    # Chained: c1 emits int8 in c2's lattice; c2 skips its input quantize.
    h_q = fused_qconv(
        jnp.asarray(x), jnp.asarray(wq1), jnp.asarray(sc1), jnp.asarray(b1),
        inv_sx=1 / sx1, act="silu", int8_dot=True, out_dtype=jnp.int8,
        inv_s_out=1 / sx2, interpret=True)
    assert h_q.dtype == jnp.int8
    got = np.asarray(fused_qconv(
        h_q, jnp.asarray(wq2), jnp.asarray(sc2), jnp.asarray(b2),
        inv_sx=None, act=None, int8_dot=True, out_dtype=jnp.float32,
        interpret=True))
    # Identical lattice math — float32-roundoff-level agreement only.
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)


def test_chained_resblock_matches_unchained(rng):
    """chain=True intercepts whole ResBlocks: outputs must match the
    unchained fused path closely and the block interceptor must fire."""
    import cvm_tpu.infer.quantize as qz
    from cvm_tpu.models.layers import ResBlock

    mod = ResBlock(24)
    x = jnp.asarray(rng.uniform(-1, 1, (2, 16, 16, 8)).astype(np.float32))
    variables = mod.init(jax.random.PRNGKey(0), x, train=False)
    scales = calibrate_activation_scales(
        lambda v: mod.apply(variables, v, train=False), [x])
    from cvm_tpu.infer.quantize import prequantize_fused_weights

    wtab = prequantize_fused_weights(variables)
    assert {"c1", "c2", "proj"} <= set(wtab)

    with w8a8_fused_inference(scales, interpret=True, weight_table=wtab):
        ref = np.asarray(mod.apply(variables, x, train=False), np.float32)

    fired = []
    real = qz._fused_resblock

    def counting(*a, **kw):
        y = real(*a, **kw)
        if y is not None:
            fired.append(1)
        return y

    import pytest as _pytest

    mp = _pytest.MonkeyPatch()
    mp.setattr(qz, "_fused_resblock", counting)
    try:
        with w8a8_fused_inference(scales, interpret=True, weight_table=wtab,
                                  chain=True):
            got = np.asarray(mod.apply(variables, x, train=False), np.float32)
    finally:
        mp.undo()
    assert fired, "chain interceptor never fired"
    # Same int8 lattices; differences only from bf16-rounding of the
    # unchained path's intermediate buffer.
    np.testing.assert_allclose(got, ref, rtol=0.02, atol=0.02)
    fp = np.asarray(mod.apply(variables, x, train=False), np.float32)
    assert np.abs(got - fp).mean() < 0.05


@pytest.mark.slow  # 72 s measured (interpret-mode kernels over a full net)
def test_fused_interceptor_matches_fp(rng, monkeypatch):
    """Semseg tiny: the fused path serves logits close to fp, and the
    interceptor genuinely fires (guards against a vacuous fallback pass)."""
    import cvm_tpu.infer.quantize as qz

    spec = get_model("semseg")
    p = spec.params_cls(input_hw=(32, 32), num_classes=3, backbone="tiny",
                        decoder_features=16)
    model = spec.create_model(p)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)), train=False)
    cal = [jnp.asarray(rng.uniform(-1, 1, (2, 32, 32, 3)).astype(np.float32))
           for _ in range(2)]
    scales = calibrate_activation_scales(
        lambda x: model.apply(variables, x, train=False), cal)

    fired = []
    real = qz._fused_convbn

    def counting(*a, **kw):
        y = real(*a, **kw)
        if y is not None:
            fired.append(1)
        return y

    monkeypatch.setattr(qz, "_fused_convbn", counting)

    x = jnp.asarray(rng.uniform(-1, 1, (2, 32, 32, 3)).astype(np.float32))
    out_fp = model.apply(variables, x, train=False)
    with w8a8_fused_inference(scales, interpret=True):
        out_q = model.apply(variables, x, train=False)
    assert len(fired) >= 4, f"fused kernel fired on only {len(fired)} convs"

    pf = np.asarray(jax.nn.softmax(out_fp["logits"]))
    pq = np.asarray(jax.nn.softmax(out_q["logits"]))
    assert np.abs(pf - pq).mean() < 0.05
    agree = (pf.argmax(-1) == pq.argmax(-1)).mean()
    assert agree > 0.9, f"class agreement {agree}"


@pytest.mark.slow  # 69 s measured (two e2e pipelines, interpret-mode convs)
def test_fused_pipeline_end_to_end(rng):
    spec = get_model("centernet")
    p = spec.params_cls(input_hw=(64, 64), num_classes=3, backbone="tiny",
                        neck_features=32, head_features=16, top_k=10)
    model = spec.create_model(p)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)), train=False)
    cal = [jnp.asarray(rng.uniform(-1, 1, (1, 64, 64, 3)).astype(np.float32))]
    scales = calibrate_activation_scales(
        lambda x: model.apply(variables, x, train=False), cal)
    batch = synthetic_batch(np.random.default_rng(0), 2, (96, 96), num_classes=3)
    pipe_fp = InferencePipeline(spec, p, variables)
    pipe_q = InferencePipeline(spec, p, variables, w8a8=scales, w8a8_fused=True)
    out_fp = pipe_fp(batch)
    out_q = pipe_q(batch)
    assert np.isfinite(np.asarray(out_q["boxes"])).all()
    assert np.abs(
        np.asarray(out_q["scores"]) - np.asarray(out_fp["scores"])
    ).mean() < 0.05


def test_prequantized_weight_table_bit_identical(rng):
    """Host-prequantized int8 weights (the deployment posture the TPU
    dataflow capture motivated — in-program requantization measured +25%
    HBM) must produce EXACTLY the in-program path's lattice values."""
    from cvm_tpu.infer.quantize import prequantize_fused_weights

    spec = get_model("semseg")
    p = spec.params_cls(input_hw=(32, 32), num_classes=3, backbone="tiny",
                        decoder_features=16)
    model = spec.create_model(p)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)), train=False)
    cal = [jnp.asarray(rng.uniform(-1, 1, (2, 32, 32, 3)).astype(np.float32))]
    scales = calibrate_activation_scales(
        lambda x: model.apply(variables, x, train=False), cal)
    wtab = prequantize_fused_weights(variables)
    assert wtab, "prequantize found no conv kernels"
    for wq, sw in wtab.values():
        assert wq.dtype == np.int8 and sw.ndim == 1

    x = jnp.asarray(rng.uniform(-1, 1, (2, 32, 32, 3)).astype(np.float32))
    with w8a8_fused_inference(scales, interpret=True):
        out_inprog = model.apply(variables, x, train=False)
    with w8a8_fused_inference(scales, interpret=True, weight_table=wtab):
        out_pre = model.apply(variables, x, train=False)
    np.testing.assert_array_equal(np.asarray(out_inprog["logits"]),
                                  np.asarray(out_pre["logits"]))


def test_fused_rejects_fold_bn_and_uncalibrated(rng):
    """fold_bn + w8a8_fused would apply the BN scale twice (folded kernels
    AND the fused epilogue's live-stats affine) — must refuse, not silently
    serve wrong numerics (ADVICE r4 high). Likewise w8a8_fused without a
    calibrated scales dict must refuse, not silently serve fp/dynamic."""
    spec = get_model("centernet")
    p = spec.params_cls(input_hw=(64, 64), num_classes=3, backbone="tiny",
                        neck_features=32, head_features=16, top_k=10)
    model = spec.create_model(p)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)), train=False)
    with pytest.raises(ValueError, match="mutually exclusive"):
        InferencePipeline(spec, p, variables, w8a8={"conv": 0.1},
                          w8a8_fused=True, fold_bn=True)
    with pytest.raises(ValueError, match="calibrated"):
        InferencePipeline(spec, p, variables, w8a8=True, w8a8_fused=True)
    with pytest.raises(ValueError, match="calibrated"):
        InferencePipeline(spec, p, variables, w8a8_fused=True)


def test_ineligible_convbn_serves_fp_exactly(rng):
    """A stride-2 ConvBN inside the context must fall through untouched."""
    from cvm_tpu.models.layers import ConvBN

    mod = ConvBN(16, kernel=3, stride=2)
    x = jnp.asarray(rng.uniform(-1, 1, (1, 16, 16, 8)).astype(np.float32))
    variables = mod.init(jax.random.PRNGKey(0), x, train=False)
    ref = mod.apply(variables, x, train=False)
    with w8a8_fused_inference({"conv": 0.01}, interpret=True):
        got = mod.apply(variables, x, train=False)
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(got))
