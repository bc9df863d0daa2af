"""Static roofline analyzer (benchmarks/roofline.py): compile-only cost
analysis must produce sane rows on the CPU backend — this is the harness that
fills DESIGN.md §9's ablation when the TPU tunnel is degraded."""

import json
import subprocess
import sys

import pytest


def _run(args):
    import os

    # Pin the subprocess to CPU explicitly: the ambient sitecustomize re-pins
    # JAX_PLATFORMS to the tunneled TPU at interpreter start, so the
    # conftest's env alone does not survive into subprocesses.
    env = dict(os.environ, CVM_PLATFORM="cpu")
    out = subprocess.run(
        [sys.executable, "benchmarks/roofline.py", *args],
        capture_output=True, text=True, timeout=900, cwd=".", env=env,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    rows = [json.loads(line) for line in out.stdout.splitlines()
            if line.startswith("{")]
    assert rows, out.stdout
    return rows


@pytest.mark.slow
def test_roofline_rows_bf16_vs_w8a8():
    rows = _run(["--configs", "B", "--hw", "64,64", "--batch", "2",
                 "--variants", "bf16,w8a8"])
    by = {r["variant"]: r for r in rows}
    assert set(by) == {"bf16", "w8a8"}
    for r in rows:
        assert r["gflops"] and r["gflops"] > 0
        assert r["bytes_gb"] and r["bytes_gb"] > 0
        assert r["bound"] in ("compute", "bandwidth")
        assert r["ceiling_images_per_sec"] > 0
        assert r["lowering_backend"] == "cpu"
        assert 0 < r["mfu_ceiling_pct"] <= 100
    # int8 variants are placed against the int8 peak, bf16 against bf16's.
    assert by["w8a8"]["peak_tflops_used"] > by["bf16"]["peak_tflops_used"]


@pytest.mark.slow
def test_roofline_train_mode_config_e():
    # batch 8: the Trainer default mesh data-shards over the suite's 8
    # virtual devices, so the batch must divide evenly.
    rows = _run(["--configs", "E", "--hw", "64,64", "--batch", "8"])
    (row,) = rows
    assert row["mode"] == "train"
    assert row["variant"] == "bf16"
    assert row["gflops"] > 0


_FAKE_HLO = """\
%fused_computation (param_0.1: f32[4,4], param_1.2: f32[4,4]) -> f32[4,4] {
  %param_0.1 = f32[4,4]{1,0} parameter(0)
  %param_1.2 = f32[4,4]{1,0} parameter(1)
  %multiply.1 = f32[4,4]{1,0} multiply(%param_0.1, %param_1.2)
  ROOT %add.1 = f32[4,4]{1,0} add(%multiply.1, %param_1.2)
}

ENTRY %main.9 (p0.3: f32[4,4], p1.4: f32[4,4]) -> f32[4,4] {
  %p0.3 = f32[4,4]{1,0} parameter(0)
  %p1.4 = f32[4,4]{1,0} parameter(1)
  ROOT %fusion = f32[4,4]{1,0} fusion(%p0.3, %p1.4), kind=kLoop, calls=%fused_computation
}
"""


def test_hlo_dataflow_counts_fusion_boundary_only():
    """The fusion body's multiply/add intermediates never touch HBM — only
    the fusion instruction's operands (2 x 64 B) + output (64 B) count."""
    sys.path.insert(0, "benchmarks")
    from roofline import hlo_dataflow_bytes

    total, caveat = hlo_dataflow_bytes(_FAKE_HLO)
    assert total == 3 * 4 * 4 * 4
    assert caveat is None


def test_hlo_dataflow_dedupes_repeated_operands():
    """One buffer passed as several operands of ONE op (the fused-qconv 3x3
    kernel takes main + two halo views of the same activation) is one HBM
    read stream — counting it per-operand showed +39% phantom bytes on the
    fused variant (DESIGN.md §9c)."""
    hlo = """\
ENTRY %main.1 (a: f32[4,4]) -> f32[4,4] {
  %a = f32[4,4] parameter(0)
  ROOT %cc = f32[4,4] custom-call(%a, %a, %a), custom_call_target="tpu_custom_call"
}
"""
    sys.path.insert(0, "benchmarks")
    from roofline import hlo_dataflow_bytes

    total, _ = hlo_dataflow_bytes(hlo)
    # custom-call: 64 B out + 64 B for %a counted ONCE, not three times
    assert total == 2 * 4 * 4 * 4, total


def test_hlo_dataflow_while_caveat():
    hlo = """\
%body.1 (p.1: s32[]) -> s32[] {
  %p.1 = s32[] parameter(0)
  %c.1 = s32[] constant(1)
  ROOT %add.2 = s32[] add(%p.1, %c.1)
}

%cond.1 (p.2: s32[]) -> pred[] {
  %p.2 = s32[] parameter(0)
  %c.2 = s32[] constant(8)
  ROOT %lt = pred[] compare(%p.2, %c.2), direction=LT
}

ENTRY %main.3 (a: s32[]) -> s32[] {
  %a = s32[] parameter(0)
  ROOT %while.1 = s32[] while(%a), condition=%cond.1, body=%body.1
}
"""
    sys.path.insert(0, "benchmarks")
    from roofline import hlo_dataflow_bytes

    total, caveat = hlo_dataflow_bytes(hlo)
    assert total and total > 0
    assert "while" in caveat


def test_hlo_dataflow_on_real_compiled_module():
    """The estimator parses a real optimized module and lands at or below the
    fusion-blind op-sum that XLA cost analysis reports."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    sys.path.insert(0, "benchmarks")
    from roofline import _cost, hlo_dataflow_bytes

    def f(a, b):
        return jnp.tanh(a @ b) + a

    a = np.ones((128, 128), np.float32)
    compiled = jax.jit(f).lower(a, a).compile()
    total, _ = hlo_dataflow_bytes(compiled.as_text())
    assert total and total >= 3 * 128 * 128 * 4  # at least in/in/out once
    _, op_sum = _cost(compiled)
    if op_sum:
        assert total <= op_sum * 1.5  # same order; dataflow is the tighter count
