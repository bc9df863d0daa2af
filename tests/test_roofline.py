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
