"""Serving-variant ablation harness (benchmarks/w8a8_bench.py): the queue's
step-2 timing evidence depends on this script running ALL variants —
including round 5's `w8a8_fused` row — without rotting while the tunnel
denies timing windows. CPU smoke: tiny config, 2 iters, every variant must
produce a row (or a recorded FAILED entry, never a crashed session)."""

import json
import os
import subprocess
import sys

import pytest


@pytest.mark.slow
def test_w8a8_bench_emits_all_variant_rows():
    env = dict(os.environ, CVM_PLATFORM="cpu")
    out = subprocess.run(
        [sys.executable, "benchmarks/w8a8_bench.py", "--input_hw", "64,64",
         "--backbone", "tiny", "--batch_size", "2", "--iters", "2"],
        capture_output=True, text=True, timeout=1500, cwd=".", env=env,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    rows = [json.loads(l) for l in out.stdout.splitlines()
            if l.startswith("{")]
    variants = {r["variant"] for r in rows if "variant" in r}
    assert {"bf16", "fold_bn", "w8a8", "w8a8_static", "w8a8_fused",
            "w8a8_fused_chain", "fold_bn+w8a8", "flat_stem"} <= variants, \
        variants
    by = {r["variant"]: r for r in rows if "variant" in r}
    # Every variant either timed or recorded its failure as a first-class
    # result (the Mosaic-rejection guard) — never silently missing.
    for v, r in by.items():
        assert "ms_per_batch" in r or "FAILED" in r, (v, r)
    # The summary line only covers variants that actually timed.
    summaries = [r for r in rows if "device" in r]
    assert summaries, "no summary line"
