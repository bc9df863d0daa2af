"""Artifact integrity self-test: a golden fingerprint baked at export.

An exported artifact is two files that must agree exactly — the traced
program (model.stablehlo) and the weights it was traced against
(weights.npz). They can silently drift apart in deployment: folded kernels
served through an unfolded program (or vice versa — the exact failure mode
DESIGN.md §8 warns about), a weights.npz swapped from another run, a
truncated download. All of those still *execute*; they just produce garbage.

So cli.export runs the artifact it just wrote on a DETERMINISTIC synthetic
batch (seeded, derived from artifact.json meta alone) and records per-output
summary statistics into artifact.json. `ServingModel.selftest()` (and
`cli.serve --selftest`) regenerates the same inputs, re-runs the program,
and compares. Shapes compare exactly; means/stds compare with tolerance —
recompiling the same program on the same platform is deterministic, and a
weights/program mismatch moves output statistics by orders of magnitude,
not percent. Cross-PLATFORM checks (export on TPU, verify on CPU) are
impossible anyway: jax.export pins the artifact's platform.
"""

from __future__ import annotations

from typing import Any, Dict, List, Sequence, Tuple

import numpy as np

SELFTEST_SEED = 20260818


def synth_inputs(meta: Dict[str, Any], with_3d: bool = False,
                 seed: int = SELFTEST_SEED) -> Tuple[np.ndarray, ...]:
    """Deterministic inputs matching the artifact call signature, derived
    ONLY from artifact meta (so export and serving generate identical
    bytes)."""
    B = int(meta.get("batch_size", 1))
    h, w = (int(v) for v in meta.get("pad_hw", (64, 64)))
    fmt = meta.get("input_format", "rgb")
    two_frame = meta.get("model") == "dmds"
    rng = np.random.default_rng(seed)

    if fmt == "yuv420":
        def planes():
            return (rng.integers(0, 256, (B, h, w), dtype=np.uint8),
                    rng.integers(0, 256, (B, h // 2, w // 2), dtype=np.uint8),
                    rng.integers(0, 256, (B, h // 2, w // 2), dtype=np.uint8))

        args: Tuple[np.ndarray, ...] = planes()
        if two_frame:
            args += planes()
        args += (np.tile(np.asarray([[h, w]], np.int32), (B, 1)),)
    else:
        args = (rng.integers(0, 256, (B, h, w, 3), dtype=np.uint8),
                np.tile(np.asarray([[h, w]], np.int32), (B, 1)))
        if two_frame:
            args += (rng.integers(0, 256, (B, h, w, 3), dtype=np.uint8),)
    if with_3d:
        k = np.asarray([[200.0, 200.0, w / 2.0, h / 2.0]], np.float32)
        args += (np.tile(k, (B, 1)),)
    return args


def fingerprint(outputs: Dict[str, Any]) -> Dict[str, Any]:
    """Per-output shape + summary stats, JSON-safe."""
    fp: Dict[str, Any] = {}
    for k in sorted(outputs):
        a = np.asarray(outputs[k])
        v = a.astype(np.float64)
        fp[k] = {"shape": list(a.shape),
                 "mean": float(v.mean()), "std": float(v.std()),
                 "finite": bool(np.isfinite(v).all())}
    return fp


def compare(expected: Dict[str, Any], got: Dict[str, Any],
            rtol: float = 0.05, atol: float = 1e-3) -> List[str]:
    """Mismatch descriptions (empty = pass). Shapes/finiteness exact;
    mean/std within rtol·max(|expected|, std-scale) + atol."""
    problems: List[str] = []
    if sorted(expected) != sorted(got):
        problems.append(f"output keys differ: expected {sorted(expected)}, "
                        f"got {sorted(got)}")
        return problems
    for k, e in expected.items():
        g = got[k]
        if list(e["shape"]) != list(g["shape"]):
            problems.append(f"{k}: shape {g['shape']} != {e['shape']}")
            continue
        if e["finite"] and not g["finite"]:
            problems.append(f"{k}: non-finite values appeared")
            continue
        scale = max(abs(e["mean"]), e["std"], 1e-6)
        for stat in ("mean", "std"):
            if abs(g[stat] - e[stat]) > rtol * scale + atol:
                problems.append(
                    f"{k}: {stat} {g[stat]:.6g} vs expected {e[stat]:.6g} "
                    f"(tol {rtol * scale + atol:.2g})")
    return problems


def run_selftest(model, rtol: float = 0.05, atol: float = 1e-3) -> List[str]:
    """Verify a ServingModel against the fingerprint its export recorded.
    Returns mismatch strings; [] = verified; raises if the artifact predates
    self-test fingerprints."""
    st = model.meta.get("selftest")
    if not st:
        raise ValueError(
            "artifact has no selftest fingerprint (exported before this "
            "feature) — re-export to enable integrity verification")
    args = synth_inputs(model.meta, with_3d=bool(st.get("with_3d", False)),
                        seed=int(st.get("seed", SELFTEST_SEED)))
    out = model(*args)
    if "outputs" not in st and "deferred" in st:
        # Cross-platform export (e.g. a w8a8_fused artifact converted on a
        # CPU host): the tpu-only program could not execute at export time,
        # so THIS first successful run pins the fingerprint for every later
        # deploy to verify against.
        import json
        import os

        st = {k: v for k, v in st.items() if k != "deferred"}
        st["outputs"] = fingerprint(out)
        model.meta["selftest"] = st
        with open(os.path.join(model.artifact_dir, "artifact.json"), "w") as f:
            json.dump(model.meta, f)
        return []
    return compare(st["outputs"], fingerprint(out), rtol=rtol, atol=atol)
