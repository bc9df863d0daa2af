#!/usr/bin/env python
"""Parity harness against the upstream reference at /root/reference.

SURVEY.md §0 directive: the reference mount was EMPTY when the survey (and
every round since) was written; every [R] claim is best-effort recall. The
moment the mount populates, this script is the executable owner of the
re-verification job:

  1. inventory the mount (SKIP cleanly while it is empty),
  2. check the SURVEY.md §1/§2 structural [R] claims against the real tree,
  3. run numeric parity checks on shared fixtures — reference GT renderer /
     decode vs ours — reporting per-op max-abs diffs (the "bit-comparable
     head outputs" contract, BASELINE.json:5).

Exit codes: 0 = SKIP (empty mount) or all runnable checks passed,
1 = a structural claim or numeric check failed. Checks that cannot run
(e.g. the reference needs TensorFlow/Mongo not present here) are reported
UNRUNNABLE with the reason, never silently dropped.

Usage:  python scripts/parity_vs_reference.py [--reference /root/reference]
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys
import traceback

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


# ---------------------------------------------------------------------------
# Stage 1: structural [R]-claim checklist (SURVEY.md §1 layer map, §2 inventory)
# ---------------------------------------------------------------------------

# (claim id, description, list of glob patterns — claim passes if ANY matches)
STRUCTURAL_CLAIMS = [
    ("models-centernet", "CenterNet model family exists (SURVEY §2)",
     ["models/centernet/**", "**/centernet*/**", "**/centernet*.py"]),
    ("models-semseg", "Semseg model family exists (SURVEY §2)",
     ["models/semseg/**", "**/semseg*/**", "**/semseg*.py"]),
    ("models-depth", "Depth model family exists (SURVEY §2)",
     ["models/depth/**", "**/depth*/**", "**/depth*.py"]),
    ("models-multitask", "Multitask model family exists (SURVEY §2)",
     ["models/multitask/**", "**/multitask*/**", "**/multitask*.py"]),
    ("models-dmds", "DMDS (depth+motion) pipeline exists (SURVEY §2)",
     ["models/dmds/**", "**/dmds*/**", "**/dmds*.py"]),
    ("data-uploaders", "Per-dataset upload/conversion scripts exist (SURVEY §2)",
     ["data/**/upload*.py", "data/**", "**/upload*.py"]),
    ("data-reader", "Mongo data reader / generator exists (SURVEY §2)",
     ["common/**", "**/*generator*.py", "**/*reader*.py"]),
    ("per-model-params", "Per-model params.py config objects (SURVEY §2)",
     ["models/*/params.py", "**/params.py"]),
    ("per-model-train", "Per-model train.py entry points (SURVEY §3.1)",
     ["models/*/train.py", "**/train.py"]),
    ("per-model-inference", "Per-model inference scripts (SURVEY §3.2)",
     ["models/*/inference.py", "**/inference*.py"]),
    ("edge-export", "EdgeTPU/TFLite conversion scripts (SURVEY §3.5)",
     ["**/convert*.py", "**/*tflite*", "**/*edgetpu*"]),
]

# grep-style content claims: (claim id, description, substring, file globs)
CONTENT_CLAIMS = [
    ("keras-stack", "Reference is a Keras/TF2 stack (SURVEY §1 L0)",
     "keras", ["**/*.py"]),
    ("mongo-store", "Labels live in MongoDB (SURVEY §1 L1)",
     "pymongo", ["**/*.py"]),
    ("focal-loss", "CenterNet penalty-reduced focal loss (SURVEY §2)",
     "focal", ["**/*.py"]),
    ("maxpool-decode", "NMS-free 3x3 max-pool peak decode (SURVEY §3.2)",
     "max_pool", ["**/*.py"]),
]


def check_structural(ref_root: str) -> list[dict]:
    results = []
    for cid, desc, patterns in STRUCTURAL_CLAIMS:
        hit = None
        for pat in patterns:
            m = glob.glob(os.path.join(ref_root, pat), recursive=True)
            m = [p for p in m if os.path.isfile(p) or os.path.isdir(p)]
            if m:
                hit = os.path.relpath(m[0], ref_root)
                break
        results.append({
            "check": cid, "kind": "structural", "desc": desc,
            "status": "PASS" if hit else "FAIL",
            "evidence": hit or "no matching path",
        })
    for cid, desc, needle, globs in CONTENT_CLAIMS:
        found = None
        for pat in globs:
            for p in glob.glob(os.path.join(ref_root, pat), recursive=True):
                try:
                    with open(p, "r", errors="ignore") as f:
                        if needle in f.read():
                            found = os.path.relpath(p, ref_root)
                            break
                except OSError:
                    continue
            if found:
                break
        results.append({
            "check": cid, "kind": "content", "desc": desc,
            "status": "PASS" if found else "FAIL",
            "evidence": (f"'{needle}' in {found}" if found else f"'{needle}' not found"),
        })
    return results


# ---------------------------------------------------------------------------
# Stage 2: numeric parity on shared fixtures (best-effort imports)
# ---------------------------------------------------------------------------

def _fixture_boxes(seed: int = 0):
    import numpy as np

    rng = np.random.default_rng(seed)
    n = 6
    x0 = rng.uniform(0, 80, n)
    y0 = rng.uniform(0, 80, n)
    w = rng.uniform(8, 40, n)
    h = rng.uniform(8, 40, n)
    boxes = np.stack([x0, y0, x0 + w, y0 + h], axis=-1).astype(np.float32)
    classes = rng.integers(0, 3, n).astype(np.int32)
    return boxes, classes


def _import_reference_module(ref_root: str, candidates: list[str]):
    """Try to import a reference module by file path (no package install)."""
    import importlib.util

    for rel in candidates:
        for p in glob.glob(os.path.join(ref_root, rel), recursive=True):
            name = "ref_" + os.path.splitext(os.path.basename(p))[0]
            try:
                spec = importlib.util.spec_from_file_location(name, p)
                mod = importlib.util.module_from_spec(spec)
                sys.path.insert(0, ref_root)  # let intra-repo imports resolve
                spec.loader.exec_module(mod)
                return mod, os.path.relpath(p, ref_root)
            except Exception as e:
                return None, f"{os.path.relpath(p, ref_root)}: import failed: {e!r}"
    return None, "no candidate file found"


def check_gaussian_radius(ref_root: str) -> dict:
    """Reference gaussian_radius(det_size, overlap) vs ours (ops/heatmap.py)."""
    import numpy as np

    mod, evidence = _import_reference_module(
        ref_root,
        ["models/centernet/processor.py", "**/centernet/processor.py",
         "**/gaussian*.py", "common/**/heatmap*.py"],
    )
    if mod is None or not hasattr(mod, "gaussian_radius"):
        return {"check": "gaussian-radius", "kind": "numeric",
                "status": "UNRUNNABLE", "evidence": str(evidence)}
    from cvm_tpu.ops.heatmap import gaussian_radius as ours

    def uncorrected(h, w, o=0.7):
        # The canonical CornerNet/CenterNet code divides every quadratic
        # root by 2 instead of 2a (known upstream bug, princeton-vl/
        # CornerNet#110). cvm_tpu deliberately uses the corrected /(2a)
        # bound (ops/heatmap.py:26) — GT Gaussians are tighter; decode and
        # inference are radius-free so head-output parity is unaffected.
        r1 = (h + w + np.sqrt((h + w) ** 2 - 4 * (1 - o) / (1 + o) * w * h)) / 2
        b2, c2 = 2 * (h + w), (1 - o) * w * h
        r2 = (b2 + np.sqrt(b2 * b2 - 16 * c2)) / 2
        b3, c3 = -2 * o * (h + w), (o - 1) * w * h
        r3 = (b3 + np.sqrt(b3 * b3 - 16 * o * c3)) / 2
        return min(r1, r2, r3)

    d_ours, d_uncorr = [], []
    for h, w in [(10, 10), (3, 17), (40, 8), (64, 64)]:
        r_ref = float(mod.gaussian_radius((h, w), 0.7))
        d_ours.append(abs(r_ref - float(np.asarray(ours(h, w, min_overlap=0.7)))))
        d_uncorr.append(abs(r_ref - uncorrected(h, w)))
    if max(d_ours) < 1e-3:
        return {"check": "gaussian-radius", "kind": "numeric", "status": "PASS",
                "evidence": f"max |Δradius| = {max(d_ours):.2e} over 4 det sizes"}
    if max(d_uncorr) < 1e-3:
        return {"check": "gaussian-radius", "kind": "numeric", "status": "NOTE",
                "evidence": ("reference uses the uncorrected CornerNet radius "
                             "(/2 bug); ours is the corrected /(2a) bound — "
                             "deliberate divergence, GT-only, see "
                             "ops/heatmap.py:26")}
    return {"check": "gaussian-radius", "kind": "numeric", "status": "FAIL",
            "evidence": (f"max |Δradius| = {max(d_ours):.2e} vs ours, "
                         f"{max(d_uncorr):.2e} vs uncorrected formula")}


def check_heatmap_render(ref_root: str) -> dict:
    """Reference per-class Gaussian heatmap GT vs our device renderer."""
    import numpy as np

    mod, evidence = _import_reference_module(
        ref_root,
        ["models/centernet/processor.py", "**/centernet/processor.py"],
    )
    fn = None
    if mod is not None:
        for name in ("draw_gaussian", "draw_umich_gaussian", "render_heatmap"):
            if hasattr(mod, name):
                fn = getattr(mod, name)
                break
    if fn is None:
        return {"check": "heatmap-render", "kind": "numeric",
                "status": "UNRUNNABLE", "evidence": str(evidence)}
    from cvm_tpu.ops.heatmap import gaussian_radius, render_centernet_targets

    boxes, classes = _fixture_boxes()
    H = W = 32
    ref_hm = np.zeros((3, H, W), np.float32)
    for b, c in zip(boxes / 4.0, classes):
        cx, cy = (b[0] + b[2]) / 2, (b[1] + b[3]) / 2
        r = max(0, int(np.asarray(gaussian_radius(b[3] - b[1], b[2] - b[0]))))
        fn(ref_hm[c], (int(cx), int(cy)), r)
    import jax.numpy as jnp

    tgt = render_centernet_targets(
        jnp.asarray(boxes / 4.0), jnp.asarray(classes),
        jnp.ones((len(boxes),), bool), map_hw=(H, W), num_classes=3,
    )
    ours = np.asarray(tgt.heatmap).transpose(2, 0, 1)
    d = float(np.abs(ref_hm - ours).max())
    return {"check": "heatmap-render", "kind": "numeric",
            "status": "PASS" if d < 1e-2 else "FAIL",
            "evidence": f"max |Δheatmap| = {d:.2e} (3x32x32, 6 objects)"}


NUMERIC_CHECKS = [check_gaussian_radius, check_heatmap_render]


# ---------------------------------------------------------------------------


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--reference", default="/root/reference")
    ap.add_argument("--json", default=None, help="also write results to this path")
    args = ap.parse_args()

    # Tiny verification ops belong on CPU (the tunneled TPU turns µs ops
    # into multi-ms RPCs); must be a config update, not an env var — see
    # CLAUDE.md environment notes.
    import jax

    jax.config.update("jax_platforms", os.environ.get("CVM_PLATFORM", "cpu"))

    files = [p for p in glob.glob(os.path.join(args.reference, "**", "*"),
                                  recursive=True) if os.path.isfile(p)]
    if not files:
        print(f"SKIP: reference mount {args.reference} is empty "
              f"(0 files) — nothing to verify yet. This harness runs the "
              f"SURVEY.md §0 re-verification the moment it populates.")
        return 0

    print(f"reference mount: {len(files)} files — running parity checks\n")
    results = check_structural(args.reference)
    for fn in NUMERIC_CHECKS:
        try:
            results.append(fn(args.reference))
        except Exception:
            results.append({"check": fn.__name__, "kind": "numeric",
                            "status": "UNRUNNABLE",
                            "evidence": traceback.format_exc(limit=3)})

    width = max(len(r["check"]) for r in results)
    counts = {"PASS": 0, "FAIL": 0, "UNRUNNABLE": 0, "NOTE": 0}
    for r in results:
        counts[r["status"]] += 1
        print(f"  [{r['status']:>10}] {r['check']:<{width}}  {r['evidence']}")
    print(f"\n{counts['PASS']} passed, {counts['FAIL']} failed, "
          f"{counts['NOTE']} noted divergences, "
          f"{counts['UNRUNNABLE']} unrunnable / {len(results)} checks")
    if counts["FAIL"]:
        print("FAILED checks mean a SURVEY.md [R] claim is wrong — fix the "
              "survey and re-anchor the matching cvm_tpu component/goldens.")
    if args.json:
        with open(args.json, "w") as f:
            json.dump(results, f, indent=1)
    return 1 if counts["FAIL"] else 0


if __name__ == "__main__":
    sys.exit(main())
