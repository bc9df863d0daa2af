"""Standalone serving runtime: load an exported artifact and run it.

Counterpart of cli/export.py: deserializes the StableHLO program
(jax.export) and rebuilds the variables pytree from weights.npz (including
int8-quantized entries, dequantized at load) — no model-zoo code needed at
serving time. The deserialized program embeds the full device pipeline
(preprocess + forward + decode).
"""

from __future__ import annotations

import os
from typing import Any, Dict

import numpy as np


def _unflatten(flat: Dict[str, np.ndarray]) -> Dict[str, Any]:
    tree: Dict[str, Any] = {}
    for key, arr in flat.items():
        parts = key.split("/")
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = arr
    return tree


def _dequantize(tree: Dict[str, Any]):
    """Collapse {"int8", "scale"} leaves back to fp32 arrays (numpy).

    Shares the quantized-leaf walker with infer.quantize so a format change
    (e.g. per-group scales) cannot diverge between export and load."""
    from cvm_tpu.infer.quantize import map_quantized_leaves

    return map_quantized_leaves(
        tree, lambda q, s: q.astype(np.float32) * s.astype(np.float32)
    )


class ServingModel:
    """Loads {model.stablehlo, weights.npz} and exposes __call__.

    Multi-batch artifacts (``cli.export --batch_sizes 1,4,8``) additionally
    ship ``model_b{n}.stablehlo`` per size; __call__ then accepts ANY batch
    size — each request runs on the smallest fitting bucket (short batches
    pad by repeating the last row, the framework-wide rule in utils/batch),
    and batches beyond the largest bucket are chunked through it. Single-
    program artifacts keep the exact static-batch contract unchanged."""

    def __init__(self, artifact_dir: str):
        import glob
        import json

        from jax import export as jax_export

        self.artifact_dir = artifact_dir

        with open(os.path.join(artifact_dir, "model.stablehlo"), "rb") as f:
            self._exported = jax_export.deserialize(bytearray(f.read()))

        meta_path = os.path.join(artifact_dir, "artifact.json")
        self.meta: Dict[str, Any] = {}
        if os.path.exists(meta_path):
            with open(meta_path) as f:
                self.meta = json.load(f)
        self.input_format: str = self.meta.get("input_format", "rgb")

        self._buckets: Dict[int, Any] = {}
        for path in glob.glob(os.path.join(artifact_dir, "model_b*.stablehlo")):
            n = int(os.path.basename(path)[len("model_b"):-len(".stablehlo")])
            primary = self.meta.get("batch_size")
            if n == primary:
                self._buckets[n] = self._exported  # same program, don't reload
                continue
            with open(path, "rb") as f:
                self._buckets[n] = jax_export.deserialize(bytearray(f.read()))
        self.bucket_sizes = sorted(self._buckets)

        with np.load(os.path.join(artifact_dir, "weights.npz")) as z:
            flat = {k: z[k] for k in z.files}
        tree = _dequantize(_unflatten(flat))
        self.variables = {
            "params": tree.get("params", {}),
            "batch_stats": tree.get("batch_stats", {}),
        }

    def _call_bucketed(self, B: int, data_args):
        import jax

        from cvm_tpu.utils.batch import pad_rows

        fit = [n for n in self.bucket_sizes if n >= B]
        if fit:
            n = fit[0]
            padded = pad_rows(data_args, n)
            out = self._buckets[n].call(self.variables, *padded)
            return jax.tree.map(lambda x: x[:B], out)
        # B exceeds the largest bucket: chunk through it.
        n = self.bucket_sizes[-1]
        chunks = []
        for i in range(0, B, n):
            part = [a[i:i + n] for a in data_args]
            chunks.append(self._call_bucketed(min(n, B - i), part))
        return jax.tree.map(lambda *xs: np.concatenate(
            [np.asarray(x) for x in xs], axis=0), *chunks)

    def __call__(self, *data_args):
        """data_args match the export signature after variables (e.g. images,
        image_hw — or y, u, v, image_hw for a yuv420 export)."""
        if self.bucket_sizes:
            B = int(np.asarray(data_args[0]).shape[0])
            if B not in self._buckets:
                return self._call_bucketed(B, [np.asarray(a) for a in data_args])
            return self._buckets[B].call(self.variables, *data_args)
        return self._exported.call(self.variables, *data_args)

    def predict_batch(self, batch: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
        """Run a dict batch through the artifact: orders arguments to match
        cli.export's trace signature (rgb = image, hw[, image_t1]; yuv420 =
        y, u, v[, *_t1], hw; with_3d appends intrinsics), pads partial
        batches to the program's static batch, and trims outputs back to the
        true row count. The ONE place the trace-argument contract lives on
        the consumer side — cli.evaluate/infer/video all call this."""
        from cvm_tpu.utils.batch import pad_rows

        name = self.meta.get("model")
        cfg = self.meta.get("params_cfg") or {}
        hw = np.asarray(batch["image_hw"], np.int32)
        B = int(hw.shape[0])
        u8 = lambda k: np.ascontiguousarray(batch[k], dtype=np.uint8)
        if self.input_format == "yuv420":
            data = [u8("y"), u8("u"), u8("v")]
            if name == "dmds":
                data += [u8("y_t1"), u8("u_t1"), u8("v_t1")]
            data.append(hw)
        else:
            data = [u8("image"), hw]
            if name == "dmds":
                data.append(u8("image_t1"))
        if bool(cfg.get("with_3d", False)):
            intr = batch.get("intrinsics")
            if intr is None:
                # Bare image files / video frames carry no camera K: decode
                # against the identity camera (fx=fy=1, cx=cy=0) — centers
                # and yaw remain meaningful, metric back-projection doesn't.
                intr = np.tile(np.asarray([[1.0, 1.0, 0.0, 0.0]], np.float32),
                               (B, 1))
            data.append(np.asarray(intr, np.float32))
        art_bs = int(self.meta.get("batch_size", 1))
        out = self(*data) if self.bucket_sizes else self(*pad_rows(data, art_bs))
        return {k: np.asarray(v)[:B] for k, v in out.items()}

    def selftest(self, rtol: float = 0.05, atol: float = 1e-3):
        """Verify program+weights integrity against the fingerprint recorded
        at export (infer/selftest.py). Returns [] when verified, else
        mismatch descriptions."""
        from cvm_tpu.infer.selftest import run_selftest

        return run_selftest(self, rtol=rtol, atol=atol)
