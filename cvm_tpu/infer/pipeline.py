"""End-to-end jitted inference: raw batch → preprocess → model → decode.

This is the benchmark surface (BASELINE.json: "preprocess + infer + head
decode" per image). The whole path — letterbox, normalize, forward, peak
decode / argmax / upsample, and mapping results back to original-image
coordinates — is ONE compiled XLA program per model; only the final small
result tensors cross back to the host (unlike the reference, which does
pre/post on host per image, SURVEY.md §3.2).
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp

from cvm_tpu.models.registry import ModelSpec
from cvm_tpu.ops.decode import decode_centernet, semseg_argmax
from cvm_tpu.ops.image import map_boxes_to_input
from cvm_tpu.parallel.mesh import batch_sharding, replicated
from cvm_tpu.pipeline.preprocess import preprocess_image_batch, preprocess_yuv420_batch


def _postprocess(
    spec_name: str, params_cfg, out, rois, intrinsics=None
) -> Dict[str, jnp.ndarray]:
    res: Dict[str, jnp.ndarray] = {}
    if spec_name in ("centernet", "multitask"):
        stride = getattr(params_cfg, "stride", getattr(params_cfg, "det_stride", 4))
        top_k = getattr(params_cfg, "top_k", 100)
        if intrinsics is not None and "depth3d" in out:
            # Monocular 3D serving (KITTI/nuScenes with_3d configs): peaks →
            # metric camera-frame boxes. The intrinsics arrive in
            # original-image pixels and are mapped through the SAME ROI as
            # the image (ops/warp.scale_intrinsics), so back-projection uses
            # model-input-frame focal lengths/centers.
            from cvm_tpu.ops.decode import decode_centernet_3d
            from cvm_tpu.ops.warp import scale_intrinsics

            intr_in = scale_intrinsics(intrinsics, rois)
            d3 = decode_centernet_3d(
                out["heatmap"], out["offset"], out["size"], out["depth3d"],
                out["dims3d"], out["rot"], intr_in, stride=stride, top_k=top_k,
            )
            det = d3.det
            res["centers3d"] = d3.centers3d
            res["dims"] = d3.dims
            res["yaw"] = d3.yaw
        else:
            det = decode_centernet(
                out["heatmap"], out["offset"], out["size"], stride=stride,
                top_k=top_k,
            )
        boxes = jax.vmap(map_boxes_to_input)(det.boxes, rois)
        res["boxes"] = boxes
        res["scores"] = det.scores
        res["classes"] = det.classes
    if spec_name in ("semseg", "multitask"):
        res["class_map"] = semseg_argmax(out["logits"])
    if spec_name in ("depth", "multitask"):
        res["depth"] = out["depth"]
    if spec_name == "dmds":
        res["depth"] = out["depth_a"]
        res["rotation"] = out["motion_fwd"]["rotation"]
        res["translation"] = out["motion_fwd"]["translation"]
    return res


class InferencePipeline:
    """Jitted predict for a trained model (params/batch_stats variables)."""

    def __init__(
        self,
        spec: ModelSpec,
        params_cfg,
        variables: Dict[str, Any],
        mesh=None,
        input_format: str = "rgb",
        w8a8: bool = False,
        w8a8_fused: bool = False,
        w8a8_chain: bool = False,
        fused_interpret: Optional[bool] = None,
        fold_bn: bool = False,
        tta: str = "none",
    ):
        self.spec = spec
        self.cfg = params_cfg
        from cvm_tpu.models.registry import build_model

        self.model = build_model(spec, params_cfg, mesh=mesh)
        self._variables = variables
        self._plain_weights = not (fold_bn or w8a8)
        self.input_format = input_format
        out_hw = params_cfg.input_hw
        is_dmds = spec.name == "dmds"

        base_apply = self.model.apply
        if w8a8_fused and not isinstance(w8a8, dict):
            raise ValueError(
                "w8a8_fused requires calibrated per-conv scales: pass "
                "w8a8={module_path: scale} (calibrate_activation_scales). "
                "Silently serving dynamic-quant or fp when the fused int8 "
                "path was requested would hide the miscalibration."
            )
        if w8a8_chain and not w8a8_fused:
            raise ValueError(
                "w8a8_chain is a mode of the fused kernel path — set "
                "w8a8_fused=True (with calibrated scales) as well")
        if fold_bn and w8a8_fused:
            # The fused Pallas kernel reads the live bn params/batch_stats
            # to build its epilogue affine; folded kernels ALREADY carry the
            # BN scale, so combining them double-applies gamma/rsqrt(var).
            # Folding also buys nothing here — the fused epilogue keeps BN
            # VMEM-resident anyway.
            raise ValueError(
                "fold_bn and w8a8_fused are mutually exclusive: the fused "
                "kernel applies the BN affine in its epilogue from the live "
                "bn stats, so folded kernels would get the BN scale twice. "
                "w8a8_fused already keeps BN inside the kernel; drop fold_bn."
            )
        if fold_bn:
            # Export-time conv+BN fusion (infer/fold_bn.py): kernels carry
            # the BN scale, each BN runs as a fused bias add. Composes with
            # the non-fused w8a8 paths below — the quantizer then sees the
            # FOLDED kernels (w8a8_fused is rejected above).
            from cvm_tpu.infer.fold_bn import bn_folded_inference, fold_batchnorm

            self._variables, bias_table = fold_batchnorm(variables)
            variables = self._variables
            unfolded_apply = base_apply

            def base_apply(*a, **kw):
                with bn_folded_inference(bias_table):
                    return unfolded_apply(*a, **kw)
        if isinstance(w8a8, dict) and not w8a8:
            raise ValueError(
                "w8a8 scales dict is empty — calibration produced no "
                "per-conv scales; refusing to silently serve fp as 'int8'"
            )
        if isinstance(w8a8, dict) and w8a8_fused:
            # Fused Pallas W8A8: each eligible ConvBN body (quantize + int8
            # MXU dot + BN/act epilogue) runs VMEM-resident, with weights
            # pre-quantized HOST-side so the program carries int8 weight
            # constants and never reads the fp32 kernels (DESIGN.md §9b).
            from cvm_tpu.infer.quantize import (
                prequantize_fused_weights,
                w8a8_fused_inference,
            )

            wtab = prequantize_fused_weights(variables)

            def apply_fn(*a, **kw):
                # fused_interpret=None auto-selects by backend; False forces
                # the real Mosaic kernel (cross-platform export lowers it
                # for TPU even from a CPU host).
                with w8a8_fused_inference(w8a8, weight_table=wtab,
                                          interpret=fused_interpret,
                                          chain=w8a8_chain):
                    return base_apply(*a, **kw)
        elif isinstance(w8a8, dict):
            # Static-calibrated W8A8: elementwise quantize with fixed scales
            # fuses into conv epilogues → int8-resident activations.
            from cvm_tpu.infer.quantize import w8a8_static_inference

            def apply_fn(*a, **kw):
                with w8a8_static_inference(w8a8):
                    return base_apply(*a, **kw)
        elif w8a8:
            from cvm_tpu.infer.quantize import w8a8_inference

            def apply_fn(*a, **kw):
                with w8a8_inference():
                    return base_apply(*a, **kw)
        else:
            apply_fn = base_apply
        if bool(getattr(params_cfg, "qat", False)) and not w8a8:
            # A QAT model's fp forward is not a deliverable: eval/serving of
            # plain weights must run the same fake-quant convs as the train
            # step, so tracked metrics (and --keep_best selection) score the
            # int8 artifact that ships, not an fp model that never will.
            # Skipped when w8a8 is active — that IS the int8 path already.
            from cvm_tpu.train.qat import fake_quant_training

            pre_qat_apply = apply_fn

            def apply_fn(*a, **kw):
                with fake_quant_training():
                    return pre_qat_apply(*a, **kw)
        if tta not in ("none", "hflip"):
            raise ValueError(f"tta must be none|hflip, got {tta!r}")
        if tta == "hflip":
            # Horizontal-flip test-time augmentation, merged at the HEAD
            # level inside the one jitted program (2x forward cost, zero
            # extra host round-trips). CenterNet: flip back + average the
            # heatmap/size maps BEFORE the NMS-free decode (the standard
            # CenterNet flip-test); sub-pixel offsets keep the unflipped
            # pass — the exact flip of a cell-relative offset needs a 1-px
            # cell shift, the original CenterNet makes the same choice.
            # Dense models average logits/depth directly.
            if bool(getattr(params_cfg, "with_3d", False)):
                raise ValueError(
                    "tta='hflip' is incompatible with with_3d decoding "
                    "(yaw sin/cos flips sign under mirroring)"
                )
            if is_dmds:
                raise ValueError(
                    "tta='hflip' is incompatible with dmds (two-frame "
                    "motion mirrors under flip)"
                )
            pre_tta_apply = apply_fn

            def apply_fn(variables, x, train=False):
                o = pre_tta_apply(variables, x, train=train)
                of = pre_tta_apply(variables, jnp.flip(x, axis=2), train=train)
                merged = dict(o)
                for k in ("heatmap", "size", "logits", "depth"):
                    if k in o:
                        merged[k] = 0.5 * (o[k] + jnp.flip(of[k], axis=2))
                return merged
        self._apply = apply_fn

        # Monocular 3D serving when the model has 3D heads; the pipeline then
        # takes per-image [fx, fy, cx, cy] (original-image pixels) alongside
        # the images.
        self.with_3d = bool(getattr(params_cfg, "with_3d", False))

        with_3d = self.with_3d

        def run_yuv(variables, y, u, v, image_hw, intrinsics, t1=None):
            proc, rois = preprocess_yuv420_batch(
                None, y, u, v, image_hw, out_hw, train=False,
                out_dtype=jnp.bfloat16,
            )
            if t1 is not None:  # two-frame dmds: same ROI via same image_hw
                proc_b, _ = preprocess_yuv420_batch(
                    None, *t1, image_hw, out_hw, train=False,
                    out_dtype=jnp.bfloat16,
                )
                proc = jnp.concatenate([proc, proc_b], axis=-1)
            out = self._apply(variables, proc, train=False)
            return _postprocess(spec.name, params_cfg, out, rois, intrinsics)

        def run_rgb(variables, images, image_hw, images_t1, intrinsics):
            proc, rois = preprocess_image_batch(
                None, images, image_hw, out_hw, train=False,
                out_dtype=jnp.bfloat16,
            )
            if is_dmds:
                proc_b, _ = preprocess_image_batch(
                    None, images_t1, image_hw, out_hw, train=False,
                    out_dtype=jnp.bfloat16,
                )
                proc = jnp.concatenate([proc, proc_b], axis=-1)
            out = self._apply(variables, proc, train=False)
            return _postprocess(spec.name, params_cfg, out, rois, intrinsics)

        if input_format == "yuv420":
            # Bandwidth-optimal serving path: host ships 4:2:0 planes
            # (half the bytes of RGB); chroma upsample + color conversion
            # fuse into the device preprocess.
            if is_dmds:
                def predict(variables, y, u, v, y1, u1, v1, image_hw):
                    return run_yuv(variables, y, u, v, image_hw, None,
                                   t1=(y1, u1, v1))

                n_data_args = 7
            elif with_3d:
                def predict(variables, y, u, v, image_hw, intrinsics):
                    return run_yuv(variables, y, u, v, image_hw, intrinsics)

                n_data_args = 5
            else:
                def predict(variables, y, u, v, image_hw):
                    return run_yuv(variables, y, u, v, image_hw, None)

                n_data_args = 4
        else:
            if is_dmds:
                def predict(variables, images, image_hw, images_t1):
                    return run_rgb(variables, images, image_hw, images_t1, None)

                n_data_args = 3
            elif with_3d:
                def predict(variables, images, image_hw, intrinsics):
                    return run_rgb(variables, images, image_hw, None, intrinsics)

                n_data_args = 3
            else:
                def predict(variables, images, image_hw):
                    return run_rgb(variables, images, image_hw, None, None)

                n_data_args = 2

        kw = {}
        if mesh is not None:
            # Sharded serving (SURVEY §2 parallelism — DP applies to the
            # benchmark surface §3.2, not just training): batch sharded over
            # the "data" axis, small result tensors gathered replicated. With
            # tensor_parallel on, the Megatron-split kernels stay physically
            # sharded on "model" (same rules as Trainer) instead of being
            # gathered at the jit boundary.
            repl = replicated(mesh)
            bsh = batch_sharding(mesh)
            var_sh: Any = repl
            if getattr(params_cfg, "tensor_parallel", False):
                from cvm_tpu.parallel.sharding import (
                    make_param_shardings, tp_rules_for)

                rules = tp_rules_for(spec.name)
                var_sh = {
                    k: make_param_shardings(
                        v, mesh, rules if k == "params" else ())
                    for k, v in self._variables.items()
                }
            kw = dict(
                in_shardings=(var_sh,) + (bsh,) * n_data_args,
                out_shardings=repl,
            )
        self._predict = jax.jit(predict, **kw)
        # GSPMD needs the batch axis divisible by the devices it is sharded
        # over (("data","model") — the full mesh). Small ad-hoc batches
        # (e.g. cli.infer --batch_size 2 on an 8-device mesh) are padded up
        # to the divisor in __call__ and the results sliced back.
        self._batch_divisor = int(mesh.devices.size) if mesh is not None else 0

    def update_variables(self, variables: Dict[str, Any]) -> None:
        """Swap the served weights without retracing (variables are a jit
        argument). Valid only for the plain fp pipeline — fold_bn/w8a8
        pipelines bake weight transforms at build time; rebuild those."""
        if not self._plain_weights:
            raise ValueError(
                "update_variables on a fold_bn/w8a8 pipeline would serve "
                "untransformed weights — rebuild the pipeline instead"
            )
        self._variables = variables

    def _run(self, *data_args):
        """Invoke the jitted program, padding the batch axis up to the mesh
        divisor (repeat the last row) and slicing the results back — keeps
        one compiled program per (padded) batch size."""
        from cvm_tpu.utils.batch import pad_rows

        B = int(data_args[0].shape[0])
        n = self._batch_divisor
        pad = (-B) % n if n else 0
        if pad:
            data_args = pad_rows(data_args, B + pad)
        out = self._predict(self._variables, *data_args)
        if pad:
            out = {k: v[:B] for k, v in out.items()}
        return out

    def __call__(self, batch: Dict[str, Any]) -> Dict[str, jnp.ndarray]:
        """batch: image (B, Hm, Wm, 3) uint8 + image_hw (B, 2); dmds adds
        image_t1; yuv420 format instead takes y/u/v planes + image_hw; with_3d
        configs additionally take intrinsics (B, 4) in original-image px."""
        import numpy as _np

        def intr():
            if "intrinsics" in batch:
                return batch["intrinsics"]
            # No intrinsics provided: identity-ish placeholder (3D outputs
            # will be geometrically meaningless but shapes stay valid).
            B = batch["image_hw"].shape[0]
            return _np.tile(_np.asarray([[1.0, 1.0, 0.0, 0.0]], _np.float32), (B, 1))

        if self.input_format == "yuv420":
            if self.spec.name == "dmds":
                return self._run(
                    batch["y"], batch["u"], batch["v"],
                    batch["y_t1"], batch["u_t1"], batch["v_t1"],
                    batch["image_hw"],
                )
            args = (batch["y"], batch["u"], batch["v"], batch["image_hw"])
            if self.with_3d:
                args += (intr(),)
            return self._run(*args)
        if self.spec.name == "dmds":
            return self._run(
                batch["image"], batch["image_hw"], batch["image_t1"]
            )
        if self.with_3d:
            return self._run(batch["image"], batch["image_hw"], intr())
        return self._run(batch["image"], batch["image_hw"])
