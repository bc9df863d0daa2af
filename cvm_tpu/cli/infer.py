"""Inference entry point: run a trained checkpoint on images or records.

Mirrors the reference's per-model inference.py scripts (SURVEY.md §3.2);
decode runs on device, results print as JSONL (or render to PNGs with
--visualize, the OpenCV-drawing analogue).
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys

import numpy as np


def _run_tiled(args, spec, cfg, trainer):
    """Per-image native-resolution dense prediction (infer/tiled.py)."""
    from PIL import Image

    from cvm_tpu.infer.tiled import tiled_predict

    files = sorted(glob.glob(args.images))
    if not files:
        raise SystemExit(f"no files match {args.images!r}")
    trainer.init_state()
    variables = {"params": trainer.eval_params,
                 "batch_stats": trainer.state.batch_stats}
    if args.visualize:
        os.makedirs(args.visualize, exist_ok=True)
    for f in files:
        img = np.asarray(Image.open(f).convert("RGB"), np.uint8)
        out = tiled_predict(spec, cfg, variables, img,
                            overlap=args.tile_overlap)
        rec = {"input": os.path.basename(f), "hw": list(img.shape[:2])}
        if "class_map" in out:
            cm = np.asarray(out["class_map"])
            rec["class_histogram"] = np.bincount(
                cm.reshape(-1), minlength=1).tolist()
        if "depth" in out:
            rec["depth_mean"] = float(np.asarray(out["depth"]).mean())
        print(json.dumps(rec), flush=True)
        if args.visualize:
            base = os.path.join(args.visualize, os.path.basename(f))
            if "class_map" in out:
                from cvm_tpu.models.semseg.params import SEMSEG_PALETTE

                pal = np.asarray(SEMSEG_PALETTE, np.uint8)
                cm = np.asarray(out["class_map"])
                Image.fromarray(pal[np.clip(cm, 0, len(pal) - 1)]).save(
                    base + ".classes.png")
            if "depth" in out:
                d = np.asarray(out["depth"])[..., 0]
                # uint16 depth*256 — the KITTI-PNG convention the adapters
                # already read back.
                Image.fromarray((np.clip(d, 0, 255) * 256).astype(np.uint16)
                                ).save(base + ".depth.png")
    return 0


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--model", default=None,
                        help="model-zoo name (optional with --artifact)")
    parser.add_argument("--checkpoint_dir", default=None)
    parser.add_argument("--artifact", default=None, metavar="DIR",
                        help="run an EXPORTED artifact (cli.export output) "
                             "instead of a checkpoint: the serialized "
                             "program + shipped weights produce the JSONL "
                             "and --visualize renderings (rgb exports; "
                             "quantize/fold/tta are baked in at export)")
    parser.add_argument("--images", default=None, help="glob of image files")
    parser.add_argument("--records", default=None, help=".cvrec glob")
    parser.add_argument("--batch_size", type=int, default=8)
    parser.add_argument("--max_batches", type=int, default=None)
    parser.add_argument("--score_threshold", type=float, default=0.3)
    parser.add_argument("--visualize", default=None, help="output dir for rendered PNGs")
    parser.add_argument("--w8a8", action="store_true",
                        help="run convs on the int8 path with calibrated "
                             "static activation scales (calibrates on the "
                             "first batch)")
    parser.add_argument("--tta", default="none", choices=("none", "hflip"),
                        help="test-time augmentation: hflip merges the "
                             "flipped pass at the head level (2x forward "
                             "cost; rejected for with_3d/dmds)")
    parser.add_argument("--tiled", action="store_true",
                        help="dense models (semseg/depth/multitask): stitch "
                             "predictions at each image's NATIVE resolution "
                             "from overlapping input_hw tiles instead of "
                             "letterboxing to the training size")
    parser.add_argument("--tile_overlap", type=float, default=0.25)
    args = parser.parse_args(argv)

    from cvm_tpu.utils.platform import apply_platform_env

    apply_platform_env()

    if bool(args.artifact) == bool(args.checkpoint_dir):
        parser.error("exactly one source: --checkpoint_dir or --artifact")

    sm = None
    if args.artifact:
        # Deployment-side inference: the serialized program runs as-is (the
        # reference's "run the converted TFLite" step with drawings).
        from cvm_tpu.infer.runtime import ServingModel

        for flag, name in ((args.w8a8, "--w8a8"), (args.tta != "none", "--tta"),
                           (args.tiled, "--tiled")):
            if flag:
                parser.error(f"{name} is baked at export time for artifacts")
        sm = ServingModel(args.artifact)
        if sm.input_format != "rgb":
            parser.error("cli.infer serves rgb artifacts (yuv420 accuracy "
                         "runs via cli.evaluate --artifact; streaming via "
                         "cli.serve)")
        name = sm.meta.get("model")
        if sm.meta.get("model") == "dmds":
            parser.error("two-frame dmds artifacts stream via cli.serve "
                         "--records")
        if args.model and args.model != name:
            parser.error(f"--model {args.model} but the artifact is a "
                         f"{name!r} export")
        args.model = name
        args.batch_size = int(sm.meta.get("batch_size", args.batch_size))
        pad_hw = tuple(sm.meta.get("pad_hw"))
    elif not args.model:
        parser.error("--model is required with --checkpoint_dir")

    import jax

    from cvm_tpu.models import get_model
    from cvm_tpu.infer.pipeline import InferencePipeline
    from cvm_tpu.train.checkpoints import CheckpointManager, load_params_cfg
    from cvm_tpu.train.loop import Trainer

    if sm is None:
        spec = get_model(args.model)
        cfg = load_params_cfg(args.checkpoint_dir, spec.params_cls)

        trainer = Trainer(spec, cfg, checkpoint_dir=args.checkpoint_dir)
        pad_hw = (int(cfg.input_hw[0] * 1.5), int(cfg.input_hw[1] * 1.5))

    if args.tiled:
        if spec.name not in ("semseg", "depth", "multitask"):
            parser.error("--tiled is for dense models (semseg/depth/multitask)")
        if not args.images:
            parser.error("--tiled requires --images (records serve fixed-size)")
        if args.w8a8 or args.tta != "none":
            parser.error("--tiled does not compose with --w8a8/--tta "
                         "(qat configs quantize inside tiled_predict already)")
        return _run_tiled(args, spec, cfg, trainer)

    def batches():
        if args.images:
            from cvm_tpu.native import decode_jpeg_batch
            from cvm_tpu.data.adapters.common import read_image_as_jpeg

            files = sorted(glob.glob(args.images))
            for s in range(0, len(files), args.batch_size):
                chunk = files[s : s + args.batch_size]
                jpegs = [read_image_as_jpeg(f)[0] for f in chunk]
                # Pad the final chunk to a full batch (static shapes; the
                # batch axis must divide the device mesh) — handle() only
                # reports the first len(chunk) results.
                while len(jpegs) < args.batch_size:
                    jpegs.append(jpegs[-1])
                img, hw = decode_jpeg_batch(jpegs, *pad_hw)
                yield chunk, {"image": img, "image_hw": hw}
        elif args.records:
            from cvm_tpu.data.loader import RecordLoader
            from cvm_tpu.data.records import RecordDataset

            ds = RecordDataset([args.records])
            loader = RecordLoader(ds, args.batch_size, pad_hw, shuffle=False, loop=False)
            for i, b in enumerate(iter(loader)):
                yield [f"rec{i * args.batch_size + j}" for j in range(args.batch_size)], b
        else:
            parser.error("need --images or --records")

    gen = batches()
    names, first = next(gen)
    if sm is not None:
        # Argument ordering/padding/intrinsics-defaulting/trim live in
        # ServingModel.predict_batch (the one consumer-side home of the
        # export trace-signature contract).
        return _drive(args, gen, names, first, sm.predict_batch)
    trainer.init_state(first)
    variables = {"params": trainer.eval_params, "batch_stats": trainer.state.batch_stats}
    w8a8 = False
    if args.w8a8 and args.model == "dmds":
        parser.error("--w8a8 is not supported for two-frame dmds")
    if args.w8a8:
        # Calibrate per-conv activation scales on the first batch (eager),
        # then serve through the static int8 path.
        import jax.numpy as jnp

        from cvm_tpu.infer.quantize import calibrate_activation_scales
        from cvm_tpu.models.registry import build_model
        from cvm_tpu.pipeline.preprocess import preprocess_batch

        model = build_model(spec, cfg, mesh=trainer.mesh)
        proc, _ = preprocess_batch(
            None, {k: jnp.asarray(v) for k, v in first.items()
                   if k in ("image", "y", "u", "v", "image_hw")},
            cfg.input_hw, train=False,
        )
        w8a8 = calibrate_activation_scales(
            lambda x: model.apply(variables, x, train=False), [proc]
        )
        print(json.dumps({"w8a8_calibrated_convs": len(w8a8)}), flush=True)
    pipe = InferencePipeline(spec, cfg, variables, mesh=trainer.mesh, w8a8=w8a8,
                             tta=args.tta)
    return _drive(args, gen, names, first, pipe)


def _drive(args, gen, names, first, pipe):
    """Shared JSONL + --visualize loop (checkpoint pipeline or artifact)."""
    if args.visualize:
        os.makedirs(args.visualize, exist_ok=True)

    def handle(names, batch, out):
        for i, name in enumerate(names):
            if i >= batch["image"].shape[0]:
                break
            rec = {"input": os.path.basename(str(name))}
            if "boxes" in out:
                keep = np.asarray(out["scores"][i]) >= args.score_threshold
                rec["boxes"] = np.asarray(out["boxes"][i])[keep].tolist()
                rec["scores"] = np.asarray(out["scores"][i])[keep].tolist()
                rec["classes"] = np.asarray(out["classes"][i])[keep].tolist()
            if "class_map" in out:
                cm = np.asarray(out["class_map"][i])
                rec["class_histogram"] = np.bincount(cm.reshape(-1), minlength=1).tolist()
            if "depth" in out:
                d = np.asarray(out["depth"][i])
                rec["depth_mean"] = float(d.mean())
            if "centers3d" in out:
                keep = np.asarray(out["scores"][i]) >= args.score_threshold
                rec["centers3d"] = np.asarray(out["centers3d"][i])[keep].tolist()
                rec["dims3d"] = np.asarray(out["dims"][i])[keep].tolist()
                rec["yaw"] = np.asarray(out["yaw"][i])[keep].tolist()
            print(json.dumps(rec), flush=True)
            if args.visualize:
                from cvm_tpu.infer.visualize import render_sample

                vis = {k: np.asarray(v[i]) for k, v in out.items()}
                if "centers3d" in out and "intrinsics" in batch:
                    # 3D wireframes project with ORIGINAL-image intrinsics
                    # (the drawing happens on the undistorted source frame).
                    vis["intrinsics"] = np.asarray(batch["intrinsics"][i])
                render_sample(
                    os.path.join(args.visualize, f"{os.path.basename(str(name))}.png"),
                    batch["image"][i], batch["image_hw"][i],
                    vis,
                    args.score_threshold,
                )

    n = 0
    handle(names, first, pipe(first))
    n += 1
    for names, batch in gen:
        if args.max_batches is not None and n >= args.max_batches:
            break
        handle(names, batch, pipe(batch))
        n += 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
