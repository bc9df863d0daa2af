"""Standalone evaluation: ``python -m cvm_tpu.cli.evaluate --model X --workdir D``.

Loads the latest checkpoint from a training workdir and runs the full
evaluator (mAP / mIoU / depth metrics through the on-device decode paths)
over a held-out split — the reference's "run inference.py over the val set
and inspect" loop (SURVEY.md §3.2) as a headless, metric-producing command.
"""

from __future__ import annotations

import argparse
import json
import sys


def _build_val(args, cfg, pad_hw, yuv420=False):
    """Held-out eval source: fixed-seed synthetic scenes or .cvrec shards."""
    if args.data == "synthetic":
        import numpy as np

        from cvm_tpu.data.synthetic import synthetic_batch

        nc = getattr(cfg, "num_classes", getattr(cfg, "num_det_classes", 3))
        rng = np.random.default_rng(999)
        return [
            synthetic_batch(rng, cfg.batch_size, pad_hw, num_classes=min(nc, 10),
                            two_frame=(args.model == "dmds"),
                            with_3d=getattr(cfg, "with_3d", False),
                            yuv420=yuv420)
            for _ in range(args.batches)
        ]
    from cvm_tpu.data.loader import RecordLoader
    from cvm_tpu.data.records import RecordDataset

    ds = RecordDataset([p for p in args.data.split(",") if p])
    train_ids, val_ids = ds.split_ids()
    ids = {"val": val_ids, "train": train_ids, "all": None}[args.split]
    return RecordLoader(ds, cfg.batch_size, pad_hw, ids=ids, shuffle=False,
                        loop=False, max_objects=getattr(cfg, "max_objects", 128),
                        output_format="yuv420" if yuv420 else "rgb")


def _emit(args, m, step):
    variant = ""
    if args.artifact:
        variant = f" artifact={args.artifact}"
    elif args.quantize != "none" or args.fold_bn:
        variant = (f" quantize={args.quantize}"
                   f"{' fold_bn' if args.fold_bn else ''}")
    print(f"[cvm_tpu] eval model={args.model} step={step} "
          f"split={args.split}{variant}: "
          f"{json.dumps(m, sort_keys=True)}", flush=True)
    if args.json_out:
        payload = {"model": args.model, "step": step,
                   "quantize": args.quantize, "fold_bn": args.fold_bn, **m}
        if args.artifact:
            payload["artifact"] = args.artifact
        with open(args.json_out, "w") as f:
            json.dump(payload, f)


def _evaluate_artifact(parser, args, overrides):
    """Score a serialized cli.export artifact through the metric pipeline.

    The StableHLO program and shipped weights run EXACTLY as a deployment
    would (ServingModel load path: deserialize + unflatten/dequantize), so
    this is the final word on artifact accuracy — the reference's "evaluate
    the converted TFLite, not the Keras graph" step (SURVEY.md §3.5).
    """
    import numpy as np

    for flag, name in ((args.tta != "none", "--tta"),
                       (args.quantize != "none", "--quantize"),
                       (args.fold_bn, "--fold_bn"),
                       (bool(args.average_last), "--average_last"),
                       (bool(args.checkpoint_dir), "--checkpoint_dir")):
        if flag:
            parser.error(f"{name} does not apply to --artifact evaluation "
                         "(those choices are baked into the export)")
    if overrides:
        parser.error(f"config overrides {overrides} don't apply to "
                     "--artifact evaluation (the artifact is sealed)")

    from cvm_tpu.infer.runtime import ServingModel
    from cvm_tpu.models import get_model
    from cvm_tpu.train.evaluate import evaluate_model

    sm = ServingModel(args.artifact)
    meta = sm.meta
    name = meta.get("model")
    if args.model and args.model != name:
        parser.error(f"--model {args.model} but the artifact is a {name!r} "
                     "export")
    if args.pr_out and name not in ("centernet", "multitask"):
        parser.error(f"--pr_out needs a detection-capable model "
                     f"(centernet/multitask); the artifact is {name!r}")
    if "params_cfg" not in meta:
        parser.error("artifact predates params_cfg metadata — re-export "
                     "with the current cli.export")
    args.model = name
    spec = get_model(name)
    cfg = spec.params_cls.from_dict(meta["params_cfg"])
    art_bs = int(meta.get("batch_size", 1))
    cfg = cfg.replace(batch_size=art_bs)
    # Eval batches must live on the artifact's static canvas.
    pad_hw = tuple(meta["pad_hw"])
    if args.pad_hw:
        from cvm_tpu.utils.config import parse_hw

        if tuple(parse_hw(args.pad_hw, "--pad_hw")) != pad_hw:
            parser.error(f"--pad_hw must match the artifact's static canvas "
                         f"{pad_hw[0]},{pad_hw[1]}")

    yuv = sm.input_format == "yuv420"

    # Argument ordering/padding/trim live in ServingModel.predict_batch —
    # the single consumer-side home of the export trace-signature contract.
    predict_fn = sm.predict_batch

    val = _build_val(args, cfg, pad_hw, yuv420=yuv)
    m = evaluate_model(spec, cfg, None, val, max_batches=args.batches,
                       per_class=args.per_class, size_buckets=args.size_ap,
                       confusion=args.confusion,
                       pr_curves=args.pr_out is not None,
                       predict_fn=predict_fn)
    if args.pr_out:
        with open(args.pr_out, "w") as f:
            json.dump(m.pop("pr_curves", {}), f)
        print(f"[cvm_tpu] PR curves -> {args.pr_out}", file=sys.stderr)
    _emit(args, m, step=-1)
    return 0


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--model", default=None,
                        help="model-zoo name (optional with --artifact, "
                             "which is self-describing)")
    parser.add_argument("--workdir", default="runs/default",
                        help="training workdir containing checkpoints/")
    parser.add_argument("--checkpoint_dir", default=None,
                        help="explicit checkpoint dir (overrides "
                             "<workdir>/checkpoints — e.g. <workdir>/best "
                             "from --keep_best)")
    parser.add_argument("--data", default="synthetic", help="'synthetic' or .cvrec glob")
    parser.add_argument("--split", default="val", choices=("val", "train", "all"),
                        help="which id split of the dataset to evaluate")
    parser.add_argument("--batches", type=int, default=50)
    parser.add_argument("--pad_hw", default=None)
    parser.add_argument("--json_out", default=None,
                        help="also write metrics as JSON to this path")
    parser.add_argument("--per_class", action="store_true",
                        help="report per-class AP / IoU alongside the means")
    parser.add_argument("--tta", default="none", choices=("none", "hflip"),
                        help="test-time augmentation: hflip merges the "
                             "flipped pass at the head level (2x forward "
                             "cost; rejected for with_3d/dmds)")
    parser.add_argument("--size_ap", action="store_true",
                        help="report COCO-style mAP_small/medium/large")
    parser.add_argument("--pr_out", default=None, metavar="FILE",
                        help="write per-class precision/recall operating "
                             "curves (IoU 0.5) as JSON — pick the deployment "
                             "score_threshold from measured data")
    parser.add_argument("--confusion", action="store_true",
                        help="include the row-normalized semseg confusion "
                             "matrix (confusion[gt][pred]) in the output")
    parser.add_argument("--average_last", type=int, default=0, metavar="N",
                        help="evaluate the MEAN of the last N retained "
                             "checkpoints (SWA) instead of the newest one")
    parser.add_argument("--quantize", default="none",
                        choices=("none", "int8", "w8a8", "w8a8_static",
                                 "w8a8_fused", "w8a8_fused_chain"),
                        help="score the DEPLOYED numerics: int8 = weight-only "
                             "(what --quantize int8 artifacts serve), w8a8 = "
                             "dynamic full-integer convs, w8a8_static = "
                             "calibrated static scales (identical calibration "
                             "to cli.export, so this measures the artifact), "
                             "w8a8_fused = same calibrated lattice through "
                             "the fused Pallas int8 ConvBN kernel, "
                             "w8a8_fused_chain = + int8-resident ResBlock "
                             "c1→c2 buffers (DESIGN.md §9c)")
    parser.add_argument("--fold_bn", action="store_true",
                        help="evaluate with conv+BN folded as at export time")
    parser.add_argument("--calib_batches", type=int, default=3,
                        help="synthetic calibration batches for w8a8_static")
    parser.add_argument("--artifact", default=None, metavar="DIR",
                        help="score a SERIALIZED export (cli.export output "
                             "dir) instead of a checkpoint: the StableHLO "
                             "program + shipped weights run as-is through "
                             "the metric pipeline — the final word on what "
                             "the deployed artifact scores")
    args, overrides = parser.parse_known_args(argv)

    from cvm_tpu.utils.platform import apply_platform_env

    apply_platform_env()

    if args.artifact:
        return _evaluate_artifact(parser, args, overrides)
    if not args.model:
        parser.error("--model is required (unless evaluating an --artifact)")

    from cvm_tpu.models import get_model
    from cvm_tpu.train.checkpoints import load_params_cfg
    from cvm_tpu.train.evaluate import evaluate_model
    from cvm_tpu.train.loop import Trainer

    spec = get_model(args.model)
    if args.pr_out and args.model not in ("centernet", "multitask"):
        parser.error(f"--pr_out needs a detection-capable model "
                     f"(centernet/multitask), got {args.model!r}")
    # The checkpoint is self-describing: use the SAVED config (so optimizer/
    # EMA/accum state templates match the on-disk tree), with CLI overrides
    # applied on top for eval-only knobs.
    ckpt_dir = args.checkpoint_dir or f"{args.workdir}/checkpoints"
    try:
        cfg_saved = load_params_cfg(ckpt_dir, spec.params_cls)
    except (FileNotFoundError, OSError):
        cfg_saved = spec.params_cls()
    cfg = cfg_saved
    if overrides:
        # Apply exactly the flags the user TYPED (a value equal to the class
        # default must still override the saved config — e.g.
        # ``--ema_decay 0.0`` to evaluate raw weights of an EMA checkpoint).
        passed = {t.lstrip("-").split("=", 1)[0] for t in overrides
                  if t.startswith("--")}
        base = cfg.to_dict()
        cli_cfg = spec.params_cls.from_cli(overrides).to_dict()
        base.update({k: v for k, v in cli_cfg.items() if k in passed})
        cfg = spec.params_cls.from_dict(base)
    if args.pad_hw:
        from cvm_tpu.utils.config import parse_hw

        pad_hw = parse_hw(args.pad_hw, "--pad_hw")
    else:
        pad_hw = (int(cfg.input_hw[0] * 1.5), int(cfg.input_hw[1] * 1.5))

    # The restore template's STRUCTURE must match the on-disk tree, so
    # state-shaping fields always come from the SAVED config; the override
    # (e.g. --ema_decay 0.0) only selects which weights are evaluated below.
    state_fields = {}
    for f in ("ema_decay", "grad_accum_steps", "tensor_parallel"):
        if hasattr(cfg_saved, f):
            state_fields[f] = getattr(cfg_saved, f)
    trainer = Trainer(spec, cfg.replace(**state_fields), checkpoint_dir=ckpt_dir)
    trainer.init_state()
    step = int(trainer.state.step)
    if step == 0:
        print(f"[cvm_tpu] WARNING: no checkpoint restored from "
              f"{ckpt_dir} — evaluating fresh init", file=sys.stderr)
    if args.average_last:
        from cvm_tpu.train.average import average_checkpoints

        try:
            steps = average_checkpoints(trainer, args.average_last)
        except ValueError as e:
            parser.error(f"--average_last: {e}")
        print(f"[cvm_tpu] averaged checkpoints at steps {list(steps)}",
              file=sys.stderr)

    val = _build_val(args, cfg, pad_hw)

    import jax

    use_ema = (getattr(cfg, "ema_decay", 0.0) > 0.0
               and jax.tree.leaves(trainer.state.ema_params))
    eval_params = trainer.state.ema_params if use_ema else trainer.state.params
    variables = {"params": eval_params,
                 "batch_stats": trainer.state.batch_stats}

    # Deployed-numerics variants: the reference's accuracy story is scored
    # on the artifact that ships (full-int8 TFLite, SURVEY.md §3.5), not the
    # training graph — these flags reproduce each artifact's compute path
    # inside the full metric pipeline.
    w8a8 = False
    w8a8_fused = args.quantize in ("w8a8_fused", "w8a8_fused_chain")
    w8a8_chain = args.quantize == "w8a8_fused_chain"
    if (args.quantize in ("w8a8", "w8a8_static", "w8a8_fused",
                          "w8a8_fused_chain")
            and args.model == "dmds"):
        parser.error("w8a8 evaluation is not supported for two-frame dmds "
                     "(matches cli.export)")
    if w8a8_fused and args.fold_bn:
        parser.error("--quantize w8a8_fused is incompatible with --fold_bn: "
                     "the fused kernel applies the BN affine in its epilogue "
                     "from live stats; folded kernels would get it twice")
    if args.quantize == "int8":
        from cvm_tpu.infer.quantize import (dequantize_params,
                                            quantization_error,
                                            quantize_params)

        qparams, _ = quantize_params(jax.device_get(variables["params"]))
        err = quantization_error(jax.device_get(variables["params"]), qparams)
        print(f"[cvm_tpu] weight-only int8: relative weight error {err:.3e}",
              file=sys.stderr)
        variables = {**variables, "params": dequantize_params(qparams)}
    elif args.quantize == "w8a8":
        w8a8 = True
    elif args.quantize in ("w8a8_static", "w8a8_fused", "w8a8_fused_chain"):
        # Identical calibration recipe to cli.export (synthetic scenes
        # through the serving preprocess), so the measured accuracy is the
        # shipped artifact's, scales included.
        import jax.numpy as jnp
        import numpy as np

        from cvm_tpu.data.synthetic import synthetic_batch
        from cvm_tpu.infer.quantize import calibrate_activation_scales
        from cvm_tpu.pipeline.preprocess import preprocess_batch

        model = spec.create_model(cfg)
        rng = np.random.default_rng(0)
        nc = getattr(cfg, "num_classes", getattr(cfg, "num_det_classes", 3))
        procs = []
        for _ in range(max(args.calib_batches, 1)):
            b = synthetic_batch(rng, max(cfg.batch_size, 2), pad_hw,
                                num_classes=min(nc, 10))
            proc, _ = preprocess_batch(
                None, {k: jnp.asarray(v) for k, v in b.items()
                       if k in ("image", "image_hw")},
                cfg.input_hw, train=False)
            procs.append(proc)
        host_vars = jax.device_get(variables)
        w8a8 = calibrate_activation_scales(
            lambda x: model.apply(host_vars, x, train=False), procs)
        print(f"[cvm_tpu] {args.quantize}: calibrated {len(w8a8)} convs "
              f"on {len(procs)} synthetic batches", file=sys.stderr)

    m = evaluate_model(spec, cfg, variables, val, max_batches=args.batches,
                       mesh=trainer.mesh, per_class=args.per_class,
                       size_buckets=args.size_ap, confusion=args.confusion,
                       pr_curves=args.pr_out is not None, tta=args.tta,
                       w8a8=w8a8, w8a8_fused=w8a8_fused,
                       w8a8_chain=w8a8_chain, fold_bn=args.fold_bn)
    if args.pr_out:
        with open(args.pr_out, "w") as f:
            json.dump(m.pop("pr_curves", {}), f)
        print(f"[cvm_tpu] PR curves -> {args.pr_out}", file=sys.stderr)
    _emit(args, m, step)
    return 0


if __name__ == "__main__":
    sys.exit(main())
