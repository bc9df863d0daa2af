"""LR-range finder CLI: ``python -m cvm_tpu.cli.lr_find --model centernet``.

Sweeps the learning rate log-linearly over a short fresh-model run through
the real compiled train step, prints the suggested peak LR (one JSON line),
and optionally writes the full (lr, loss) curve for plotting. See
cvm_tpu/train/lr_find.py for the method.
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--model", required=True)
    parser.add_argument("--data", default="synthetic",
                        help="'synthetic' or .cvrec glob(s), as cli.train")
    parser.add_argument("--num_steps", type=int, default=200)
    parser.add_argument("--lr_min", type=float, default=1e-6)
    parser.add_argument("--lr_max", type=float, default=1.0)
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--pad_hw", default=None)
    parser.add_argument("--curve_out", default=None,
                        help="write the (lr, loss) sweep as JSONL here")
    args, overrides = parser.parse_known_args(argv)

    from cvm_tpu.utils.platform import apply_platform_env

    apply_platform_env()

    from cvm_tpu.models import get_model
    from cvm_tpu.train.lr_find import run_lr_finder

    spec = get_model(args.model)
    cfg = spec.params_cls.from_cli(overrides)

    if args.pad_hw:
        from cvm_tpu.utils.config import parse_hw

        pad_hw = parse_hw(args.pad_hw, "--pad_hw")
    else:
        pad_hw = (int(cfg.input_hw[0] * 1.5), int(cfg.input_hw[1] * 1.5))

    nc = getattr(cfg, "num_classes", getattr(cfg, "num_det_classes", 3))
    if args.data == "synthetic":
        from cvm_tpu.data.synthetic import synthetic_iterator

        it = synthetic_iterator(
            args.seed, cfg.batch_size, pad_hw, num_classes=min(nc, 10),
            two_frame=(args.model == "dmds"),
            with_3d=getattr(cfg, "with_3d", False),
        )
    else:
        from cvm_tpu.data.loader import RecordLoader
        from cvm_tpu.data.records import RecordDataset

        ds = RecordDataset([p for p in args.data.split(",") if p])
        train_ids, _ = ds.split_ids()
        loader = RecordLoader(
            ds, cfg.batch_size, pad_hw, ids=train_ids,
            max_objects=getattr(cfg, "max_objects", 128), seed=args.seed,
        )
        it = iter(loader)

    res = run_lr_finder(
        spec, cfg, it, num_steps=args.num_steps,
        lr_min=args.lr_min, lr_max=args.lr_max, seed=args.seed,
    )
    curve = res.pop("curve")
    if args.curve_out:
        with open(args.curve_out, "w") as f:
            for lr, loss in zip(curve["lr"], curve["loss"]):
                f.write(json.dumps({"lr": lr, "loss": loss}) + "\n")
        print(f"[cvm_tpu] wrote {len(curve['lr'])} sweep points to "
              f"{args.curve_out}", file=sys.stderr, flush=True)
    print(json.dumps(res), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
