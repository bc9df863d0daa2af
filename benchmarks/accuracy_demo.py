"""Accuracy demos: train any zoo model from scratch on synthetic scenes (real
TPU) and evaluate end-to-end through the on-device decode + evaluators.

    PYTHONPATH=.:$PYTHONPATH python benchmarks/accuracy_demo.py --model centernet --steps 2000

Round-1 results on v5e-1 (held-out synthetic scenes):
    centernet  2000 steps / 408 s : mAP 0.681 / mAP50 0.915 / mAP75 0.703
    semseg     1200 steps / 414 s : mIoU 0.937, pixel acc 0.990
    depth      1200 steps / 320 s : abs_rel 0.21, delta1 0.77
    multitask  2000 steps / 751 s : mAP 0.692 / mIoU 0.931 / delta1 0.80
    dmds       1500 steps / 587 s : photometric 1.41 -> 0.79 (scale-free toy
                                    motion; geometry pinned by the pose test)

NOTE (2026-08-19): synthetic_batch scenes do not carry enough parallax signal
for DMDS to recover depth (delta1 ~0.1-0.2 even with depth-consistent motion)
— the photometric trend above is meaningful, the dmds depth metrics are not.
For a real DMDS delta1 use benchmarks/dmds_accuracy.py (KITTI-raw parallax
data, the e2e leg-5 recipe; delta1 0.56 after 250 CPU steps at 64 px).
"""

import argparse
import itertools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def make_params(name):
    from cvm_tpu.models import get_model

    spec = get_model("centernet" if name == "centernet3d" else name)
    common = dict(input_hw=(128, 128), backbone="tiny", batch_size=32,
                  learning_rate=1e-3, warmup_steps=100, total_steps=2000)
    per = {
        "centernet": dict(num_classes=3, max_objects=8, neck_features=32, head_features=16),
        "centernet3d": dict(num_classes=3, max_objects=8, neck_features=32,
                            head_features=16, with_3d=True,
                            aug_scale_range=(0.9, 1.1)),
        "semseg": dict(num_classes=3, decoder_features=16, class_weights=(1.0, 1.0, 1.0)),
        "depth": dict(decoder_features=16, num_scales=2),
        "multitask": dict(neck_features=32, head_features=16, num_det_classes=3,
                          num_seg_classes=3, class_weights=(1.0, 1.0, 1.0), max_objects=8),
        "dmds": dict(decoder_features=16, motion_features=32, batch_size=16,
                     learning_rate=2e-4),
    }
    kw = dict(common)
    kw.update(per[name])
    return spec, spec.params_cls(**kw)


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--model", default="centernet",
                        choices=["centernet", "centernet3d", "semseg", "depth",
                                 "multitask", "dmds"])
    parser.add_argument("--steps", type=int, default=2000)
    parser.add_argument("--pool", type=int, default=40, help="distinct train batches cycled")
    parser.add_argument("--metrics", default=None)
    parser.add_argument("--batch_size", type=int, default=None,
                        help="override the demo config's batch size")
    parser.add_argument("--input_hw", type=int, default=None,
                        help="override the square model input size (a CPU "
                             "probe at 64 is ~8x cheaper than the TPU demo's 128)")
    args = parser.parse_args(argv)

    from cvm_tpu.utils.platform import apply_platform_env

    apply_platform_env()  # honors CVM_PLATFORM=cpu; also sets the jit cache

    from cvm_tpu.data.synthetic import synthetic_batch
    from cvm_tpu.train.evaluate import evaluate_model
    from cvm_tpu.train.loop import Trainer

    spec, p = make_params(args.model)
    if args.batch_size:
        p = p.replace(batch_size=args.batch_size)
    if args.input_hw:
        p = p.replace(input_hw=(args.input_hw, args.input_hw))
    scene = max(p.input_hw[0] * 3 // 2, p.input_hw[0] + 32)
    two_frame = args.model == "dmds"
    with_3d = args.model == "centernet3d"
    trainer = Trainer(spec, p, metrics_path=args.metrics, log_every=100)
    rng = np.random.default_rng(0)
    pool = [
        synthetic_batch(rng, p.batch_size, (scene, scene), num_classes=3, max_objects=8,
                        two_frame=two_frame, with_3d=with_3d)
        for _ in range(args.pool)
    ]
    trainer.init_state()
    t0 = time.time()
    m = trainer.fit(itertools.cycle(pool), args.steps)
    print(f"{args.model}: {args.steps} steps in {time.time() - t0:.0f}s, "
          f"final {dict((k, round(v, 4)) for k, v in m.items())}", flush=True)

    variables = {"params": trainer.eval_params, "batch_stats": trainer.state.batch_stats}
    val = [
        synthetic_batch(np.random.default_rng(123), 16, (scene, scene), num_classes=3,
                        max_objects=8, two_frame=two_frame, with_3d=with_3d)
        for _ in range(8)
    ]
    ev = evaluate_model(spec, p, variables, val)
    print(f"{args.model} EVAL:", {k: round(v, 4) for k, v in ev.items()}, flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
