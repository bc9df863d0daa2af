"""Video inference: stream a clip through a trained model, write an
annotated video + per-frame JSONL.

The reference's inference scripts draw OpenCV overlays on driving clips
frame-by-frame on the host (SURVEY.md §3.2); here frames batch through the
ONE jitted program (`infer/pipeline.py`) — preprocess, forward, decode all
on device — and the host only decodes/encodes video and draws. DMDS is
served on its natural input: consecutive frame pairs (t, t+1) from the
clip itself, producing per-frame depth + ego-motion.

  python -m cvm_tpu.cli.video --model centernet --checkpoint_dir runs/cn \
      --video drive.mp4 --out annotated.mp4 --jsonl dets.jsonl
"""

from __future__ import annotations

import argparse
import json
import sys
from typing import Any, Callable, Dict, Iterator, List, Optional, Tuple

import numpy as np


def _require_cv2():
    try:
        import cv2  # noqa: F401

        return cv2
    except ImportError:  # pragma: no cover - present in this environment
        raise SystemExit(
            "cli.video needs OpenCV for video decode/encode "
            "(pip install opencv-python); single images run via cli.infer"
        )


def read_frames(path: str, stride: int = 1,
                max_frames: Optional[int] = None,
                resize_long: Optional[int] = None,
                pairs: bool = False,
                ) -> Tuple[float, Iterator[Tuple[int, np.ndarray, ...]]]:
    """(fps, iterator of (frame_index, rgb_frame[, rgb_frame_next])).

    `pairs` yields consecutive-frame tuples for two-frame models: the pair
    is (t, t+stride) so the motion baseline matches the sampling stride.
    """
    cv2 = _require_cv2()
    cap = cv2.VideoCapture(path)
    if not cap.isOpened():
        raise SystemExit(f"cannot open video {path!r}")
    fps = cap.get(cv2.CAP_PROP_FPS) or 30.0

    def _prep(bgr: np.ndarray) -> np.ndarray:
        rgb = bgr[..., ::-1]
        if resize_long and max(rgb.shape[:2]) > resize_long:
            h, w = rgb.shape[:2]
            s = resize_long / max(h, w)
            rgb = cv2.resize(rgb, (max(int(round(w * s)), 1),
                                   max(int(round(h * s)), 1)),
                             interpolation=cv2.INTER_AREA)
        return np.ascontiguousarray(rgb, dtype=np.uint8)

    def gen():
        emitted = 0
        idx = -1
        prev: Optional[Tuple[int, np.ndarray]] = None
        try:
            while True:
                ok, bgr = cap.read()
                if not ok:
                    break
                idx += 1
                if idx % stride:
                    continue
                if max_frames is not None and emitted >= max_frames:
                    break
                frame = _prep(bgr)
                if not pairs:
                    emitted += 1
                    yield idx, frame
                    continue
                if prev is not None:
                    emitted += 1
                    yield prev[0], prev[1], frame
                prev = (idx, frame)
        finally:
            cap.release()

    return float(fps), gen()


def _pad_batch(frames: List[np.ndarray], pad_hw: Tuple[int, int]
               ) -> Tuple[np.ndarray, np.ndarray]:
    """Stack frames into the static (B, Hm, Wm, 3) canvas + valid sizes."""
    B = len(frames)
    img = np.zeros((B, *pad_hw, 3), np.uint8)
    hw = np.zeros((B, 2), np.int32)
    for i, f in enumerate(frames):
        h, w = f.shape[:2]
        img[i, :h, :w] = f
        hw[i] = (h, w)
    return img, hw


def run_video(
    predict: Callable[[Dict[str, Any]], Dict[str, Any]],
    frames: Iterator[Tuple],
    batch_size: int,
    pad_hw: Tuple[int, int],
    fps: float,
    out_path: Optional[str],
    jsonl_path: Optional[str],
    score_threshold: float = 0.3,
    two_frame: bool = False,
    class_names=None,
) -> int:
    """Core loop: batch frames → predict → draw + JSONL. Returns frames
    processed. `predict` is any batch→outputs callable (InferencePipeline
    or a test stub) taking {"image","image_hw"[,"image_t1"]}."""
    from cvm_tpu.infer.server import result_record
    from cvm_tpu.infer.visualize import render_sample

    writer = None
    jsonl = open(jsonl_path, "w") if jsonl_path else None
    n_out = 0
    try:
        pending: List[Tuple] = []

        def flush():
            nonlocal writer, n_out
            if not pending:
                return
            from cvm_tpu.utils.batch import pad_rows

            imgs, hw = _pad_batch([p[1] for p in pending], pad_hw)
            # Static batch shape: pad short final chunks by repeating rows.
            batch = dict(zip(("image", "image_hw"),
                             pad_rows((imgs, hw), batch_size)))
            if two_frame:
                t1, _ = _pad_batch([p[2] for p in pending], pad_hw)
                (batch["image_t1"],) = pad_rows((t1,), batch_size)
            out = {k: np.asarray(v) for k, v in predict(batch).items()}
            for i, item in enumerate(pending):
                rec = result_record(out, i, score_threshold)
                rec["frame"] = int(item[0])
                if "rotation" in out:  # dmds ego-motion (t → t+stride)
                    rec["rotation"] = np.round(out["rotation"][i], 5).tolist()
                    rec["translation"] = np.round(
                        out["translation"][i], 5).tolist()
                if jsonl:
                    jsonl.write(json.dumps(rec) + "\n")
                if out_path:
                    vis = {k: v[i] for k, v in out.items()
                           if k not in ("rotation", "translation")}
                    rendered = render_sample(
                        None, imgs[i], hw[i], vis, score_threshold,
                        class_names=class_names)
                    if writer is None:
                        cv2 = _require_cv2()
                        h, w = rendered.shape[:2]
                        writer = cv2.VideoWriter(
                            out_path, cv2.VideoWriter_fourcc(*"mp4v"),
                            fps, (w, h))
                        if not writer.isOpened():
                            raise SystemExit(
                                f"cannot open video writer for {out_path!r}")
                    writer.write(np.ascontiguousarray(rendered[..., ::-1]))
                n_out += 1
            pending.clear()

        for item in frames:
            pending.append(item)
            if len(pending) == batch_size:
                flush()
        flush()
    finally:
        if writer is not None:
            writer.release()
        if jsonl:
            jsonl.close()
    return n_out


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--model", default=None,
                        help="zoo model name (with --checkpoint_dir)")
    parser.add_argument("--checkpoint_dir", default=None)
    parser.add_argument("--artifact", default=None,
                        help="run an EXPORTED artifact dir instead of a "
                             "checkpoint (rgb artifacts; the deployment-side "
                             "visual check)")
    parser.add_argument("--video", required=True, help="input video file")
    parser.add_argument("--out", default=None, help="annotated output video")
    parser.add_argument("--jsonl", default=None,
                        help="per-frame prediction records")
    parser.add_argument("--batch_size", type=int, default=8)
    parser.add_argument("--stride", type=int, default=1,
                        help="process every Nth frame")
    parser.add_argument("--max_frames", type=int, default=None)
    parser.add_argument("--resize_long", type=int, default=None,
                        help="host-downscale so the long side is <= N px "
                             "before the device letterbox (cuts transfer)")
    parser.add_argument("--score_threshold", type=float, default=0.3)
    parser.add_argument("--tta", default="none", choices=("none", "hflip"))
    args = parser.parse_args(argv)
    if not (args.out or args.jsonl):
        parser.error("need --out and/or --jsonl")
    if args.stride < 1:
        parser.error("--stride must be >= 1")
    if bool(args.artifact) == bool(args.checkpoint_dir):
        parser.error("need exactly one of --checkpoint_dir (with --model) "
                     "or --artifact")
    if args.checkpoint_dir and not args.model:
        parser.error("--checkpoint_dir requires --model")

    from cvm_tpu.utils.platform import apply_platform_env

    apply_platform_env()

    batch_size = args.batch_size
    if args.artifact:
        from cvm_tpu.infer.runtime import ServingModel

        model = ServingModel(args.artifact)
        meta = model.meta
        if model.input_format != "rgb":
            parser.error("video serves rgb artifacts (export without "
                         "--input_format yuv420 for clips)")
        if args.tta != "none":
            parser.error("--tta is baked at export time for artifacts")
        two_frame = meta.get("model") == "dmds"
        batch_size = int(meta.get("batch_size", 1))
        art_hw = tuple(meta.get("pad_hw", (0, 0)))

        def predict(batch):
            # Clamp each frame onto the artifact's static canvas, then hand
            # off to ServingModel.predict_batch — the one consumer-side home
            # of the trace-signature contract (argument order, with_3d
            # intrinsics defaulting, partial-batch padding, output trim).
            h = np.minimum(batch["image_hw"], np.asarray(art_hw, np.int32))
            imgs = np.zeros((batch["image"].shape[0], *art_hw, 3), np.uint8)
            for i in range(imgs.shape[0]):
                imgs[i, :h[i, 0], :h[i, 1]] = \
                    batch["image"][i, :h[i, 0], :h[i, 1]]
            d = {"image": imgs, "image_hw": h}
            if two_frame:
                t1 = np.zeros_like(imgs)
                for i in range(imgs.shape[0]):
                    t1[i, :h[i, 0], :h[i, 1]] = \
                        batch["image_t1"][i, :h[i, 0], :h[i, 1]]
                d["image_t1"] = t1
            return model.predict_batch(d)

        cfg = None
    else:
        from cvm_tpu.infer.pipeline import InferencePipeline
        from cvm_tpu.models import get_model
        from cvm_tpu.train.checkpoints import load_params_cfg
        from cvm_tpu.train.loop import Trainer

        spec = get_model(args.model)
        cfg = load_params_cfg(args.checkpoint_dir, spec.params_cls)
        two_frame = spec.name == "dmds"

    fps, frames = read_frames(args.video, args.stride, args.max_frames,
                              args.resize_long, pairs=two_frame)
    # One peek fixes the static host canvas (all frames share the clip's
    # geometry after the optional host downscale).
    first = next(frames, None)
    if first is None:
        raise SystemExit("video has no frames (two-frame models need >= 2)")
    pad_hw = tuple(first[1].shape[:2])

    if args.artifact:
        if pad_hw[0] > art_hw[0] or pad_hw[1] > art_hw[1]:
            parser.error(
                f"clip frames are {pad_hw} but the artifact's static canvas "
                f"is {art_hw} — use --resize_long {min(art_hw)} (or "
                f"re-export with a bigger pad_hw)")
    else:
        trainer = Trainer(spec, cfg, checkpoint_dir=args.checkpoint_dir)
        trainer.init_state()
        variables = {"params": trainer.eval_params,
                     "batch_stats": trainer.state.batch_stats}
        predict = InferencePipeline(spec, cfg, variables, mesh=trainer.mesh,
                                    tta=args.tta)

    import itertools

    n = run_video(
        predict, itertools.chain([first], frames), batch_size, pad_hw,
        fps / args.stride, args.out, args.jsonl, args.score_threshold,
        two_frame=two_frame,
        class_names=getattr(cfg, "class_names", None),
    )
    print(json.dumps({"frames": n, "fps_out": round(fps / args.stride, 3),
                      "out": args.out, "jsonl": args.jsonl}), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
