#!/usr/bin/env python
"""Generate realistic-FORMAT dataset trees (COCO json / KITTI layout) from
synthetic learnable scenes, so the full product loop — cli.pack → cli.train
→ cli.export → ServingModel — can run end-to-end where no real dataset
exists (VERDICT r1 item 4; the reference's upload scripts assume datasets
on disk, SURVEY.md §3.3).

The trees are indistinguishable in format from real exports: COCO gets
<split>/ JPEGs + annotations/instances_<split>.json (xywh boxes, category
ids, iscrowd); KITTI-semseg gets training/{image_2,semantic} PNG pairs with
Cityscapes label ids.

Usage:
  python scripts/gen_dataset.py --format coco --out /tmp/coco --images 96
  python scripts/gen_dataset.py --format kitti_semseg --out /tmp/ks --images 64
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Synthetic class → Cityscapes label id (what KITTI semantics PNGs carry).
_CITYSCAPES_IDS = (26, 24, 33)  # car, person, bicycle
_COCO_NAMES = ("car", "person", "bicycle")


def _scene(rng, hw, num_classes):
    from cvm_tpu.data.synthetic import synthetic_sample

    return synthetic_sample(rng, hw, num_classes=num_classes, max_objects=6)


def gen_coco(out: str, images: int, hw, num_classes: int, seed: int, split: str):
    from PIL import Image

    rng = np.random.default_rng(seed)
    img_dir = os.path.join(out, split)
    os.makedirs(img_dir, exist_ok=True)
    os.makedirs(os.path.join(out, "annotations"), exist_ok=True)

    imgs, anns = [], []
    ann_id = 1
    for i in range(images):
        h = int(rng.integers(int(hw[0] * 0.75), hw[0] + 1))
        w = int(rng.integers(int(hw[1] * 0.75), hw[1] + 1))
        s = _scene(rng, (h, w), num_classes)
        name = f"{i:06d}.jpg"
        Image.fromarray(s["image"]).save(
            os.path.join(img_dir, name), format="JPEG", quality=92
        )
        imgs.append({"id": i, "file_name": name, "height": h, "width": w})
        n = int(s["num_objects"])
        for k in range(n):
            x0, y0, x1, y1 = (float(v) for v in s["boxes"][k])
            anns.append({
                "id": ann_id,
                "image_id": i,
                "category_id": int(s["classes"][k]) + 1,
                "bbox": [x0, y0, x1 - x0, y1 - y0],
                "area": (x1 - x0) * (y1 - y0),
                "iscrowd": 0,
            })
            ann_id += 1
    cats = [{"id": c + 1, "name": _COCO_NAMES[c % len(_COCO_NAMES)]}
            for c in range(num_classes)]
    with open(os.path.join(out, "annotations", f"instances_{split}.json"), "w") as f:
        json.dump({"images": imgs, "annotations": anns, "categories": cats}, f)
    return {"images": images, "annotations": len(anns), "classes": num_classes}


def gen_kitti_semseg(out: str, images: int, hw, num_classes: int, seed: int):
    from PIL import Image

    rng = np.random.default_rng(seed)
    img_dir = os.path.join(out, "training", "image_2")
    sem_dir = os.path.join(out, "training", "semantic")
    os.makedirs(img_dir, exist_ok=True)
    os.makedirs(sem_dir, exist_ok=True)
    for i in range(images):
        s = _scene(rng, hw, num_classes)
        # Semantic PNG in Cityscapes label-id space: background = road (7),
        # each object rectangle = its class's vehicle/person/bike id —
        # painted in box order, matching the image's paint order.
        sem = np.full(hw, 7, np.uint8)
        n = int(s["num_objects"])
        for k in range(n):
            x0, y0, x1, y1 = (int(v) for v in s["boxes"][k])
            sem[y0:y1, x0:x1] = _CITYSCAPES_IDS[int(s["classes"][k]) % 3]
        Image.fromarray(s["image"]).save(os.path.join(img_dir, f"{i:06d}.png"))
        Image.fromarray(sem).save(os.path.join(sem_dir, f"{i:06d}.png"))
    return {"images": images}


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--format", required=True, choices=["coco", "kitti_semseg"])
    ap.add_argument("--out", required=True)
    ap.add_argument("--images", type=int, default=96)
    ap.add_argument("--hw", default="96,96", help="scene size H,W")
    ap.add_argument("--classes", type=int, default=3)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--split", default="val2017")
    args = ap.parse_args()
    hw = tuple(int(x) for x in args.hw.split(","))
    if args.format == "coco":
        stats = gen_coco(args.out, args.images, hw, args.classes, args.seed, args.split)
    else:
        stats = gen_kitti_semseg(args.out, args.images, hw, args.classes, args.seed)
    print(json.dumps(stats))
    return 0


if __name__ == "__main__":
    sys.exit(main())
