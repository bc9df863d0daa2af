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


# Synthetic class → KITTI object type + real-world dims [h, w, l] (meters).
_KITTI_TYPES = ("Car", "Pedestrian", "Cyclist")
_KITTI_DIMS = ((1.5, 1.7, 4.0), (1.8, 0.6, 0.8), (1.6, 0.6, 1.8))


def _p2_line(hw) -> str:
    """Synthetic pinhole P2 row-major 3x4 (fx=fy=0.9W, principal centered) —
    the same convention synthetic_batch uses for its intrinsics."""
    H, W = hw
    fx = fy = 0.9 * W
    cx, cy = W / 2.0, H / 2.0
    vals = [fx, 0.0, cx, 0.0, 0.0, fy, cy, 0.0, 0.0, 0.0, 1.0, 0.0]
    return "P2: " + " ".join(f"{v:.6e}" for v in vals)


def _label_lines(s, hw) -> list:
    """KITTI label_2 lines with 3D geometry CONSISTENT with the painted 2D
    boxes under the calib P2 (z from pinhole similar triangles, loc at the
    box's bottom-center ray), so monocular 3D heads are learnable and the
    decoded centers can be gated against these labels."""
    H, W = hw
    fx = fy = 0.9 * W
    cx, cy = W / 2.0, H / 2.0
    lines = []
    n = int(s["num_objects"])
    for k in range(n):
        x0, y0, x1, y1 = (float(v) for v in s["boxes"][k])
        c = int(s["classes"][k]) % 3
        dh, dw, dl = _KITTI_DIMS[c]
        z = fy * dh / max(y1 - y0, 1.0)
        u, vb = (x0 + x1) / 2.0, y1  # loc = bottom-center of the 3D box
        x3 = (u - cx) * z / fx
        y3 = (vb - cy) * z / fy
        rot_y = float((k * 1.1) % 3.14 - 1.57)
        lines.append(
            f"{_KITTI_TYPES[c]} 0.00 0 0.00 "
            f"{x0:.2f} {y0:.2f} {x1:.2f} {y1:.2f} "
            f"{dh:.2f} {dw:.2f} {dl:.2f} "
            f"{x3:.2f} {y3:.2f} {z:.2f} {rot_y:.2f}"
        )
    return lines


def gen_kitti_object(out: str, images: int, hw, num_classes: int, seed: int):
    """KITTI object layout: training/{image_2, label_2, calib} with 3D."""
    from PIL import Image

    rng = np.random.default_rng(seed)
    dirs = {d: os.path.join(out, "training", d)
            for d in ("image_2", "label_2", "calib")}
    for d in dirs.values():
        os.makedirs(d, exist_ok=True)
    for i in range(images):
        s = _scene(rng, hw, num_classes)
        fid = f"{i:06d}"
        Image.fromarray(s["image"]).save(os.path.join(dirs["image_2"], f"{fid}.png"))
        with open(os.path.join(dirs["label_2"], f"{fid}.txt"), "w") as f:
            f.write("\n".join(_label_lines(s, hw)) + "\n")
        with open(os.path.join(dirs["calib"], f"{fid}.txt"), "w") as f:
            f.write(_p2_line(hw) + "\n")
    return {"images": images}


def gen_kitti_depth(out: str, images: int, hw, num_classes: int, seed: int):
    """KITTI depth layout: images/ + proj_depth uint16 PNGs (depth*256),
    matched by relative filename (what pack_kitti_depth pairs on)."""
    from PIL import Image

    rng = np.random.default_rng(seed)
    img_dir = os.path.join(out, "images")
    dep_dir = os.path.join(out, "proj_depth")
    os.makedirs(img_dir, exist_ok=True)
    os.makedirs(dep_dir, exist_ok=True)
    for i in range(images):
        s = _scene(rng, hw, num_classes)
        name = f"{i:010d}.png"
        Image.fromarray(s["image"]).save(os.path.join(img_dir, name))
        d16 = np.clip(s["depth"] * 256.0, 0, 65535).astype(np.uint16)
        Image.fromarray(d16).save(os.path.join(dep_dir, name))
    return {"images": images}


def gen_kitti_multitask(out: str, images: int, hw, num_classes: int, seed: int):
    """Fused KITTI export: training/{image_2, label_2, calib, semantic,
    proj_depth} — every modality rendered from ONE scene so the joint heads
    have consistent supervision (BASELINE config D's multitask workload)."""
    from PIL import Image

    rng = np.random.default_rng(seed)
    dirs = {d: os.path.join(out, "training", d)
            for d in ("image_2", "label_2", "calib", "semantic", "proj_depth")}
    for d in dirs.values():
        os.makedirs(d, exist_ok=True)
    for i in range(images):
        s = _scene(rng, hw, num_classes)
        fid = f"{i:06d}"
        Image.fromarray(s["image"]).save(os.path.join(dirs["image_2"], f"{fid}.png"))
        with open(os.path.join(dirs["label_2"], f"{fid}.txt"), "w") as f:
            f.write("\n".join(_label_lines(s, hw)) + "\n")
        with open(os.path.join(dirs["calib"], f"{fid}.txt"), "w") as f:
            f.write(_p2_line(hw) + "\n")
        sem = np.full(hw, 7, np.uint8)  # background = road
        for k in range(int(s["num_objects"])):
            x0, y0, x1, y1 = (int(v) for v in s["boxes"][k])
            sem[y0:y1, x0:x1] = _CITYSCAPES_IDS[int(s["classes"][k]) % 3]
        Image.fromarray(sem).save(os.path.join(dirs["semantic"], f"{fid}.png"))
        d16 = np.clip(s["depth"] * 256.0, 0, 65535).astype(np.uint16)
        Image.fromarray(d16).save(os.path.join(dirs["proj_depth"], f"{fid}.png"))
    return {"images": images}


def gen_kitti_raw(out: str, images: int, hw, num_classes: int, seed: int,
                  frames_per_drive: int = 24):
    """KITTI raw layout: <date>/<drive>_sync/image_02/data/*.png sequences +
    <date>/calib_cam_to_cam.txt, plus GT depth (<drive>_sync/proj_depth/
    data/*.png, uint16 depth*256 — the KITTI convention).

    Motion is PARALLAX-CONSISTENT with the emitted depth: the camera
    translates laterally by tx m/frame, so each background row (at its
    ground-plane-like depth z_row, far at the top, near at the bottom) shifts
    by fx*tx/z_row px and each billboard object (at its own z_k) shifts by
    fx*tx/z_k px. Two-frame photometric losses therefore have real
    depth-from-motion signal to explain, and the stored depth is the map a
    correct DMDS solution must recover (up to global scale — the e2e gate
    evaluates median-scaled delta1, VERDICT r3 #8)."""
    from PIL import Image

    H, W = hw
    rng = np.random.default_rng(seed)
    date = "2011_09_26"
    n_drives = max(1, images // frames_per_drive)
    os.makedirs(os.path.join(out, date), exist_ok=True)
    fx = fy = 0.9 * W
    with open(os.path.join(out, date, "calib_cam_to_cam.txt"), "w") as f:
        vals = [fx, 0.0, W / 2.0, 0.0, 0.0, fy, H / 2.0, 0.0,
                0.0, 0.0, 1.0, 0.0]
        f.write("P_rect_02: " + " ".join(f"{v:.6e}" for v in vals) + "\n")
    # Road-like background depth: far rows up top, near rows at the bottom.
    z_rows = np.linspace(40.0, 6.0, H).astype(np.float64)
    total = 0
    for d in range(n_drives):
        sdir = os.path.join(out, date, f"{date}_drive_{d:04d}_sync")
        ddir = os.path.join(sdir, "image_02", "data")
        gdir = os.path.join(sdir, "proj_depth", "data")
        os.makedirs(ddir, exist_ok=True)
        os.makedirs(gdir, exist_ok=True)
        # Persistent scene state for the drive.
        bg = rng.integers(60, 200, (H, W, 3)).astype(np.uint8)
        n_obj = int(rng.integers(2, 5))
        pos = rng.uniform([0, 0], [W * 0.7, H * 0.7], (n_obj, 2))
        size = rng.uniform([W // 8, H // 8], [W // 3, H // 3], (n_obj, 2))
        z_obj = rng.uniform(5.0, 25.0, n_obj)
        cols = rng.integers(0, num_classes, n_obj)
        tx = float(rng.uniform(0.15, 0.45) * rng.choice([-1.0, 1.0]))  # m/frame
        xs = np.arange(W)
        for t in range(frames_per_drive):
            # Per-row parallax: roll each background row by fx*tx*t/z_row.
            shifts = np.round(fx * tx * t / z_rows).astype(np.int64)
            img = bg[np.arange(H)[:, None], (xs[None, :] - shifts[:, None]) % W]
            dep = np.tile(z_rows[:, None], (1, W))
            for k in range(n_obj):
                x0 = int(np.clip(pos[k, 0] + fx * tx * t / z_obj[k], 0,
                                 W - size[k, 0]))
                y0 = int(np.clip(pos[k, 1], 0, H - size[k, 1]))
                from cvm_tpu.data.synthetic import _CLASS_COLORS

                bh, bw = int(size[k, 1]), int(size[k, 0])
                img[y0:y0 + bh, x0:x0 + bw] = _CLASS_COLORS[int(cols[k])]
                dep[y0:y0 + bh, x0:x0 + bw] = z_obj[k]
            Image.fromarray(img).save(os.path.join(ddir, f"{t:010d}.png"))
            d16 = np.clip(np.round(dep * 256.0), 0, 65535).astype(np.uint16)
            Image.fromarray(d16).save(os.path.join(gdir, f"{t:010d}.png"))
            total += 1
    return {"images": total, "drives": n_drives}


_FORMATS = {
    "coco": gen_coco,
    "kitti_semseg": gen_kitti_semseg,
    "kitti_object": gen_kitti_object,
    "kitti_depth": gen_kitti_depth,
    "kitti_multitask": gen_kitti_multitask,
    "kitti_raw": gen_kitti_raw,
}


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--format", required=True, choices=sorted(_FORMATS))
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
        stats = _FORMATS[args.format](args.out, args.images, hw, args.classes, args.seed)
    print(json.dumps(stats))
    return 0


if __name__ == "__main__":
    sys.exit(main())
