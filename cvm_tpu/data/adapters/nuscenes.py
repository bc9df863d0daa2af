"""nuScenes (full, 3D) camera detection → `.cvrec`.

Reference: data/nuscenes upload script (SURVEY.md §2 "Dataset uploaders" —
the nuScenes/nuImages row; round-1 shipped only the 2D nuImages half,
VERDICT r1 missing #3). Works from the raw JSON tables with plain json —
no nuscenes-devkit:

  sample_data.json        key-frame camera images (+pose/sensor tokens)
  ego_pose.json           global ego pose per timestamp (t, quaternion)
  calibrated_sensor.json  camera extrinsics + 3x3 intrinsics
  sample_annotation.json  3D boxes in GLOBAL coords (center, [w,l,h], quat)
  instance.json           annotation → category
  category.json           category names

Each global box is transformed global → ego → camera (x right, y down,
z forward — the KITTI-compatible frame the 3D CenterNet head consumes,
ops/decode.py:decode_centernet_3d), its KITTI-style rot_y derived from the
box's forward axis in camera frame, and its 2D box obtained by projecting
the 8 corners through the intrinsics (clipped to the image). Records carry
boxes/classes/loc3d/dims3d([h,w,l])/rot_y/intrinsics([fx,fy,cx,cy]).
"""

from __future__ import annotations

import json
import os
from typing import Dict, List, Optional

import numpy as np

from cvm_tpu.data.adapters.common import read_image_as_jpeg
from cvm_tpu.data.adapters.nuimages import NUSCENES_CLASSES, _category_to_class
from cvm_tpu.data.records import RecordWriter


def _quat_to_rot(q) -> np.ndarray:
    """nuScenes [w, x, y, z] quaternion → 3x3 rotation matrix."""
    w, x, y, z = (float(v) for v in q)
    return np.array([
        [1 - 2 * (y * y + z * z), 2 * (x * y - z * w), 2 * (x * z + y * w)],
        [2 * (x * y + z * w), 1 - 2 * (x * x + z * z), 2 * (y * z - x * w)],
        [2 * (x * z - y * w), 2 * (y * z + x * w), 1 - 2 * (x * x + y * y)],
    ])


def _load_table(tdir: str, name: str) -> list:
    with open(os.path.join(tdir, f"{name}.json")) as f:
        return json.load(f)


def _box_to_camera(ann: dict, R_e: np.ndarray, t_e: np.ndarray,
                   R_c: np.ndarray, t_c: np.ndarray):
    """Global annotation → (center_cam, R_box_cam, dims [h,w,l], rot_y)."""
    c_g = np.asarray(ann["translation"], np.float64)
    R_b = _quat_to_rot(ann["rotation"])
    c_e = R_e.T @ (c_g - t_e)
    c_c = R_c.T @ (c_e - t_c)
    R_bc = R_c.T @ R_e.T @ R_b
    # KITTI rot_y: object forward (box x-axis) = [cos ry, 0, -sin ry] in cam.
    f = R_bc[:, 0]
    rot_y = float(np.arctan2(-f[2], f[0]))
    w, l, h = (float(v) for v in ann["size"])  # nuScenes size order
    return c_c, R_bc, (h, w, l), rot_y


def _project_box(c_c, R_bc, dims, K, img_wh):
    """8 projected corners → clipped 2D xyxy box, or None if not visible."""
    h, w, l = dims
    # Box-frame corners: x forward (l), y left (w), z up (h).
    xs, ys, zs = l / 2, w / 2, h / 2
    corners = np.array([[sx * xs, sy * ys, sz * zs]
                        for sx in (-1, 1) for sy in (-1, 1) for sz in (-1, 1)]).T
    pts = R_bc @ corners + c_c[:, None]  # (3, 8) camera frame
    in_front = pts[2] > 0.1
    if c_c[2] < 1.0 or not in_front.any():
        return None
    pts = pts[:, in_front]
    uv = (K[:2, :2] @ (pts[:2] / pts[2]) + K[:2, 2:3])
    W, H = img_wh
    x0, y0 = uv.min(axis=1)
    x1, y1 = uv.max(axis=1)
    x0, x1 = np.clip([x0, x1], 0, W - 1)
    y0, y1 = np.clip([y0, y1], 0, H - 1)
    if x1 - x0 < 2 or y1 - y0 < 2:
        return None
    return [float(x0), float(y0), float(x1), float(y1)]


def pack_nuscenes(
    src_dir: str,
    out_path: str,
    version: str = "v1.0-trainval",
    max_images: Optional[int] = None,
    cameras: tuple = ("CAM_FRONT",),
) -> Dict[str, int]:
    """src_dir: nuScenes root containing <version>/*.json and samples/."""
    tdir = os.path.join(src_dir, version)
    sample_data = _load_table(tdir, "sample_data")
    ego_pose = {e["token"]: e for e in _load_table(tdir, "ego_pose")}
    calib = {c["token"]: c for c in _load_table(tdir, "calibrated_sensor")}
    cat_by_token = {c["token"]: c["name"] for c in _load_table(tdir, "category")}
    inst_to_cat = {i["token"]: i["category_token"]
                   for i in _load_table(tdir, "instance")}
    anns_by_sample: Dict[str, List[dict]] = {}
    for a in _load_table(tdir, "sample_annotation"):
        anns_by_sample.setdefault(a["sample_token"], []).append(a)

    n = n_skipped = 0
    with RecordWriter(out_path) as w:
        for sd in sample_data:
            if max_images is not None and n >= max_images:
                break
            if not sd.get("is_key_frame", False):
                continue
            if not any(cam in sd.get("filename", "") for cam in cameras):
                continue
            path = os.path.join(src_dir, sd["filename"])
            if not os.path.exists(path):
                n_skipped += 1
                continue
            cs = calib[sd["calibrated_sensor_token"]]
            K = np.asarray(cs["camera_intrinsic"], np.float64)
            if K.shape != (3, 3):  # not a camera
                continue
            ep = ego_pose[sd["ego_pose_token"]]
            R_e, t_e = _quat_to_rot(ep["rotation"]), np.asarray(ep["translation"])
            R_c, t_c = _quat_to_rot(cs["rotation"]), np.asarray(cs["translation"])

            jpeg, hgt, wid = read_image_as_jpeg(path)
            boxes, classes, loc3d, dims3d, rot_y = [], [], [], [], []
            for ann in anns_by_sample.get(sd["sample_token"], []):
                name = cat_by_token.get(inst_to_cat.get(ann["instance_token"], ""), "")
                cid = _category_to_class(name)
                if cid is None:
                    continue
                c_c, R_bc, dims, ry = _box_to_camera(ann, R_e, t_e, R_c, t_c)
                box2d = _project_box(c_c, R_bc, dims, K, (wid, hgt))
                if box2d is None:
                    continue
                boxes.append(box2d)
                classes.append(cid)
                loc3d.append([float(v) for v in c_c])
                dims3d.append(list(dims))
                rot_y.append(ry)
            meta = {
                "id": sd["filename"],
                "height": hgt,
                "width": wid,
                "boxes": boxes,
                "classes": classes,
                "intrinsics": [float(K[0, 0]), float(K[1, 1]),
                               float(K[0, 2]), float(K[1, 2])],
            }
            if boxes:
                meta["loc3d"] = loc3d
                meta["dims3d"] = dims3d
                meta["rot_y"] = rot_y
            w.write(meta, {"jpeg": jpeg})
            n += 1
    with open(out_path + ".meta.json", "w") as f:
        json.dump({"classes": list(NUSCENES_CLASSES), "num_records": n}, f)
    return {"written": n, "skipped": n_skipped, "num_classes": len(NUSCENES_CLASSES)}
