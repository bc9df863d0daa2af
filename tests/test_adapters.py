"""Adapter tests against synthetic miniature dataset trees."""

import json
import os

import numpy as np
import pytest
from PIL import Image

from cvm_tpu.data.adapters import pack_coco, pack_comma10k, pack_kitti_object, pack_nuimages
from cvm_tpu.data.adapters.kitti import KITTI_CLASSES
from cvm_tpu.data.records import RecordReader
from cvm_tpu.models.semseg.params import SEMSEG_PALETTE


def _save(path, arr):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    Image.fromarray(arr).save(path)


def test_pack_coco(tmp_path, rng):
    root = tmp_path / "coco"
    imgs = []
    for i in range(3):
        name = f"img{i}.jpg"
        _save(str(root / "val2017" / name), rng.integers(0, 255, (50, 70, 3), dtype=np.uint8))
        imgs.append({"id": i, "file_name": name, "height": 50, "width": 70})
    anns = [
        {"id": 1, "image_id": 0, "category_id": 7, "bbox": [10, 10, 20, 15], "iscrowd": 0},
        {"id": 2, "image_id": 0, "category_id": 3, "bbox": [5, 5, 8, 8], "iscrowd": 0},
        {"id": 3, "image_id": 1, "category_id": 3, "bbox": [0, 0, 1, 1], "iscrowd": 0},  # tiny → dropped
        {"id": 4, "image_id": 2, "category_id": 7, "bbox": [1, 2, 30, 30], "iscrowd": 1},  # crowd → dropped
    ]
    cats = [{"id": 3, "name": "car"}, {"id": 7, "name": "person"}]
    ann = {"images": imgs, "annotations": anns, "categories": cats}
    os.makedirs(root / "annotations")
    with open(root / "annotations" / "instances_val2017.json", "w") as f:
        json.dump(ann, f)

    out = str(tmp_path / "coco.cvrec")
    stats = pack_coco(str(root), out, split="val2017")
    assert stats == {"written": 3, "skipped": 0, "num_classes": 2}
    r = RecordReader(out)
    meta0, blobs0 = r.get(0)
    assert meta0["boxes"] == [[10, 10, 30, 25], [5, 5, 13, 13]]
    assert meta0["classes"] == [1, 0]  # contiguous remap sorted by id: 3→0, 7→1
    assert blobs0["jpeg"][:2] == b"\xff\xd8"
    meta2, _ = r.get(2)
    assert meta2["boxes"] == []  # crowd only
    with open(out + ".meta.json") as f:
        assert json.load(f)["classes"] == ["car", "person"]


def test_pack_kitti_object(tmp_path, rng):
    root = tmp_path / "kitti"
    for fid in ("000000", "000001"):
        _save(str(root / "training" / "image_2" / f"{fid}.png"),
              rng.integers(0, 255, (40, 120, 3), dtype=np.uint8))
        os.makedirs(root / "training" / "label_2", exist_ok=True)
        with open(root / "training" / "label_2" / f"{fid}.txt", "w") as f:
            f.write("Car 0.0 0 -1.5 10.0 5.0 50.0 35.0 1.5 1.6 3.8 2.0 1.5 20.0 -1.2\n")
            f.write("DontCare -1 -1 -10 0 0 10 10 -1 -1 -1 -1000 -1000 -1000 -10\n")
            f.write("Pedestrian 0.0 1 0.5 60.0 8.0 70.0 38.0 1.7 0.6 0.9 5.0 1.6 15.0 0.3\n")
        os.makedirs(root / "training" / "calib", exist_ok=True)
        with open(root / "training" / "calib" / f"{fid}.txt", "w") as f:
            f.write("P2: 700.0 0.0 600.0 40.0 0.0 700.0 180.0 1.0 0.0 0.0 1.0 0.003\n")

    out = str(tmp_path / "kitti.cvrec")
    stats = pack_kitti_object(str(root), out)
    assert stats["written"] == 2
    r = RecordReader(out)
    meta, blobs = r.get(0)
    assert meta["classes"] == [KITTI_CLASSES.index("Car"), KITTI_CLASSES.index("Pedestrian")]
    assert meta["boxes"][0] == [10.0, 5.0, 50.0, 35.0]
    assert meta["intrinsics"] == [700.0, 700.0, 600.0, 180.0]
    assert meta["dims3d"][0] == [1.5, 1.6, 3.8]
    assert meta["rot_y"] == [-1.2, 0.3]


def test_pack_kitti_semseg(tmp_path, rng):
    from cvm_tpu.data.adapters import pack_kitti_semseg

    root = tmp_path / "ksem"
    _save(str(root / "training" / "image_2" / "000000.png"),
          rng.integers(0, 255, (30, 90, 3), dtype=np.uint8))
    sem = np.zeros((30, 90), np.uint8)
    sem[:10] = 7    # road → train id 0
    sem[10:20] = 26  # car → train id 13
    sem[20:] = 4    # static → ignore (255)
    _save(str(root / "training" / "semantic" / "000000.png"), sem)

    out = str(tmp_path / "ks.cvrec")
    stats = pack_kitti_semseg(str(root), out)
    assert stats == {"written": 1, "num_classes": 19}
    _, blobs = RecordReader(out).get(0)
    m = blobs["mask"]
    assert (m[:10] == 0).all() and (m[10:20] == 13).all() and (m[20:] == 255).all()


def test_pack_comma10k(tmp_path, rng):
    root = tmp_path / "c10k"
    img = rng.integers(0, 255, (32, 48, 3), dtype=np.uint8)
    _save(str(root / "imgs" / "a.png"), img)
    mask_rgb = np.zeros((32, 48, 3), np.uint8)
    mask_rgb[:16] = SEMSEG_PALETTE[0]  # road
    mask_rgb[16:] = SEMSEG_PALETTE[3]  # movable
    _save(str(root / "masks" / "a.png"), mask_rgb)

    out = str(tmp_path / "c.cvrec")
    stats = pack_comma10k(str(root), out)
    assert stats["written"] == 1
    _, blobs = RecordReader(out).get(0)
    m = blobs["mask"]
    assert (m[:16] == 0).all() and (m[16:] == 3).all()


def test_pack_nuimages(tmp_path, rng):
    root = tmp_path / "nuim"
    v = root / "v1.0-train"
    os.makedirs(v)
    fname = "samples/CAM_FRONT/x.jpg"
    _save(str(root / fname), rng.integers(0, 255, (30, 40, 3), dtype=np.uint8))
    json.dump(
        [{"token": "sd1", "filename": fname, "is_key_frame": True},
         {"token": "sd2", "filename": "missing.jpg", "is_key_frame": True}],
        open(v / "sample_data.json", "w"))
    json.dump(
        [{"sample_data_token": "sd1", "category_token": "c1", "bbox": [1, 2, 20, 25]},
         {"sample_data_token": "sd1", "category_token": "c2", "bbox": [3, 3, 10, 10]}],
        open(v / "object_ann.json", "w"))
    json.dump(
        [{"token": "c1", "name": "vehicle.car"},
         {"token": "c2", "name": "animal"}],  # unmapped → dropped
        open(v / "category.json", "w"))

    out = str(tmp_path / "n.cvrec")
    stats = pack_nuimages(str(root), out)
    assert stats["written"] == 1 and stats["skipped"] == 1
    meta, _ = RecordReader(out).get(0)
    assert meta["classes"] == [0] and meta["boxes"] == [[1, 2, 20, 25]]


def test_pack_nuscenes_3d(tmp_path, rng):
    """Full nuScenes tables → camera-frame 3D targets with known geometry."""
    from cvm_tpu.data.adapters import pack_nuscenes

    root = tmp_path / "nusc"
    v = root / "v1.0-trainval"
    os.makedirs(v)
    fname = "samples/CAM_FRONT/f0.jpg"
    _save(str(root / fname), rng.integers(0, 255, (60, 100, 3), dtype=np.uint8))

    ident = [1.0, 0.0, 0.0, 0.0]
    json.dump([{"token": "sd1", "sample_token": "s1", "filename": fname,
                "is_key_frame": True, "ego_pose_token": "ep1",
                "calibrated_sensor_token": "cs1"},
               {"token": "sd2", "sample_token": "s1", "filename": "sweeps/CAM_FRONT/x.jpg",
                "is_key_frame": False, "ego_pose_token": "ep1",
                "calibrated_sensor_token": "cs1"}],
              open(v / "sample_data.json", "w"))
    # Ego 10m along global x, unrotated; camera at ego origin, rotated so the
    # optical axis (cam z) looks along global/ego x: R maps cam->ego with
    # columns (cam x->-ego y, cam y->-ego z, cam z->ego x); quaternion for
    # that matrix is 0.5*(1,-1,1,-1).
    json.dump([{"token": "ep1", "translation": [10.0, 0.0, 0.0],
                "rotation": ident}], open(v / "ego_pose.json", "w"))
    json.dump([{"token": "cs1", "translation": [0.0, 0.0, 0.0],
                "rotation": [0.5, -0.5, 0.5, -0.5],
                "camera_intrinsic": [[100.0, 0.0, 50.0],
                                     [0.0, 100.0, 30.0],
                                     [0.0, 0.0, 1.0]]}],
              open(v / "calibrated_sensor.json", "w"))
    # A car 20m ahead of the ego on global x, heading along global x
    # (same direction the camera looks): its box-forward in cam frame is
    # the optical axis -> rot_y = atan2(-1, 0) = -pi/2.
    json.dump([{"token": "a1", "sample_token": "s1", "instance_token": "i1",
                "translation": [30.0, 0.0, 0.0], "size": [2.0, 4.0, 1.5],
                "rotation": ident}],
              open(v / "sample_annotation.json", "w"))
    json.dump([{"token": "i1", "category_token": "c1"}],
              open(v / "instance.json", "w"))
    json.dump([{"token": "c1", "name": "vehicle.car"}],
              open(v / "category.json", "w"))

    out = str(tmp_path / "nusc.cvrec")
    stats = pack_nuscenes(str(root), out)
    assert stats["written"] == 1 and stats["num_classes"] == 10
    meta, blobs = RecordReader(out).get(0)
    assert meta["classes"] == [0]
    assert meta["intrinsics"] == [100.0, 100.0, 50.0, 30.0]
    # Camera frame: 20m straight ahead.
    np.testing.assert_allclose(meta["loc3d"][0], [0.0, 0.0, 20.0], atol=1e-9)
    assert meta["dims3d"][0] == [1.5, 2.0, 4.0]  # [h, w, l] from size [w, l, h]
    np.testing.assert_allclose(meta["rot_y"][0], -np.pi / 2, atol=1e-9)
    # 2D box centered on the principal point, half-extents f*(size/2)/z:
    # lateral = box y (w/2=1) and length x (l/2=2) -> widest corners at
    # z in [18, 22]; just sanity-check the span contains the center.
    x0, y0, x1, y1 = meta["boxes"][0]
    assert x0 < 50 < x1 and y0 < 30 < y1
    assert blobs["jpeg"][:2] == b"\xff\xd8"


def test_pack_nuscenes_drops_behind_camera(tmp_path, rng):
    from cvm_tpu.data.adapters import pack_nuscenes

    root = tmp_path / "nusc2"
    v = root / "v1.0-trainval"
    os.makedirs(v)
    fname = "samples/CAM_FRONT/f0.jpg"
    _save(str(root / fname), rng.integers(0, 255, (60, 100, 3), dtype=np.uint8))
    ident = [1.0, 0.0, 0.0, 0.0]
    json.dump([{"token": "sd1", "sample_token": "s1", "filename": fname,
                "is_key_frame": True, "ego_pose_token": "ep1",
                "calibrated_sensor_token": "cs1"}], open(v / "sample_data.json", "w"))
    json.dump([{"token": "ep1", "translation": [0, 0, 0], "rotation": ident}],
              open(v / "ego_pose.json", "w"))
    json.dump([{"token": "cs1", "translation": [0, 0, 0],
                "rotation": [0.5, -0.5, 0.5, -0.5],
                "camera_intrinsic": [[100.0, 0, 50.0], [0, 100.0, 30.0], [0, 0, 1.0]]}],
              open(v / "calibrated_sensor.json", "w"))
    # Behind the camera (global -x = cam -z).
    json.dump([{"token": "a1", "sample_token": "s1", "instance_token": "i1",
                "translation": [-15.0, 0.0, 0.0], "size": [2, 4, 1.5],
                "rotation": ident}], open(v / "sample_annotation.json", "w"))
    json.dump([{"token": "i1", "category_token": "c1"}], open(v / "instance.json", "w"))
    json.dump([{"token": "c1", "name": "vehicle.car"}], open(v / "category.json", "w"))

    out = str(tmp_path / "n2.cvrec")
    stats = pack_nuscenes(str(root), out)
    assert stats["written"] == 1
    meta, _ = RecordReader(out).get(0)
    assert meta["boxes"] == [] and "loc3d" not in meta


def test_pack_kitti_multitask(tmp_path, rng):
    from cvm_tpu.data.adapters import pack_kitti_multitask

    root = tmp_path / "kmt"
    for fid in ("000000", "000001"):
        _save(str(root / "training" / "image_2" / f"{fid}.png"),
              rng.integers(0, 255, (30, 90, 3), dtype=np.uint8))
        os.makedirs(root / "training" / "label_2", exist_ok=True)
        with open(root / "training" / "label_2" / f"{fid}.txt", "w") as f:
            f.write("Car 0.0 0 -1.5 10.0 5.0 50.0 25.0 1.5 1.6 3.8 2.0 1.5 20.0 -1.2\n")
        os.makedirs(root / "training" / "calib", exist_ok=True)
        with open(root / "training" / "calib" / f"{fid}.txt", "w") as f:
            f.write("P2: 700.0 0.0 600.0 0.0 0.0 700.0 180.0 0.0 0.0 0.0 1.0 0.0\n")
        sem = np.full((30, 90), 7, np.uint8)   # road -> train id 0
        sem[5:15, 10:50] = 26                  # car -> train id 13
        _save(str(root / "training" / "semantic" / f"{fid}.png"), sem)
        d16 = np.full((30, 90), 20 * 256, np.uint16)  # 20 m everywhere
        _save(str(root / "training" / "proj_depth" / f"{fid}.png"), d16)

    out = str(tmp_path / "kmt.cvrec")
    stats = pack_kitti_multitask(str(root), out)
    assert stats == {"written": 2}
    meta, blobs = RecordReader(out).get(0)
    # One record carries EVERY modality, mutually consistent.
    assert meta["classes"] == [KITTI_CLASSES.index("Car")]
    assert meta["boxes"] == [[10.0, 5.0, 50.0, 25.0]]
    assert meta["loc3d"] == [[2.0, 1.5, 20.0]]
    assert meta["intrinsics"] == [700.0, 700.0, 600.0, 180.0]
    m = blobs["mask"]
    assert m[0, 0] == 0 and m[10, 20] == 13
    assert blobs["depth"].dtype == np.uint16
    assert int(blobs["depth"][0, 0]) == 20 * 256


def test_pack_kitti_raw_two_frame_pairs(tmp_path, rng):
    from cvm_tpu.data.adapters import pack_kitti_raw

    root = tmp_path / "kraw"
    date = root / "2011_09_26"
    os.makedirs(date, exist_ok=True)
    with open(date / "calib_cam_to_cam.txt", "w") as f:
        f.write("P_rect_02: 700.0 0.0 600.0 0.0 0.0 700.0 180.0 0.0 "
                "0.0 0.0 1.0 0.0\n")
    frames = {}
    for drive in ("2011_09_26_drive_0001_sync", "2011_09_26_drive_0002_sync",
                  "2011_09_26_drive_0003_sync"):
        for t in range(3):
            img = rng.integers(0, 255, (24, 64, 3), dtype=np.uint8)
            frames[(drive, t)] = img
            _save(str(date / drive / "image_02" / "data" / f"{t:010d}.png"), img)
    # GT depth in BOTH recognized layouts: drive_0001 uses the official
    # depth-devkit annotations merged into the raw tree
    # (proj_depth/groundtruth/image_02 — review finding, round 4), drive_0003
    # uses gen_dataset.py's flat mirror (proj_depth/data). drive_0002 has no
    # depth and its records must stay depth-free.
    for drive, layout in (
        ("2011_09_26_drive_0001_sync", ("proj_depth", "groundtruth", "image_02")),
        ("2011_09_26_drive_0003_sync", ("proj_depth", "data")),
    ):
        gdir = date / drive
        for part in layout:
            gdir = gdir / part
        os.makedirs(gdir, exist_ok=True)
        for t in range(3):
            d16 = np.full((24, 64), 12 * 256, np.uint16)
            Image.fromarray(d16).save(str(gdir / f"{t:010d}.png"))

    out = str(tmp_path / "kraw.cvrec")
    stats = pack_kitti_raw(str(root), out)
    # 3 frames per drive -> 2 consecutive pairs per drive; never across drives.
    assert stats == {"written": 6, "drives": 3}
    r = RecordReader(out)
    ids = [r.get(i)[0]["id"] for i in range(6)]
    assert all("drive_0001" in i for i in ids[:2])
    assert all("drive_0002" in i for i in ids[2:4])
    assert all("drive_0003" in i for i in ids[4:])
    meta, blobs = r.get(0)
    assert "jpeg" in blobs and "jpeg_t1" in blobs
    assert meta["intrinsics"] == [700.0, 700.0, 600.0, 180.0]
    assert blobs["depth"].dtype == np.uint16  # devkit layout found
    assert int(blobs["depth"][5, 5]) == 12 * 256
    assert "depth" not in r.get(2)[1]  # drive_0002 has no proj_depth
    assert r.get(4)[1]["depth"].dtype == np.uint16  # mirror layout found
    # The pair really is (t, t+1): decode both jpegs and match the sources.
    import io

    a = np.asarray(Image.open(io.BytesIO(bytes(blobs["jpeg"]))))
    b = np.asarray(Image.open(io.BytesIO(bytes(blobs["jpeg_t1"]))))
    d0 = (frames[("2011_09_26_drive_0001_sync", 0)], frames[("2011_09_26_drive_0001_sync", 1)])
    # JPEG is lossy: compare against the intended source frames by proximity.
    assert np.abs(a.astype(int) - d0[0].astype(int)).mean() < \
        np.abs(a.astype(int) - d0[1].astype(int)).mean()
    assert np.abs(b.astype(int) - d0[1].astype(int)).mean() < \
        np.abs(b.astype(int) - d0[0].astype(int)).mean()
