"""Dataset validation CLI (cli/validate.py)."""

import io
import json

import numpy as np
import pytest
from PIL import Image

from cvm_tpu.cli.validate import main, validate
from cvm_tpu.data.records import RecordWriter


def _jpeg(rng, hw=(40, 60)):
    buf = io.BytesIO()
    Image.fromarray(rng.integers(0, 255, (*hw, 3), np.uint8)).save(
        buf, format="JPEG")
    return buf.getvalue()


def _write_shard(path, records, class_names=None):
    with RecordWriter(str(path)) as w:
        for meta, blobs in records:
            w.write(meta, blobs)
    if class_names:
        with open(str(path) + ".meta.json", "w") as f:
            json.dump({"classes": class_names}, f)
    return str(path)


def test_validate_clean_shard_passes(tmp_path, rng):
    recs = []
    for i in range(4):
        recs.append((
            {"id": f"r{i}", "height": 40, "width": 60,
             "boxes": [[2.0, 3.0, 30.0, 35.0]], "classes": [1],
             "intrinsics": [100.0, 100.0, 30.0, 20.0]},
            {"jpeg": _jpeg(rng), "mask": np.ones((40, 60), np.uint8),
             "depth": np.full((40, 60), 5.0, np.float32)},
        ))
    p = _write_shard(tmp_path / "ok.cvrec", recs, ["bg", "car", "ped"])
    out = validate([p], sample_decode=2)
    assert out["errors"] == 0, out
    assert out["records"] == 4 and out["sample_decoded_ok"] == 2
    assert main(["--data", p]) == 0


def test_validate_catches_label_corruption(tmp_path, rng):
    recs = [
        # inverted box
        ({"id": "a", "height": 40, "width": 60,
          "boxes": [[30.0, 3.0, 2.0, 35.0]], "classes": [0]},
         {"jpeg": _jpeg(rng)}),
        # class id out of range + mismatched lengths
        ({"id": "b", "height": 40, "width": 60,
          "boxes": [[1.0, 1.0, 5.0, 5.0], [2.0, 2.0, 6.0, 6.0]],
          "classes": [7]},
         {"jpeg": _jpeg(rng)}),
        # mask with an invalid class id; negative depth; bad focal
        ({"id": "c", "height": 40, "width": 60, "boxes": [], "classes": [],
          "intrinsics": [-1.0, 100.0, 30.0, 20.0]},
         {"jpeg": _jpeg(rng),
          "mask": np.full((40, 60), 9, np.uint8),
          "depth": np.full((40, 60), -2.0, np.float32)}),
        # 3D length mismatch
        ({"id": "d", "height": 40, "width": 60,
          "boxes": [[1.0, 1.0, 5.0, 5.0]], "classes": [0],
          "dims3d": [[1.5, 1.6, 4.0], [1.5, 1.6, 4.0]],
          "loc3d": [[0.0, 1.0, 10.0]], "rot_y": [0.1]},
         {"jpeg": _jpeg(rng)}),
    ]
    p = _write_shard(tmp_path / "bad.cvrec", recs, ["bg", "car", "ped"])
    out = validate([p], sample_decode=0)
    msgs = "\n".join(out["error_samples"])
    assert out["errors"] >= 6, out
    assert "x2<=x1" in msgs
    assert "2 boxes but 1 classes" in msgs
    assert "class id 7" in msgs
    assert "mask ids [9]" in msgs
    assert "negative depth" in msgs
    assert "focal" in msgs
    assert "dims3d has 2 entries for 1 boxes" in msgs
    assert main(["--data", p, "--sample_decode", "0"]) == 1


def test_validate_catches_corrupt_image_bytes(tmp_path, rng):
    good = _jpeg(rng)
    recs = [
        ({"id": "t", "height": 40, "width": 60}, {"jpeg": b"not a jpeg"}),
        # truncated mid-stream: header parses, full decode fails
        ({"id": "u", "height": 40, "width": 60}, {"jpeg": good[: len(good) // 2]}),
        # meta size disagrees with the actual image
        ({"id": "v", "height": 99, "width": 60}, {"jpeg": good}),
    ]
    p = _write_shard(tmp_path / "img.cvrec", recs)
    out = validate([p], sample_decode=3)
    msgs = "\n".join(out["error_samples"])
    assert "does not parse as an image" in msgs
    assert "meta says 99x60" in msgs
    assert out["errors"] >= 2


def test_validate_two_frame_and_yuv_pairing(tmp_path, rng):
    recs = [
        ({"id": "p", "height": 40, "width": 60},
         {"jpeg_t1": _jpeg(rng)}),  # t1 without t
        ({"id": "q", "height": 8, "width": 8},
         {"y": np.zeros((8, 8), np.uint8),
          "u": np.zeros((4, 4), np.uint8)}),  # missing v plane
        ({"id": "r", "height": 8, "width": 8},
         {"y": np.zeros((8, 8), np.uint8),
          "u": np.zeros((4, 4), np.uint8),
          "v": np.zeros((2, 2), np.uint8)}),  # wrong v shape
    ]
    p = _write_shard(tmp_path / "pair.cvrec", recs)
    out = validate([p], sample_decode=0)
    msgs = "\n".join(out["error_samples"])
    assert "jpeg_t1 present without" in msgs
    assert "missing 'v' plane" in msgs
    assert "v plane (2, 2)" in msgs
