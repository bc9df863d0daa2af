"""cli.inspect: GT visualization straight from .cvrec shards (no model).

Reference workflow analogue: visualize an uploaded Mongo sample to verify an
upload script (SURVEY.md §4 "tests that double as debugging scripts").
"""

import io
import json

import numpy as np
import pytest
from PIL import Image

from cvm_tpu.data.records import RecordWriter


def _jpeg(rng, h, w):
    arr = (rng.random((h, w, 3)) * 255).astype(np.uint8)
    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, format="JPEG", quality=90)
    return buf.getvalue()


@pytest.fixture
def shard(tmp_path, rng):
    path = str(tmp_path / "mini.cvrec")
    with RecordWriter(path) as w:
        # detection + 3D + two-frame record
        w.write(
            {
                "id": "det0",
                "height": 96,
                "width": 128,
                "boxes": [[10, 12, 60, 70], [80, 20, 120, 90]],
                "classes": [0, 2],
                "intrinsics": [100.0, 100.0, 64.0, 48.0],
                "dims3d": [[1.5, 1.6, 3.9], [1.5, 1.6, 3.9]],
                "loc3d": [[-1.0, 1.0, 10.0], [2.0, 1.0, 15.0]],
                "rot_y": [0.3, -0.5],
            },
            {"jpeg": _jpeg(rng, 96, 128), "jpeg_t1": _jpeg(rng, 96, 128)},
        )
        # semseg record (mask includes ignore=255)
        mask = np.full((96, 128), 255, np.uint8)
        mask[20:70, 30:100] = 1
        w.write({"id": "seg0", "height": 96, "width": 128},
                {"jpeg": _jpeg(rng, 96, 128), "mask": mask})
        # sparse uint16 depth record (KITTI d*256 convention)
        depth = np.zeros((96, 128), np.uint16)
        depth[::7, ::5] = 256 * 12
        w.write({"id": "dep0", "height": 96, "width": 128},
                {"jpeg": _jpeg(rng, 96, 128), "depth": depth})
    with open(path + ".meta.json", "w") as f:
        json.dump({"classes": ["car", "truck", "person"], "num_records": 3}, f)
    return path


def test_inspect_renders_all_record_kinds(tmp_path, shard, capsys):
    from cvm_tpu.cli.inspect import main

    out = tmp_path / "viz"
    rc = main(["--data", shard, "--out", str(out), "--t1"])
    assert rc == 0
    lines = [json.loads(l) for l in capsys.readouterr().out.splitlines()]
    assert lines[-1]["rendered"] == 3 and lines[-1]["classes"] == 3
    pngs = sorted(p.name for p in out.iterdir())
    # 3 GT renders + the second frame of the two-frame record
    assert len(pngs) == 4 and any("_t1" in p for p in pngs)
    for rec in lines[:-1]:
        img = np.asarray(Image.open(rec["png"]))
        assert img.shape == (96, 128, 3)
        assert img.std() > 1  # something was drawn, not a blank frame


def test_inspect_raw_yuv_record(tmp_path, rng):
    """Repacked raw-YUV serving shards render through the same path."""
    from cvm_tpu.cli.inspect import main
    from cvm_tpu.native import _rgb_to_yuv420_np

    rgb = (rng.random((64, 64, 3)) * 255).astype(np.uint8)
    y, u, v = _rgb_to_yuv420_np(rgb)
    path = str(tmp_path / "yuv.cvrec")
    with RecordWriter(path) as w:
        w.write({"id": "raw0", "height": 64, "width": 64,
                 "boxes": [[5, 5, 40, 40]], "classes": [0]},
                {"y": y, "u": u, "v": v})
    out = tmp_path / "viz"
    assert main(["--data", path, "--out", str(out)]) == 0
    (png,) = list(out.iterdir())
    assert np.asarray(Image.open(png)).shape == (64, 64, 3)


def test_inspect_index_selection(tmp_path, shard):
    from cvm_tpu.cli.inspect import main

    out = tmp_path / "viz"
    assert main(["--data", shard, "--out", str(out), "--indices", "1,99"]) == 0
    assert len(list(out.iterdir())) == 1  # index 99 skipped with a warning
