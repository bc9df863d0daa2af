"""Dataset statistics CLI (cli/stats.py)."""

import json

import numpy as np

from cvm_tpu.cli.stats import compute_stats, main
from cvm_tpu.data.records import RecordWriter


def _shard(path, rng):
    with RecordWriter(path) as w:
        for i in range(6):
            img = rng.integers(0, 255, (40, 60, 3), np.uint8)
            mask = np.full((40, 60), 255, np.uint8)
            mask[:20] = 0          # class 0: half the labeled pixels
            mask[20:30] = 1        # class 1: a quarter
            mask[30:40] = 2        # class 2: a quarter
            meta = {
                "id": f"s{i}", "height": 40, "width": 60,
                # one small box (8x8=64 px^2) + one large (40x40)
                "boxes": [[1.0, 1.0, 9.0, 9.0], [5.0, 0.0, 45.0, 40.0]],
                "classes": [0, 2],
                "intrinsics": [100.0, 100.0, 30.0, 20.0],
            }
            blobs = {"image": img, "mask": mask,
                     "depth": np.where(np.arange(60)[None, :] < 30, 5.0, 0.0)
                     .astype(np.float32) * np.ones((40, 1), np.float32)}
            w.write(meta, blobs)


def test_compute_stats_counts_and_weights(tmp_path, rng):
    p = str(tmp_path / "a.cvrec")
    _shard(p, rng)
    s = compute_stats([p], mask_samples=6)
    assert s["records"] == 6 and s["shards"] == 1
    assert s["boxes_total"] == 12
    assert s["box_classes"] == {"0": 6, "2": 6}
    assert s["boxes_per_frame_mean"] == 2.0
    assert s["box_size_buckets"]["small"] == 6      # 8x8 = 64 < 32^2
    assert s["box_size_buckets"]["medium"] == 6     # 40x40 = 1600 in [32^2, 96^2)
    assert s["box_size_buckets"]["large"] == 0
    assert s["image_hw_mean"] == [40.0, 60.0]
    assert s["label_presence"]["mask"] == 6
    # Mask histogram: half class 0, quarter classes 1/2 → weights favor 1/2.
    f = s["mask_class_freq"]
    assert abs(f["0"] - 0.5) < 1e-6 and abs(f["1"] - 0.25) < 1e-6
    w = s["suggested_class_weights"]
    assert w["1"] == w["2"] and w["1"] > w["0"]
    # Mean-normalized to 1 over the 3 classes.
    assert abs(np.mean([w["0"], w["1"], w["2"]]) - 1.0) < 1e-2
    assert s["mask_ignore_frac"] == 0.0  # every 255 was overwritten above
    # Depth: columns 0..29 of 60 are valid → 0.5 coverage.
    assert abs(s["depth_valid_frac_mean"] - 0.5) < 1e-6


def test_mask_sampled_frames_counts_actual_hits(tmp_path, rng):
    """mask_sampled_frames is how many SAMPLED records carried a mask — not
    min(samples, total-with-mask), which overstates the sample behind the
    suggested class weights when masks are sparse."""
    p = str(tmp_path / "c.cvrec")
    with RecordWriter(p) as w:
        for i in range(12):
            blobs = {"image": rng.integers(0, 255, (8, 8, 3), np.uint8)}
            if i % 3 == 0:  # masks on 4 of 12 records
                blobs["mask"] = np.zeros((8, 8), np.uint8)
            w.write({"id": f"m{i}", "height": 8, "width": 8}, blobs)
    s = compute_stats([p], mask_samples=12)  # sample everything
    assert s["mask_sampled_frames"] == 4


def test_stats_cli_json_line(tmp_path, rng, capsys):
    p = str(tmp_path / "b.cvrec")
    _shard(p, rng)
    assert main(["--data", p, "--json", "--mask_samples", "2"]) == 0
    line = capsys.readouterr().out.strip()
    s = json.loads(line)
    assert s["records"] == 6
    # Human-readable mode prints something parse-free without crashing.
    assert main(["--data", p]) == 0
    assert "records: 6" in capsys.readouterr().out
