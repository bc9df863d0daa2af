"""Video inference CLI (cli/video.py): frame reader, batching loop, and the
end-to-end checkpoint path."""

import json

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from cvm_tpu.cli.video import _pad_batch, read_frames, run_video  # noqa: E402


def _write_video(path, n=10, hw=(48, 64), fps=10):
    w = cv2.VideoWriter(str(path), cv2.VideoWriter_fourcc(*"mp4v"), fps,
                        (hw[1], hw[0]))
    assert w.isOpened()
    for i in range(n):
        frame = np.zeros((*hw, 3), np.uint8)
        frame[:, :, 2] = i * 20  # R channel (BGR writer) encodes the index
        w.write(frame)
    w.release()
    return str(path)


def test_read_frames_stride_and_limit(tmp_path):
    path = _write_video(tmp_path / "in.mp4", n=10)
    fps, gen = read_frames(path, stride=3, max_frames=3)
    items = list(gen)
    assert [i for i, _ in items] == [0, 3, 6]
    assert all(f.shape == (48, 64, 3) and f.dtype == np.uint8
               for _, f in items)
    # mp4 is lossy; the R ramp must still be monotone across strided frames.
    reds = [int(f[..., 0].mean()) for _, f in items]
    assert reds[0] < reds[1] < reds[2]


def test_read_frames_pairs_follow_stride(tmp_path):
    path = _write_video(tmp_path / "in.mp4", n=8)
    _, gen = read_frames(path, stride=2, pairs=True)
    items = list(gen)
    # pairs are (t, t+stride): indices 0,2,4 with partners 2,4,6
    assert [i for i, _, _ in items] == [0, 2, 4]
    for _, a, b in items:
        assert a.shape == b.shape == (48, 64, 3)


def test_read_frames_resize_long(tmp_path):
    path = _write_video(tmp_path / "in.mp4", n=2, hw=(48, 96))
    _, gen = read_frames(path, resize_long=48)
    _, f = next(gen)
    assert f.shape == (24, 48, 3)


def test_pad_batch_places_frames_with_sizes():
    frames = [np.full((8, 10, 3), 7, np.uint8), np.full((6, 5, 3), 3, np.uint8)]
    img, hw = _pad_batch(frames, (8, 12))
    assert img.shape == (2, 8, 12, 3) and hw.tolist() == [[8, 10], [6, 5]]
    assert (img[0, :8, :10] == 7).all() and (img[0, :, 10:] == 0).all()
    assert (img[1, :6, :5] == 3).all() and (img[1, 6:, :] == 0).all()


def test_run_video_batches_draws_and_writes_jsonl(tmp_path):
    """Stub detector: full loop — static batch padding, per-frame JSONL,
    annotated video with one frame per input frame."""
    path = _write_video(tmp_path / "in.mp4", n=5)
    fps, gen = read_frames(path)
    calls = []

    def predict(batch):
        B = batch["image"].shape[0]
        calls.append(B)
        assert batch["image"].shape == (B, 48, 64, 3)
        assert batch["image_hw"].tolist() == [[48, 64]] * B
        return {
            "boxes": np.tile([[4.0, 4.0, 20.0, 20.0]], (B, 1, 1)),
            "scores": np.full((B, 1), 0.9, np.float32),
            "classes": np.zeros((B, 1), np.int32),
        }

    out_mp4 = str(tmp_path / "out.mp4")
    out_jsonl = str(tmp_path / "out.jsonl")
    n = run_video(predict, gen, batch_size=2, pad_hw=(48, 64), fps=fps,
                  out_path=out_mp4, jsonl_path=out_jsonl,
                  score_threshold=0.5)
    assert n == 5
    # 5 frames at batch 2 → 3 dispatches, each full static shape.
    assert calls == [2, 2, 2]
    recs = [json.loads(l) for l in open(out_jsonl)]
    assert [r["frame"] for r in recs] == [0, 1, 2, 3, 4]
    assert all(r["boxes"] == [[4.0, 4.0, 20.0, 20.0]] for r in recs)
    cap = cv2.VideoCapture(out_mp4)
    assert cap.isOpened()
    assert int(cap.get(cv2.CAP_PROP_FRAME_COUNT)) == 5
    cap.release()


def test_run_video_two_frame_motion_records(tmp_path):
    """Stub dmds: pairs feed image_t1; ego-motion lands in the JSONL."""
    path = _write_video(tmp_path / "in.mp4", n=4)
    fps, gen = read_frames(path, pairs=True)

    def predict(batch):
        B = batch["image"].shape[0]
        assert batch["image_t1"].shape == batch["image"].shape
        return {
            "depth": np.full((B, 12, 16, 1), 2.0, np.float32),
            "rotation": np.tile([[0.0, 0.01, 0.0]], (B, 1)),
            "translation": np.tile([[0.0, 0.0, 1.5]], (B, 1)),
        }

    out_jsonl = str(tmp_path / "out.jsonl")
    n = run_video(predict, gen, batch_size=4, pad_hw=(48, 64), fps=fps,
                  out_path=None, jsonl_path=out_jsonl, two_frame=True)
    assert n == 3  # 4 frames → 3 consecutive pairs
    recs = [json.loads(l) for l in open(out_jsonl)]
    assert [r["frame"] for r in recs] == [0, 1, 2]
    for r in recs:
        assert r["translation"] == [0.0, 0.0, 1.5]
        assert r["depth_mean"] == 2.0


@pytest.mark.slow
def test_video_cli_over_exported_artifact(tmp_path, rng):
    """--artifact: the deployment-side visual check — a clip through the
    exported StableHLO program (no zoo code), frames re-canvased to the
    artifact's static shape."""
    import itertools

    from cvm_tpu.cli.export import export_model
    from cvm_tpu.cli.video import main
    from cvm_tpu.data.synthetic import synthetic_batch
    from cvm_tpu.models import get_model
    from cvm_tpu.train.loop import Trainer

    spec = get_model("semseg")
    p = spec.params_cls(input_hw=(32, 32), num_classes=3, backbone="tiny",
                        decoder_features=16, class_weights=(1.0, 1.0, 1.0),
                        batch_size=8, warmup_steps=1, total_steps=10)
    ckdir = str(tmp_path / "ck")
    tr = Trainer(spec, p, checkpoint_dir=ckdir, checkpoint_every=1,
                 log_every=1)
    tr.init_state()
    pool = [synthetic_batch(np.random.default_rng(0), 8, (48, 48),
                            num_classes=3)]
    tr.fit(itertools.cycle(pool), 1)
    tr.ckpt.wait()
    art = str(tmp_path / "art")
    export_model("semseg", ckdir, art, batch_size=2, pad_hw=(64, 80))

    path = _write_video(tmp_path / "in.mp4", n=3)  # 48x64 frames fit 64x80
    out_jsonl = str(tmp_path / "out.jsonl")
    rc = main(["--artifact", art, "--video", path, "--jsonl", out_jsonl,
               "--out", str(tmp_path / "out.mp4")])
    assert rc == 0
    recs = [json.loads(l) for l in open(out_jsonl)]
    assert len(recs) == 3 and all("class_histogram" in r for r in recs)
    # An oversized clip is rejected with the remediation in the message.
    big = _write_video(tmp_path / "big.mp4", n=2, hw=(96, 128))
    with pytest.raises(SystemExit):
        main(["--artifact", art, "--video", big, "--jsonl", out_jsonl])


@pytest.mark.slow
def test_video_cli_end_to_end(tmp_path, rng):
    """main(): train one step, run the real pipeline over a clip."""
    import itertools

    from cvm_tpu.cli.video import main
    from cvm_tpu.data.synthetic import synthetic_batch
    from cvm_tpu.models import get_model
    from cvm_tpu.train.loop import Trainer

    spec = get_model("semseg")
    p = spec.params_cls(input_hw=(32, 32), num_classes=3, backbone="tiny",
                        decoder_features=16, class_weights=(1.0, 1.0, 1.0),
                        batch_size=8, warmup_steps=1, total_steps=10)
    ckdir = str(tmp_path / "ck")
    tr = Trainer(spec, p, checkpoint_dir=ckdir, checkpoint_every=1,
                 log_every=1)
    tr.init_state()
    pool = [synthetic_batch(np.random.default_rng(0), 8, (48, 48),
                            num_classes=3)]
    tr.fit(itertools.cycle(pool), 1)
    tr.ckpt.wait()

    path = _write_video(tmp_path / "in.mp4", n=3)
    out_mp4 = str(tmp_path / "out.mp4")
    out_jsonl = str(tmp_path / "out.jsonl")
    rc = main(["--model", "semseg", "--checkpoint_dir", ckdir,
               "--video", path, "--out", out_mp4, "--jsonl", out_jsonl,
               "--batch_size", "2"])
    assert rc == 0
    recs = [json.loads(l) for l in open(out_jsonl)]
    assert len(recs) == 3 and all("class_histogram" in r for r in recs)
    cap = cv2.VideoCapture(out_mp4)
    assert int(cap.get(cv2.CAP_PROP_FRAME_COUNT)) == 3
    cap.release()
