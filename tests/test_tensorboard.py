"""TensorBoard event-file writer: framing, crc32c, and Event round-trip."""

import glob
import os

import numpy as np

from cvm_tpu.train.tensorboard import (
    TensorBoardWriter,
    _crc32c,
    _masked_crc,
    read_scalar_events,
)


def test_crc32c_vectors():
    # RFC 3720 / Castagnoli reference vectors.
    assert _crc32c(b"123456789") == 0xE3069283
    assert _crc32c(b"") == 0
    assert _crc32c(b"\x00" * 32) == 0x8A9136AA
    # TFRecord masking is a rotation + constant; spot-check determinism.
    assert _masked_crc(b"123456789") == ((0xE3069283 >> 15 | 0xE3069283 << 17)
                                         + 0xA282EAD8) & 0xFFFFFFFF


def test_event_file_roundtrip(tmp_path):
    w = TensorBoardWriter(str(tmp_path))
    w.write(1, {"loss": 3.5, "lr": 1e-3})
    w.write(50, {"loss": 1.25})
    w.close()

    files = glob.glob(str(tmp_path / "events.out.tfevents.*"))
    assert len(files) == 1
    events = read_scalar_events(files[0])
    assert events[0]["file_version"] == "brain.Event:2"
    assert events[1]["step"] == 1
    assert events[1]["scalars"]["loss"] == np.float32(3.5)
    assert events[1]["scalars"]["lr"] == np.float32(1e-3)
    assert events[2]["step"] == 50
    assert events[2]["scalars"] == {"loss": 1.25}
    assert all("wall_time" in e for e in events)


def test_png_encoder_roundtrips_via_pil(tmp_path):
    """The stdlib-only PNG encoder must produce files PIL (and therefore
    TensorBoard's frontend) decodes back to the exact pixels."""
    import io

    from PIL import Image

    from cvm_tpu.train.tensorboard import _png_encode

    rgb = np.random.default_rng(0).integers(0, 256, (37, 53, 3), np.uint8)
    png = _png_encode(rgb)
    assert png[:8] == b"\x89PNG\r\n\x1a\n"
    back = np.asarray(Image.open(io.BytesIO(png)).convert("RGB"))
    np.testing.assert_array_equal(back, rgb)


def test_image_event_roundtrip(tmp_path):
    w = TensorBoardWriter(str(tmp_path))
    rgb = np.random.default_rng(1).integers(0, 256, (16, 24, 3), np.uint8)
    w.write_image(7, "eval/sample_0", rgb)
    w.write(7, {"loss": 1.0})  # scalars and images interleave in one file
    w.close()

    files = glob.glob(str(tmp_path / "events.out.tfevents.*"))
    events = read_scalar_events(files[0])
    img_evs = [e for e in events if e.get("images")]
    assert len(img_evs) == 1
    ev = img_evs[0]
    assert ev["step"] == 7
    img = ev["images"]["eval/sample_0"]
    assert (img["height"], img["width"], img["colorspace"]) == (16, 24, 3)
    import io

    from PIL import Image

    back = np.asarray(Image.open(io.BytesIO(img["png"])).convert("RGB"))
    np.testing.assert_array_equal(back, rgb)
    # The scalar event still parses alongside.
    assert any(e["scalars"].get("loss") == 1.0 for e in events)


import pytest


@pytest.mark.slow  # 72 s measured: full train+eval+image-render CLI run
def test_cli_eval_images_land_in_tb(tmp_path):
    """cli.train --eval_images renders eval predictions into the TB events
    file (the reference's OpenCV inspection windows, headless)."""
    import io

    import pytest
    from PIL import Image

    from cvm_tpu.cli.train import main

    pytest.importorskip("PIL")
    wd = str(tmp_path / "run")
    rc = main([
        "--model", "semseg", "--data", "synthetic", "--steps", "4",
        "--workdir", wd, "--pad_hw", "48,48", "--log_every", "2",
        "--checkpoint_every", "4", "--eval_every", "2", "--eval_batches", "1",
        "--tensorboard", "--eval_images", "2",
        "--input_hw", "[32,32]", "--num_classes", "3", "--backbone", "tiny",
        "--decoder_features", "16", "--class_weights", "[1,1,1]",
        "--batch_size", "8", "--warmup_steps", "2", "--total_steps", "4",
    ])
    assert rc == 0
    files = glob.glob(os.path.join(wd, "tb", "events.out.tfevents.*"))
    assert len(files) == 1
    events = read_scalar_events(files[0])
    img_evs = [e for e in events if e.get("images")]
    # Two evals (steps 2 and 4) × 2 samples, one event per image.
    assert len(img_evs) == 4
    assert sorted({e["step"] for e in img_evs}) == [2, 4]
    tags = {t for e in img_evs for t in e["images"]}
    assert tags == {"eval/sample_0", "eval/sample_1"}
    for e in img_evs:
        for img in e["images"].values():
            back = Image.open(io.BytesIO(img["png"]))
            assert back.size[1] == img["height"]
    # Scalar eval metrics still flow alongside.
    assert any("val_miou" in e["scalars"] for e in events if e["scalars"])


def test_trainer_writes_tensorboard(tmp_path):
    """Trainer fans metrics out to JSONL + TB when tensorboard_dir is set."""
    from cvm_tpu.data.synthetic import synthetic_iterator
    from cvm_tpu.models import get_model
    from cvm_tpu.train.loop import Trainer

    spec = get_model("semseg")
    p = spec.params_cls(input_hw=(32, 32), num_classes=3, backbone="tiny",
                        decoder_features=16, class_weights=(1.0, 1.0, 1.0),
                        warmup_steps=1, total_steps=10)
    tr = Trainer(spec, p, metrics_path=str(tmp_path / "m.jsonl"),
                 tensorboard_dir=str(tmp_path / "tb"), log_every=1)
    it = synthetic_iterator(0, 8, (48, 48), num_classes=3)
    tr.init_state(next(it))
    tr.fit(it, 2)

    assert os.path.exists(tmp_path / "m.jsonl")
    files = glob.glob(str(tmp_path / "tb" / "events.out.tfevents.*"))
    assert len(files) == 1
    events = read_scalar_events(files[0])
    steps = [e.get("step") for e in events if e["scalars"]]
    assert steps == [1, 2]
    assert all(np.isfinite(e["scalars"]["loss"]) for e in events if e["scalars"])
