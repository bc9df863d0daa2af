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
