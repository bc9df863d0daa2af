"""Failure-path robustness: corrupt shards, empty datasets, label overflow."""

import io
import struct

import numpy as np
import pytest
from PIL import Image

from cvm_tpu.data.loader import RecordLoader
from cvm_tpu.data.records import MAGIC, RecordDataset, RecordReader, RecordWriter


def _jpeg(rng, hw=(20, 30)):
    buf = io.BytesIO()
    Image.fromarray(rng.integers(0, 255, (*hw, 3), dtype=np.uint8)).save(buf, "JPEG")
    return buf.getvalue()


def test_reader_rejects_garbage(tmp_path):
    p = tmp_path / "junk.cvrec"
    p.write_bytes(b"NOPE" + b"\x00" * 100)
    with pytest.raises(ValueError, match="not a .cvrec"):
        RecordReader(str(p))


def test_reader_rejects_wrong_version(tmp_path):
    p = tmp_path / "v9.cvrec"
    p.write_bytes(MAGIC + struct.pack("<IQQ", 9, 0, 24))
    with pytest.raises(ValueError, match="unsupported version"):
        RecordReader(str(p))


def test_empty_glob_raises(tmp_path):
    with pytest.raises(FileNotFoundError):
        RecordDataset([str(tmp_path / "*.cvrec")])


def test_writer_atomicity(tmp_path, rng):
    """An unclosed writer leaves no published shard behind."""
    p = str(tmp_path / "a.cvrec")
    w = RecordWriter(p)
    w.write({"id": "x"}, {"jpeg": _jpeg(rng)})
    import os

    assert not os.path.exists(p)  # only .tmp exists until close()
    w.close()
    assert os.path.exists(p)
    assert len(RecordReader(p)) == 1


def test_loader_clips_excess_objects(tmp_path, rng):
    p = str(tmp_path / "many.cvrec")
    with RecordWriter(p) as w:
        boxes = [[float(i), 0.0, float(i + 1), 5.0] for i in range(20)]
        w.write({"id": "m", "boxes": boxes, "classes": list(range(20))},
                {"jpeg": _jpeg(rng)})
        w.write({"id": "n", "boxes": boxes[:2], "classes": [1, 2]},
                {"jpeg": _jpeg(rng)})
    loader = RecordLoader(RecordDataset([p]), 2, (32, 32), max_objects=8,
                          shuffle=False, loop=False)
    b = next(iter(loader))
    assert b["boxes"].shape == (2, 8, 4)
    assert b["num_objects"][0] == 8 and b["num_objects"][1] == 2


def test_loader_surfaces_worker_errors(tmp_path, rng):
    """Exceptions in the background assembly thread reach the consumer."""
    p = str(tmp_path / "x.cvrec")
    with RecordWriter(p) as w:
        w.write({"id": "a"}, {"jpeg": _jpeg(rng)})
    ds = RecordDataset([p])
    loader = RecordLoader(ds, 1, (32, 32), shuffle=False, loop=False)
    ds.readers[0].close()  # sabotage: closed fd → worker raises OSError
    with pytest.raises(OSError):
        list(iter(loader))


def test_truncated_shard_detected(tmp_path, rng):
    p = str(tmp_path / "t.cvrec")
    with RecordWriter(p) as w:
        for _ in range(3):
            w.write({"id": "a"}, {"jpeg": _jpeg(rng)})
    data = open(p, "rb").read()
    open(p, "wb").write(data[: len(data) // 2])  # simulate torn write
    with pytest.raises(Exception):
        r = RecordReader(p)
        r.get(2)
