"""cli.infer end-to-end: checkpoint → JSONL predictions (+ tiled mode)."""

import itertools
import json
import os

import numpy as np
import pytest
from PIL import Image

from cvm_tpu.data.synthetic import synthetic_batch
from cvm_tpu.models import get_model
from cvm_tpu.train.loop import Trainer

pytestmark = pytest.mark.slow  # trains a step + jits full pipelines (~2 min)


def _checkpoint(tmp_path, name="semseg", **kw):
    spec = get_model(name)
    p = spec.params_cls(input_hw=(32, 32), backbone="tiny", warmup_steps=1,
                        total_steps=10, batch_size=8, **kw)
    ckdir = str(tmp_path / "ck")
    tr = Trainer(spec, p, checkpoint_dir=ckdir, checkpoint_every=1, log_every=1)
    tr.init_state()
    pool = [synthetic_batch(np.random.default_rng(0), 8, (48, 48), num_classes=3)]
    tr.fit(itertools.cycle(pool), 1)
    tr.ckpt.wait()
    return ckdir


def _images(tmp_path, n=2, hw=(80, 112)):
    rng = np.random.default_rng(1)
    d = tmp_path / "imgs"
    d.mkdir()
    for i in range(n):
        Image.fromarray(
            rng.integers(0, 255, (*hw, 3), dtype=np.uint8)
        ).save(str(d / f"im{i}.jpg"))
    return str(d / "*.jpg")


def test_cli_infer_images_jsonl_and_visualize(tmp_path, capsys):
    from cvm_tpu.cli.infer import main

    ck = _checkpoint(tmp_path, "semseg", num_classes=3, decoder_features=16,
                     class_weights=(1.0, 1.0, 1.0))
    pattern = _images(tmp_path)
    vis = str(tmp_path / "vis")
    assert main(["--model", "semseg", "--checkpoint_dir", ck,
                 "--images", pattern, "--batch_size", "2",
                 "--visualize", vis]) == 0
    lines = [json.loads(l) for l in capsys.readouterr().out.splitlines()
             if l.startswith("{")]
    assert len(lines) == 2
    assert all("class_histogram" in r for r in lines)
    assert len(os.listdir(vis)) == 2  # one rendered PNG per input


def test_cli_infer_tiled_native_resolution(tmp_path, capsys):
    from cvm_tpu.cli.infer import main

    ck = _checkpoint(tmp_path, "semseg", num_classes=3, decoder_features=16,
                     class_weights=(1.0, 1.0, 1.0))
    pattern = _images(tmp_path, n=1, hw=(70, 90))  # not a multiple of 32
    vis = str(tmp_path / "vist")
    assert main(["--model", "semseg", "--checkpoint_dir", ck,
                 "--images", pattern, "--tiled", "--visualize", vis]) == 0
    lines = [json.loads(l) for l in capsys.readouterr().out.splitlines()
             if l.startswith("{")]
    assert len(lines) == 1
    assert lines[0]["hw"] == [70, 90]  # native resolution, no letterbox
    outs = os.listdir(vis)
    assert any(f.endswith(".classes.png") for f in outs)
    cm = np.asarray(Image.open(os.path.join(vis, outs[0])))
    assert cm.shape[:2] == (70, 90)

    # Detection configs are rejected for --tiled with a clear CLI error.
    ck2 = _checkpoint(tmp_path / "cn", "centernet", num_classes=3,
                      neck_features=16, head_features=8, max_objects=6)
    with pytest.raises(SystemExit):
        main(["--model", "centernet", "--checkpoint_dir", ck2,
              "--images", pattern, "--tiled"])


def test_cli_infer_artifact(tmp_path, capsys):
    """--artifact: the serialized export produces the same JSONL records and
    rendered PNGs as the checkpoint pipeline — deployment-side inference."""
    from cvm_tpu.cli.export import export_model
    from cvm_tpu.cli.infer import main

    ck = _checkpoint(tmp_path, "semseg", num_classes=3, decoder_features=16,
                     class_weights=(1.0, 1.0, 1.0))
    art = str(tmp_path / "art")
    export_model("semseg", ck, art, batch_size=2, pad_hw=(48, 48))
    pattern = _images(tmp_path, hw=(40, 44))
    vis = str(tmp_path / "visa")
    assert main(["--artifact", art, "--images", pattern,
                 "--visualize", vis]) == 0
    lines = [json.loads(l) for l in capsys.readouterr().out.splitlines()
             if l.startswith("{")]
    assert len(lines) == 2 and all("class_histogram" in r for r in lines)
    assert len(os.listdir(vis)) == 2

    # Baked-in choices and non-rgb/dmds artifacts are rejected clearly.
    with pytest.raises(SystemExit):
        main(["--artifact", art, "--images", pattern, "--tta", "hflip"])
    with pytest.raises(SystemExit):
        main(["--artifact", art, "--checkpoint_dir", ck])
