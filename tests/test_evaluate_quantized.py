"""cli.evaluate --quantize/--fold_bn: score the deployed numerics.

The reference's accuracy story is measured on the artifact that ships
(full-int8 TFLite, SURVEY.md §3.5) — these flags run the same quantized /
folded compute paths as cli.export inside the full metric pipeline.
"""

import itertools
import json

import numpy as np
import pytest

from cvm_tpu.data.synthetic import synthetic_batch
from cvm_tpu.models import get_model
from cvm_tpu.train.loop import Trainer

# The static-int8 eval program is a heavy one-time XLA:CPU compile (~8 min
# cold, seconds once the persistent cache is warm) — keep it out of the
# fast lane.
pytestmark = pytest.mark.slow


def _train_tiny_semseg(tmp_path, steps=3):
    spec = get_model("semseg")
    p = spec.params_cls(input_hw=(32, 32), num_classes=3, backbone="tiny",
                        decoder_features=16, class_weights=(1.0, 1.0, 1.0),
                        batch_size=8, warmup_steps=1, total_steps=10)
    ckdir = str(tmp_path / "checkpoints")
    tr = Trainer(spec, p, checkpoint_dir=ckdir, checkpoint_every=steps,
                 log_every=steps)
    tr.init_state()
    pool = [synthetic_batch(np.random.default_rng(i), 8, (48, 48),
                            num_classes=3) for i in range(2)]
    tr.fit(itertools.cycle(pool), steps)
    tr.ckpt.wait()
    return str(tmp_path)


def _run_eval(capsys, workdir, *extra):
    from cvm_tpu.cli.evaluate import main

    rc = main(["--model", "semseg", "--workdir", workdir,
               "--batches", "1", "--pad_hw", "48,48", *extra])
    assert rc == 0
    lines = [ln for ln in capsys.readouterr().out.splitlines()
             if ln.startswith("[cvm_tpu] eval ")]
    return json.loads(lines[-1].split(": ", 1)[1])


def test_evaluate_deployed_numerics_variants(tmp_path, capsys):
    wd = _train_tiny_semseg(tmp_path)
    plain = _run_eval(capsys, wd)
    assert "miou" in plain

    # BN folding is an exact reparameterization up to bf16 rounding order
    # (bit-level equivalence is locked by test_fold_bn; at metric level a
    # barely-trained model flips argmax ties, so the bound is loose).
    folded = _run_eval(capsys, wd, "--fold_bn")
    assert folded["miou"] == pytest.approx(plain["miou"], abs=0.05)

    # Weight-only int8 and calibrated static W8A8 perturb numerics but must
    # stay task-equivalent on this easy synthetic scene.
    int8 = _run_eval(capsys, wd, "--quantize", "int8")
    assert int8["miou"] == pytest.approx(plain["miou"], abs=0.1)

    static = _run_eval(capsys, wd, "--quantize", "w8a8_static",
                       "--calib_batches", "1")
    assert static["miou"] == pytest.approx(plain["miou"], abs=0.1)


def test_evaluate_w8a8_rejected_for_dmds(tmp_path):
    from cvm_tpu.cli.evaluate import main

    with pytest.raises(SystemExit):
        main(["--model", "dmds", "--workdir", str(tmp_path),
              "--quantize", "w8a8"])
