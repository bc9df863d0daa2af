"""cli.train --steps is a TOTAL global-step target (resume idempotence).

The auto-restart re-exec and the persistent flagship runner
(scripts/flagship_persist.sh) both re-invoke the SAME command after a
checkpoint exists; if --steps meant "this many more", every relaunch would
overshoot by a full budget and the flagship run would never converge.
"""

import json
import os

import pytest

ARGS = [
    "--model", "semseg", "--data", "synthetic",
    "--steps", "4", "--checkpoint_every", "2", "--log_every", "2",
    "--eval_every", "2", "--eval_batches", "1", "--keep_best", "miou",
    "--pad_hw", "48,48",
    "--input_hw", "[32,32]", "--num_classes", "3", "--backbone", "tiny",
    "--decoder_features", "16", "--class_weights", "[1,1,1]",
    "--batch_size", "8", "--warmup_steps", "2", "--total_steps", "4",
]


def _val_lines(wd):
    with open(os.path.join(wd, "metrics.jsonl")) as f:
        rows = [json.loads(ln) for ln in f if ln.strip()]
    return rows, [r for r in rows if any(k.startswith("val_") for k in r)]


@pytest.mark.slow
def test_reinvoking_same_command_trains_only_remainder(tmp_path, capsys):
    from cvm_tpu.cli.train import main

    wd = str(tmp_path / "run")
    assert main(ARGS + ["--workdir", wd]) == 0
    rows, evals = _val_lines(wd)
    assert max(r["step"] for r in rows) == 4
    n_evals = len(evals)
    assert n_evals == 2  # step 2 and step 4
    assert os.path.exists(os.path.join(wd, "best", "best.json"))

    # Second identical invocation: resumes at step 4, trains ZERO additional
    # steps (total-target semantics), but still records one final eval so a
    # process killed between fit and eval can't lose the --keep_best result.
    assert main(ARGS + ["--workdir", wd]) == 0
    out = capsys.readouterr().out
    assert "resume: 0 of the --steps total remain" in out
    rows, evals = _val_lines(wd)
    assert max(r["step"] for r in rows) == 4, "resumed run overshot --steps"
    assert len(evals) == n_evals + 1
