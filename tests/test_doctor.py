"""cli.doctor environment diagnostic."""

import json


def test_doctor_reports_healthy_env(capsys):
    from cvm_tpu.cli.doctor import main

    rc = main(["--probe_iters", "2"])
    out = capsys.readouterr().out.strip().splitlines()[-1]
    rep = json.loads(out)
    assert rc == 0 and rep["ok"]
    assert rep["device_count"] >= 1
    assert rep["model_forward"] == "ok"
    assert "dispatch_ms" in rep
    assert set(rep["models"]) >= {"centernet", "semseg", "depth",
                                  "multitask", "dmds"}
