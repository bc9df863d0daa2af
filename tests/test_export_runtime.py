"""Export → standalone runtime roundtrip in CI (tiny model, CPU)."""

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # jax.export artifacts compiled + served (~2 min)


def test_export_and_serving_roundtrip(tmp_path, rng):
    import jax

    from cvm_tpu.data.synthetic import synthetic_batch
    from cvm_tpu.models import get_model
    from cvm_tpu.train.loop import Trainer
    from cvm_tpu.cli.export import export_model
    from cvm_tpu.infer.runtime import ServingModel

    spec = get_model("semseg")
    p = spec.params_cls(input_hw=(32, 32), num_classes=3, backbone="tiny",
                        decoder_features=16, class_weights=(1.0, 1.0, 1.0),
                        batch_size=8, warmup_steps=1, total_steps=10)
    ckdir = str(tmp_path / "ck")
    tr = Trainer(spec, p, checkpoint_dir=ckdir, checkpoint_every=1, log_every=1)
    tr.init_state()
    import itertools

    pool = [synthetic_batch(np.random.default_rng(0), 8, (48, 48), num_classes=3)]
    tr.fit(itertools.cycle(pool), 1)
    tr.ckpt.wait()

    out_fp = str(tmp_path / "art_fp")
    stats = export_model("semseg", ckdir, out_fp, batch_size=1)
    assert stats["stablehlo_bytes"] > 1000

    out_q = str(tmp_path / "art_q")
    qstats = export_model("semseg", ckdir, out_q, batch_size=1, quantize="int8")
    assert qstats["quantized"] > 5
    assert qstats["weights_bytes"] < stats["weights_bytes"] / 2
    assert qstats["max_rel_error"] < 0.02

    img = np.random.default_rng(1).integers(0, 255, (1, 48, 48, 3), dtype=np.uint8)
    hw = np.asarray([[40, 44]], np.int32)
    m_fp = ServingModel(out_fp)
    m_q = ServingModel(out_q)
    cm_fp = np.asarray(m_fp(img, hw)["class_map"])
    cm_q = np.asarray(m_q(img, hw)["class_map"])
    assert cm_fp.shape == (1, 32, 32)
    assert (cm_fp == cm_q).mean() > 0.9  # int8 barely perturbs argmax

    # --tta hflip bakes the head-level flip merge into the artifact: it
    # loads codelessly, records the flag, and departs from the fp program
    # (an untrained net is not flip-symmetric).
    import json as _json

    out_tta = str(tmp_path / "art_tta")
    tstats = export_model("semseg", ckdir, out_tta, batch_size=1, tta="hflip")
    assert tstats["stablehlo_bytes"] > 1000
    with open(f"{out_tta}/artifact.json") as f:
        assert _json.load(f)["tta"] == "hflip"
    cm_tta = np.asarray(ServingModel(out_tta)(img, hw)["class_map"])
    assert cm_tta.shape == (1, 32, 32)
    assert (cm_tta != cm_fp).any()

    # Integrity self-test: the export-time fingerprint verifies on a clean
    # load; corrupting the weights (scale one conv) must be detected — the
    # "weights/program drift" failure still executes but changes output
    # statistics wildly.
    assert m_fp.selftest() == []
    import shutil

    out_bad = str(tmp_path / "art_bad")
    shutil.copytree(out_fp, out_bad)
    with np.load(f"{out_bad}/weights.npz") as z:
        flat = {k: z[k] for k in z.files}
    wkey = next(k for k in flat if k.startswith("params/") and flat[k].ndim >= 2)
    flat[wkey] = flat[wkey] * 40.0
    np.savez(f"{out_bad}/weights.npz", **flat)
    problems = ServingModel(out_bad).selftest()
    assert problems, "corrupted weights must fail the selftest"

    # cli.serve --selftest: exit 3 on the corrupted artifact, serves the
    # clean one.
    from cvm_tpu.cli.serve import main as serve_main

    assert serve_main(["--artifact", out_bad, "--selftest",
                       "--records", "unused"]) == 3


def test_decode_3d_backprojection(rng):
    import jax.numpy as jnp

    from cvm_tpu.ops.decode import decode_centernet_3d

    Hs = Ws = 16
    stride = 4
    hm = jnp.zeros((1, Hs, Ws, 1)).at[0, 8, 10, 0].set(1.0)
    off = jnp.zeros((1, Hs, Ws, 2))
    sz = jnp.ones((1, Hs, Ws, 2))
    # depth head value for Z=20: logit = -log(1/sigmoid_inv)… use inverse:
    # z = 1/sigmoid(x) - 1 → sigmoid(x) = 1/(z+1) → x = log(1/(z+1)/(1-1/(z+1)))
    import numpy as np

    Z = 20.0
    s = 1.0 / (Z + 1.0)
    x = float(np.log(s / (1 - s)))
    dep = jnp.full((1, Hs, Ws, 1), x)
    dims = jnp.broadcast_to(jnp.asarray([1.5, 1.6, 3.9]), (1, Hs, Ws, 3))
    rot = jnp.zeros((1, Hs, Ws, 2)).at[..., 1].set(1.0)  # yaw 0
    intr = jnp.asarray([[100.0, 100.0, 32.0, 32.0]])

    d3 = decode_centernet_3d(hm, off, sz, dep, dims, rot, intr, stride=stride,
                             top_k=3, from_logits=False)
    c = np.asarray(d3.centers3d[0, 0])
    # center pixel u = (10)*4 = 40 → X = (40-32)*20/100 = 1.6
    assert c[2] == pytest.approx(Z, rel=1e-4)
    assert c[0] == pytest.approx((40 - 32) * Z / 100.0, rel=1e-4)
    assert np.asarray(d3.yaw[0, 0]) == pytest.approx(0.0, abs=1e-6)
    assert np.asarray(d3.dims[0, 0]) == pytest.approx([1.5, 1.6, 3.9])


def test_export_yuv420_serving_roundtrip(tmp_path, rng):
    """The yuv420 artifact serves the same predictions as the rgb one."""
    import itertools

    import numpy as np

    from cvm_tpu.cli.export import export_model
    from cvm_tpu.data.synthetic import synthetic_batch
    from cvm_tpu.infer.runtime import ServingModel
    from cvm_tpu.models import get_model
    from cvm_tpu.native import _rgb_to_yuv420_np
    from cvm_tpu.train.loop import Trainer

    spec = get_model("semseg")
    p = spec.params_cls(input_hw=(32, 32), num_classes=3, backbone="tiny",
                        decoder_features=16, class_weights=(1.0, 1.0, 1.0),
                        batch_size=8, warmup_steps=1, total_steps=10)
    ckdir = str(tmp_path / "ck")
    tr = Trainer(spec, p, checkpoint_dir=ckdir, checkpoint_every=30, log_every=10)
    tr.init_state()
    pool = [synthetic_batch(np.random.default_rng(0), 8, (48, 48), num_classes=3)]
    # Overfit the one batch so logits are confident — a near-random model's
    # tied argmax would flip on the ~1/255 yuv-vs-rgb numeric difference.
    tr.fit(itertools.cycle(pool), 30)
    tr.ckpt.wait()

    out_rgb = str(tmp_path / "art_rgb")
    out_yuv = str(tmp_path / "art_yuv")
    export_model("semseg", ckdir, out_rgb, batch_size=1)
    stats = export_model("semseg", ckdir, out_yuv, batch_size=1, input_format="yuv420")
    assert stats["input_format"] == "yuv420"

    from cvm_tpu.data.synthetic import synthetic_sample

    # A scene like the training data (flat-color rectangles), not per-pixel
    # noise — 4:2:0 chroma subsampling of noise is not meaningful input.
    img = synthetic_sample(np.random.default_rng(1), (48, 48), num_classes=3)["image"]
    hw = np.asarray([[48, 48]], np.int32)
    y, u, v = _rgb_to_yuv420_np(img)

    m_rgb = ServingModel(out_rgb)
    m_yuv = ServingModel(out_yuv)
    assert m_rgb.input_format == "rgb" and m_yuv.input_format == "yuv420"
    cm_rgb = np.asarray(m_rgb(img[None], hw)["class_map"])
    cm_yuv = np.asarray(m_yuv(y[None], u[None], v[None], hw)["class_map"])
    assert cm_yuv.shape == (1, 32, 32)
    # 4:2:0 chroma subsampling perturbs colors slightly; argmax must agree
    # on nearly every pixel.
    assert (cm_rgb == cm_yuv).mean() > 0.85


def test_export_w8a8_full_integer_artifact(tmp_path, rng):
    """--quantize w8a8 bakes calibrated int8 compute into the StableHLO
    program; the served outputs stay close to the fp artifact's."""
    from cvm_tpu.cli.export import export_model
    from cvm_tpu.data.synthetic import synthetic_batch
    from cvm_tpu.infer.runtime import ServingModel
    from cvm_tpu.models import get_model
    from cvm_tpu.train.loop import Trainer

    spec = get_model("semseg")
    p = spec.params_cls(input_hw=(32, 32), num_classes=3, backbone="tiny",
                        decoder_features=16, class_weights=(1.0, 1.0, 1.0),
                        batch_size=8, warmup_steps=1, total_steps=10)
    ckdir = str(tmp_path / "ck")
    tr = Trainer(spec, p, checkpoint_dir=ckdir, checkpoint_every=1, log_every=1)
    tr.init_state()
    import itertools

    pool = [synthetic_batch(np.random.default_rng(0), 8, (48, 48), num_classes=3)]
    tr.fit(itertools.cycle(pool), 1)
    tr.ckpt.wait()

    out_fp = str(tmp_path / "art_fp")
    export_model("semseg", ckdir, out_fp, batch_size=1)
    out_w = str(tmp_path / "art_w8a8")
    wstats = export_model("semseg", ckdir, out_w, batch_size=1, quantize="w8a8")
    assert wstats["calibrated_convs"] > 5

    img = np.random.default_rng(1).integers(0, 255, (1, 48, 48, 3), dtype=np.uint8)
    hw = np.asarray([[40, 44]], np.int32)
    cm_fp = np.asarray(ServingModel(out_fp)(img, hw)["class_map"])
    cm_w = np.asarray(ServingModel(out_w)(img, hw)["class_map"])
    assert (cm_fp == cm_w).mean() > 0.9


@pytest.mark.slow
def test_deferred_selftest_pins_on_first_run(tmp_path, rng):
    """A cross-platform export records selftest as deferred; the first
    successful ServingModel.selftest() computes and PINS the fingerprint
    (verified live on-chip for the fused artifact 2026-08-20), and later
    runs verify against it."""
    import json as _json

    from cvm_tpu.cli.export import export_model
    from cvm_tpu.data.synthetic import synthetic_batch
    from cvm_tpu.infer.runtime import ServingModel
    from cvm_tpu.models import get_model
    from cvm_tpu.train.loop import Trainer

    spec = get_model("semseg")
    p = spec.params_cls(input_hw=(32, 32), num_classes=3, backbone="tiny",
                        decoder_features=16, class_weights=(1.0, 1.0, 1.0),
                        batch_size=8, warmup_steps=1, total_steps=10)
    ckdir = str(tmp_path / "ck")
    tr = Trainer(spec, p, checkpoint_dir=ckdir, checkpoint_every=1, log_every=1)
    tr.init_state()
    import itertools

    pool = [synthetic_batch(np.random.default_rng(0), 8, (48, 48), num_classes=3)]
    tr.fit(itertools.cycle(pool), 1)
    tr.ckpt.wait()
    out = str(tmp_path / "art")
    export_model("semseg", ckdir, out, batch_size=1)
    # Simulate the cross-platform case: strip the recorded fingerprint.
    meta = _json.load(open(f"{out}/artifact.json"))
    meta["selftest"] = {"seed": meta["selftest"]["seed"], "with_3d": False,
                        "deferred": "test"}
    _json.dump(meta, open(f"{out}/artifact.json", "w"))

    m = ServingModel(out)
    assert m.selftest() == []  # first run pins
    pinned = _json.load(open(f"{out}/artifact.json"))["selftest"]
    assert "outputs" in pinned and "deferred" not in pinned
    assert ServingModel(out).selftest() == []  # second run verifies


@pytest.mark.slow
@pytest.mark.parametrize("qmode", ["w8a8_fused", "w8a8_fused_chain"])
def test_export_w8a8_fused_cross_platform_from_cpu(tmp_path, rng, qmode):
    """--quantize w8a8_fused on a CPU host cross-platform-lowers the REAL
    Mosaic kernel for TPU (conversion is a host job — the edgetpu_compiler
    analogue): the artifact records platforms=('tpu',), embeds
    tpu_custom_call (never the interpreter's emulation), and defers the
    selftest fingerprint to first TPU deployment (DESIGN.md §9c)."""
    import json as _json

    from cvm_tpu.cli.export import export_model
    from cvm_tpu.data.synthetic import synthetic_batch
    from cvm_tpu.models import get_model
    from cvm_tpu.train.loop import Trainer

    spec = get_model("semseg")
    p = spec.params_cls(input_hw=(32, 32), num_classes=3, backbone="tiny",
                        decoder_features=16, class_weights=(1.0, 1.0, 1.0),
                        batch_size=8, warmup_steps=1, total_steps=10)
    ckdir = str(tmp_path / "ck")
    tr = Trainer(spec, p, checkpoint_dir=ckdir, checkpoint_every=1, log_every=1)
    tr.init_state()
    import itertools

    pool = [synthetic_batch(np.random.default_rng(0), 8, (48, 48), num_classes=3)]
    tr.fit(itertools.cycle(pool), 1)
    tr.ckpt.wait()
    out = str(tmp_path / "art_fused")
    stats = export_model("semseg", ckdir, out, batch_size=1, quantize=qmode)
    assert stats["platforms"] == ["tpu"]
    assert stats["calibrated_convs"] > 5
    meta = _json.load(open(f"{out}/artifact.json"))
    assert "deferred" in meta["selftest"]
    blob = open(f"{out}/model.stablehlo", "rb").read()
    assert b"tpu_custom_call" in blob  # the real kernel, not the emulation


def test_export_dmds_yuv420(tmp_path, rng):
    """Two-frame dmds exports on the yuv420 wire format (7 data args)."""
    from cvm_tpu.cli.export import export_model
    from cvm_tpu.infer.runtime import ServingModel
    from cvm_tpu.models import get_model
    from cvm_tpu.train.loop import Trainer

    spec = get_model("dmds")
    p = spec.params_cls(input_hw=(32, 32), backbone="tiny", decoder_features=16,
                        motion_features=32, batch_size=8, warmup_steps=1,
                        total_steps=10)
    ckdir = str(tmp_path / "ck")
    tr = Trainer(spec, p, checkpoint_dir=ckdir, checkpoint_every=1, log_every=1)
    tr.init_state()
    from cvm_tpu.data.synthetic import synthetic_batch
    import itertools, jax

    pool = [synthetic_batch(np.random.default_rng(0), 8, (48, 48), num_classes=3,
                            two_frame=True)]
    tr.fit(itertools.cycle(pool), 1)
    tr.ckpt.wait()

    out = str(tmp_path / "art_dmds_yuv")
    stats = export_model("dmds", ckdir, out, batch_size=1, input_format="yuv420",
                         pad_hw=(48, 48))
    assert stats["stablehlo_bytes"] > 1000

    b = synthetic_batch(np.random.default_rng(2), 1, (48, 48), num_classes=3,
                        two_frame=True, yuv420=True)
    m = ServingModel(out)
    res = m(b["y"], b["u"], b["v"], b["y_t1"], b["u_t1"], b["v_t1"], b["image_hw"])
    assert np.asarray(res["depth"]).shape == (1, 32, 32, 1)
    assert np.isfinite(np.asarray(res["depth"])).all()


def test_cli_serve_artifact_over_records(tmp_path, rng, capsys):
    """cli.serve streams a .cvrec through an exported artifact (no zoo code)."""
    import io
    import itertools
    import json as _json

    from PIL import Image

    from cvm_tpu.cli.export import export_model
    from cvm_tpu.cli.serve import main as serve_main
    from cvm_tpu.data.records import RecordWriter
    from cvm_tpu.data.synthetic import synthetic_batch
    from cvm_tpu.models import get_model
    from cvm_tpu.train.loop import Trainer

    spec = get_model("semseg")
    p = spec.params_cls(input_hw=(32, 32), num_classes=3, backbone="tiny",
                        decoder_features=16, class_weights=(1.0, 1.0, 1.0),
                        batch_size=8, warmup_steps=1, total_steps=10)
    ckdir = str(tmp_path / "ck")
    tr = Trainer(spec, p, checkpoint_dir=ckdir, checkpoint_every=1, log_every=1)
    tr.init_state()
    pool = [synthetic_batch(np.random.default_rng(0), 8, (48, 48), num_classes=3)]
    tr.fit(itertools.cycle(pool), 1)
    tr.ckpt.wait()
    art = str(tmp_path / "art")
    export_model("semseg", ckdir, art, batch_size=2, pad_hw=(48, 48))

    rec = str(tmp_path / "serve.cvrec")
    with RecordWriter(rec) as w:
        for i in range(4):
            img = rng.integers(0, 255, (40, 44, 3), dtype=np.uint8)
            b = io.BytesIO()
            Image.fromarray(img).save(b, format="JPEG", quality=90)
            w.write({"id": f"s{i}"}, {"jpeg": b.getvalue()})

    serve_main(["--artifact", art, "--records", rec])
    lines = [l for l in capsys.readouterr().out.splitlines() if l.strip()]
    recs = [_json.loads(l) for l in lines]
    assert len(recs) == 4
    assert all("class_histogram" in r for r in recs)


def test_multi_batch_bucket_artifact(tmp_path, rng):
    """--batch_sizes exports one program per bucket; the runtime serves ANY
    request batch: exact-bucket hits run direct, short batches pad to the
    smallest fitting bucket, oversize batches chunk through the largest —
    and every row matches the per-row single-bucket result."""
    import itertools

    from cvm_tpu.cli.export import export_model
    from cvm_tpu.data.synthetic import synthetic_batch
    from cvm_tpu.infer.runtime import ServingModel
    from cvm_tpu.models import get_model
    from cvm_tpu.train.loop import Trainer

    spec = get_model("semseg")
    p = spec.params_cls(input_hw=(32, 32), num_classes=3, backbone="tiny",
                        decoder_features=16, class_weights=(1.0, 1.0, 1.0),
                        batch_size=8, warmup_steps=1, total_steps=10)
    ckdir = str(tmp_path / "ck")
    tr = Trainer(spec, p, checkpoint_dir=ckdir, checkpoint_every=1, log_every=1)
    tr.init_state()
    pool = [synthetic_batch(np.random.default_rng(0), 8, (48, 48), num_classes=3)]
    tr.fit(itertools.cycle(pool), 1)
    tr.ckpt.wait()

    out = str(tmp_path / "art_buckets")
    stats = export_model("semseg", ckdir, out, batch_sizes=[1, 2])
    assert stats["stablehlo_bytes"] > 1000
    import os as _os

    assert _os.path.exists(f"{out}/model_b1.stablehlo")
    assert _os.path.exists(f"{out}/model_b2.stablehlo")

    m = ServingModel(out)
    assert m.bucket_sizes == [1, 2]
    assert m.meta["batch_sizes"] == [1, 2]
    assert m.selftest() == []  # fingerprint ran on the primary (b2) program

    g = np.random.default_rng(3)
    img = g.integers(0, 255, (5, 48, 48, 3), dtype=np.uint8)
    hw = np.asarray([[40, 44], [48, 48], [33, 47], [40, 40], [44, 36]], np.int32)

    # Per-row oracle through the exact b1 bucket.
    rows = [np.asarray(m(img[i:i + 1], hw[i:i + 1])["class_map"])[0]
            for i in range(5)]

    for B in (1, 2, 3, 5):  # exact bucket, primary, pad-to-2+chunk, chunk x3
        out_b = np.asarray(m(img[:B], hw[:B])["class_map"])
        assert out_b.shape == (B, 32, 32)
        for i in range(B):
            np.testing.assert_array_equal(out_b[i], rows[i])

    # Re-export into the SAME dir without --batch_sizes: stale bucket
    # programs must be deleted, or ServingModel would silently serve the
    # OLD programs against the NEW weights (the folded/unfolded-mix hazard).
    export_model("semseg", ckdir, out, batch_size=1)
    import glob as _glob

    assert _glob.glob(f"{out}/model_b*.stablehlo") == []
    m2 = ServingModel(out)
    assert m2.bucket_sizes == []
    assert np.asarray(m2(img[:1], hw[:1])["class_map"]).shape == (1, 32, 32)


def test_evaluate_artifact_scores_the_serialized_export(tmp_path, capsys):
    """cli.evaluate --artifact: the metric pipeline drives the StableHLO
    program + shipped weights through the ServingModel load path, and the
    score matches the checkpoint-path evaluation of the same weights."""
    import itertools
    import json as _json

    from cvm_tpu.cli.evaluate import main as eval_main
    from cvm_tpu.cli.export import export_model
    from cvm_tpu.data.synthetic import synthetic_batch
    from cvm_tpu.models import get_model
    from cvm_tpu.train.loop import Trainer

    spec = get_model("semseg")
    p = spec.params_cls(input_hw=(32, 32), num_classes=3, backbone="tiny",
                        decoder_features=16, class_weights=(1.0, 1.0, 1.0),
                        batch_size=8, warmup_steps=1, total_steps=10)
    wd = str(tmp_path)
    ckdir = str(tmp_path / "checkpoints")
    tr = Trainer(spec, p, checkpoint_dir=ckdir, checkpoint_every=3,
                 log_every=3)
    tr.init_state()
    pool = [synthetic_batch(np.random.default_rng(i), 8, (48, 48),
                            num_classes=3) for i in range(2)]
    tr.fit(itertools.cycle(pool), 3)
    tr.ckpt.wait()

    art = str(tmp_path / "art")
    export_model("semseg", ckdir, art, batch_size=8, pad_hw=(48, 48))

    def run(*argv):
        rc = eval_main(list(argv))
        assert rc == 0
        lines = [ln for ln in capsys.readouterr().out.splitlines()
                 if ln.startswith("[cvm_tpu] eval ")]
        return _json.loads(lines[-1].split(": ", 1)[1])

    ckpt_m = run("--model", "semseg", "--workdir", wd,
                 "--batches", "2", "--pad_hw", "48,48")
    art_m = run("--artifact", art, "--batches", "2")
    assert art_m["miou"] == pytest.approx(ckpt_m["miou"], abs=0.02)

    # The production wire format scores through the same path: a yuv420
    # export is evaluated on yuv420-plane batches (chroma subsampling is
    # lossy, so allow a small drift vs the rgb program).
    art_yuv = str(tmp_path / "art_yuv")
    export_model("semseg", ckdir, art_yuv, batch_size=8, pad_hw=(48, 48),
                 input_format="yuv420")
    yuv_m = run("--artifact", art_yuv, "--batches", "2")
    assert yuv_m["miou"] == pytest.approx(art_m["miou"], abs=0.1)

    # Baked-in choices cannot be re-specified against an artifact.
    with pytest.raises(SystemExit):
        eval_main(["--artifact", art, "--quantize", "w8a8"])
    # Artifacts are self-describing; a wrong --model is caught.
    with pytest.raises(SystemExit):
        eval_main(["--artifact", art, "--model", "centernet"])


@pytest.mark.slow
def test_evaluate_artifact_special_signatures(tmp_path, capsys):
    """Artifact evaluation matches cli.export's trace signature for the two
    non-trivial cases: two-frame dmds (extra image_t1 input + median-scaled
    depth metrics) and with_3d centernet (appended intrinsics input)."""
    import itertools
    import json as _json

    from cvm_tpu.cli.evaluate import main as eval_main
    from cvm_tpu.cli.export import export_model
    from cvm_tpu.data.synthetic import synthetic_batch
    from cvm_tpu.models import get_model
    from cvm_tpu.train.loop import Trainer

    def train_tiny(name, **kw):
        spec = get_model(name)
        p = spec.params_cls(input_hw=(32, 32), backbone="tiny", batch_size=8,
                            warmup_steps=1, total_steps=10, **kw)
        ckdir = str(tmp_path / name / "checkpoints")
        tr = Trainer(spec, p, checkpoint_dir=ckdir, checkpoint_every=2,
                     log_every=2)
        tr.init_state()
        pool = [synthetic_batch(np.random.default_rng(i), 8, (48, 48),
                                num_classes=3,
                                two_frame=(name == "dmds"),
                                with_3d=bool(kw.get("with_3d")))
                for i in range(2)]
        tr.fit(itertools.cycle(pool), 2)
        tr.ckpt.wait()
        return ckdir

    def run(*argv):
        rc = eval_main(list(argv))
        assert rc == 0
        lines = [ln for ln in capsys.readouterr().out.splitlines()
                 if ln.startswith("[cvm_tpu] eval ")]
        return _json.loads(lines[-1].split(": ", 1)[1])

    # Two-frame dmds: image + image_t1 through the serialized program.
    ck = train_tiny("dmds")
    art = str(tmp_path / "dmds_art")
    export_model("dmds", ck, art, batch_size=8, pad_hw=(48, 48))
    m = run("--artifact", art, "--batches", "1")
    assert any("delta" in k for k in m), m

    # with_3d centernet: the appended per-image intrinsics input.
    ck = train_tiny("centernet", num_classes=3, with_3d=True)
    art = str(tmp_path / "cn3d_art")
    export_model("centernet", ck, art, batch_size=8, pad_hw=(48, 48))
    m = run("--artifact", art, "--batches", "1")
    assert "mAP" in m, m

    # ServingModel.predict_batch (the shared consumer adapter used by
    # cli.evaluate/infer/video): a partial batch WITHOUT intrinsics must
    # serve — bare images/video frames carry no camera K, so the adapter
    # defaults to the identity camera — and outputs trim to the true rows.
    from cvm_tpu.infer.runtime import ServingModel

    sm = ServingModel(art)
    g = np.random.default_rng(7)
    out = sm.predict_batch({
        "image": g.integers(0, 255, (3, 48, 48, 3), dtype=np.uint8),
        "image_hw": np.asarray([[48, 48]] * 3, np.int32),
    })
    assert out["boxes"].shape[0] == 3 and "centers3d" in out
