"""Export-time BatchNorm folding (infer/fold_bn.py).

The folded program must reproduce the unfolded inference numerics: exactly
(fp32) on a single ConvBN block, to bf16 tolerance on a full model, and
through the real export → ServingModel artifact path."""

import itertools

import numpy as np
import pytest


def test_fold_single_convbn_exact(rng):
    import jax
    import jax.numpy as jnp

    from cvm_tpu.infer.fold_bn import bn_folded_inference, fold_batchnorm
    from cvm_tpu.models.layers import ConvBN

    mod = ConvBN(features=8, kernel=3, act=None, dtype=jnp.float32)
    x0 = jnp.asarray(rng.normal(size=(2, 8, 8, 4)), jnp.float32)
    variables = mod.init(jax.random.PRNGKey(0), x0, train=True)
    # Non-trivial running statistics: a few train-mode applies.
    for i in range(3):
        xt = jnp.asarray(rng.normal(loc=i, scale=2.0, size=(2, 8, 8, 4)),
                         jnp.float32)
        _, upd = mod.apply(variables, xt, train=True, mutable=["batch_stats"])
        variables = {"params": variables["params"], **upd}

    ref = mod.apply(variables, x0, train=False)
    folded, table = fold_batchnorm(variables)
    assert list(table) == ["bn"] and table["bn"].shape == (8,)
    with bn_folded_inference(table):
        got = mod.apply(folded, x0, train=False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.slow
def test_fold_full_model_close(rng):
    import jax

    from cvm_tpu.infer.fold_bn import bn_folded_inference, fold_batchnorm
    from cvm_tpu.models import get_model
    from cvm_tpu.models.registry import build_model

    spec = get_model("centernet")
    cfg = spec.params_cls(input_hw=(32, 32), num_classes=3, backbone="tiny",
                          neck_features=16, head_features=8, batch_size=2)
    model = build_model(spec, cfg)
    import jax.numpy as jnp

    x = jnp.asarray(rng.normal(size=(2, 32, 32, 3)), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x, train=True)

    ref = model.apply(variables, x, train=False)
    folded, table = fold_batchnorm(variables)
    # Every ConvBN in the tiny trunk must have been matched.
    assert len(table) >= 5
    with bn_folded_inference(table):
        got = model.apply(folded, x, train=False)
    for k in ref:
        np.testing.assert_allclose(
            np.asarray(got[k], np.float32), np.asarray(ref[k], np.float32),
            rtol=0.05, atol=0.05,  # bf16 compute; fold reorders roundings
        )


@pytest.mark.slow
def test_export_fold_bn_artifact(tmp_path, rng):
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

    out_fp = str(tmp_path / "art_fp")
    out_fold = str(tmp_path / "art_fold")
    export_model("semseg", ckdir, out_fp, batch_size=1)
    stats = export_model("semseg", ckdir, out_fold, batch_size=1, fold_bn=True)
    assert stats["stablehlo_bytes"] > 1000

    img = np.random.default_rng(1).integers(0, 255, (1, 48, 48, 3), dtype=np.uint8)
    hw = np.asarray([[40, 44]], np.int32)
    m_fp = ServingModel(out_fp)
    m_fold = ServingModel(out_fold)
    assert m_fold.meta["fold_bn"] is True
    cm_fp = np.asarray(m_fp(img, hw)["class_map"])
    cm_fold = np.asarray(m_fold(img, hw)["class_map"])
    assert (cm_fp == cm_fold).mean() > 0.95  # fold barely perturbs argmax
    # The folded program must be smaller or equal in op count terms — at
    # minimum it must not have BN normalization reading batch_stats: wiping
    # the running stats in the folded artifact must not change its output.
    import os

    z = np.load(os.path.join(out_fold, "weights.npz"))
    wiped = {k: (np.full_like(z[k], 7.7) if k.startswith("batch_stats")
                 and z[k].dtype.kind == "f" else z[k]) for k in z.files}
    np.savez(os.path.join(out_fold, "weights.npz"), **wiped)
    cm_wiped = np.asarray(ServingModel(out_fold)(img, hw)["class_map"])
    np.testing.assert_array_equal(cm_wiped, cm_fold)


@pytest.mark.slow
def test_export_cli_fold_defaults(tmp_path):
    """Round-4 measured defaults (DESIGN §8/§9b): the export CLI folds BN
    for fp artifacts (−14.6% model-stage HBM traffic, accuracy-free) and
    ships UNFOLDED kernels for --quantize artifacts (folding coarsens the
    int8 grid); --no_fold_bn/--fold_bn override."""
    import json
    import os

    from cvm_tpu.cli.export import main as export_main
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

    def meta(out, *extra):
        rc = export_main(["--model", "semseg", "--checkpoint_dir", ckdir,
                          "--out", out, *extra])
        assert rc == 0
        with open(os.path.join(out, "artifact.json")) as f:
            return json.load(f)

    assert meta(str(tmp_path / "fp"))["fold_bn"] is True
    assert meta(str(tmp_path / "q"), "--quantize", "int8")["fold_bn"] is False
    assert meta(str(tmp_path / "fp_u"), "--no_fold_bn")["fold_bn"] is False
