"""InferencePipeline e2e coverage for every zoo model (untrained weights)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cvm_tpu.data.synthetic import synthetic_batch
from cvm_tpu.infer.pipeline import InferencePipeline
from cvm_tpu.models import get_model


def _variables(spec, p, channels=3):
    model = spec.create_model(p)
    return model.init(
        jax.random.PRNGKey(0), np.zeros((1, *p.input_hw, channels), np.float32), train=False
    )


@pytest.mark.parametrize("name", ["centernet", "semseg", "depth", "multitask"])
def test_pipeline_single_frame_models(name, rng):
    spec = get_model(name)
    kw = dict(input_hw=(64, 64), backbone="tiny")
    if name == "centernet":
        kw.update(num_classes=3, neck_features=32, head_features=16, top_k=10)
    elif name == "semseg":
        kw.update(num_classes=3, decoder_features=16)
    elif name == "depth":
        kw.update(decoder_features=16, num_scales=1)
    else:
        kw.update(num_det_classes=3, neck_features=32, head_features=16, top_k=10)
    p = spec.params_cls(**kw)
    pipe = InferencePipeline(spec, p, _variables(spec, p))
    batch = synthetic_batch(np.random.default_rng(0), 2, (96, 96), num_classes=3)
    out = pipe(batch)
    for k, v in out.items():
        assert np.isfinite(np.asarray(v, dtype=np.float64)).all(), f"{name}:{k} not finite"
    if name in ("centernet", "multitask"):
        assert out["boxes"].shape == (2, 10, 4)
    if name in ("semseg", "multitask"):
        assert out["class_map"].shape == (2, 64, 64)
    if name in ("depth", "multitask"):
        assert out["depth"].shape == (2, 64, 64, 1)


def test_pipeline_centernet_3d_serving(rng):
    """with_3d configs decode metric camera-frame boxes inside the jitted
    program (intrinsics mapped through the same ROI as the image)."""
    spec = get_model("centernet")
    p = spec.params_cls(input_hw=(64, 64), backbone="tiny", num_classes=3,
                        neck_features=32, head_features=16, top_k=10,
                        with_3d=True)
    pipe = InferencePipeline(spec, p, _variables(spec, p))
    batch = synthetic_batch(np.random.default_rng(0), 2, (96, 96), num_classes=3,
                            with_3d=True)
    assert "intrinsics" in batch
    out = pipe(batch)
    assert out["centers3d"].shape == (2, 10, 3)
    assert out["dims"].shape == (2, 10, 3)
    assert out["yaw"].shape == (2, 10)
    assert np.isfinite(np.asarray(out["centers3d"])).all()
    # Depths decode positive (1/sigmoid - 1 parameterization).
    assert (np.asarray(out["centers3d"])[..., 2] > 0).all()

    # 3D wireframe rendering path (host side) runs on the same outputs.
    import tempfile, os
    from cvm_tpu.infer.visualize import render_sample

    with tempfile.TemporaryDirectory() as td:
        path = os.path.join(td, "r.png")
        vis = {k: np.asarray(v[0]) for k, v in out.items()}
        vis["intrinsics"] = np.asarray(batch["intrinsics"][0])
        render_sample(path, batch["image"][0], batch["image_hw"][0], vis,
                      score_threshold=-1.0)  # draw regardless of confidence
        assert os.path.getsize(path) > 0


@pytest.mark.slow
def test_pipeline_dmds_two_frame(rng):
    spec = get_model("dmds")
    p = spec.params_cls(input_hw=(64, 64), backbone="tiny", decoder_features=16,
                        motion_features=32)
    pipe = InferencePipeline(spec, p, _variables(spec, p, channels=6))
    batch = synthetic_batch(np.random.default_rng(0), 2, (96, 96), num_classes=3,
                            two_frame=True)
    out = pipe(batch)
    assert out["depth"].shape == (2, 64, 64, 1)
    assert out["rotation"].shape == (2, 3)
    assert out["translation"].shape == (2, 3)
    d = np.asarray(out["depth"])
    assert (d >= p.min_depth - 1e-3).all() and (d <= p.max_depth + 1e-3).all()
