"""Tiled (sliding-window) inference (infer/tiled.py).

Properties pinned:
1. The tile grid covers every pixel, clamps the last tile to the border,
   and respects the overlap fraction.
2. Stitching is EXACT for a per-pixel function: blending identical
   overlapping values must reproduce the direct result everywhere (the Hann
   weights cancel) — for divisible, non-divisible, odd, and
   smaller-than-tile image sizes.
3. A real zoo model (semseg tiny) stitches an arbitrary-resolution image to
   a full-size map with sane outputs; detection configs are rejected.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from cvm_tpu.infer.tiled import tile_positions, tiled_apply, tiled_predict


def test_tile_positions_cover_and_clamp():
    for full, tile, overlap in [(100, 32, 0.25), (64, 64, 0.5), (65, 64, 0.25),
                                (33, 32, 0.0), (200, 50, 0.33), (7, 32, 0.25)]:
        pos = tile_positions(full, tile, overlap)
        assert pos[0] == 0
        if tile < full:
            assert pos[-1] == full - tile  # clamped to the border
            covered = np.zeros(full, bool)
            for p in pos:
                covered[p:p + tile] = True
            assert covered.all(), (full, tile, overlap, pos)
            stride = max(1, int(round(tile * (1.0 - overlap))))
            assert all(b - a <= stride for a, b in zip(pos, pos[1:]))
        else:
            assert pos == [0]


@pytest.mark.parametrize("hw", [(64, 96), (70, 45), (31, 33), (8, 200)])
def test_stitching_exact_for_pointwise_fn(hw):
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.normal(size=(*hw, 3)).astype(np.float32))
    out = tiled_apply(lambda t: t * 2.0 + 1.0, img, tile_hw=(32, 32),
                      overlap=0.25, tile_batch=4)
    assert out.shape == (*hw, 3)
    np.testing.assert_allclose(np.asarray(out), np.asarray(img) * 2.0 + 1.0,
                               rtol=1e-5, atol=1e-5)


def test_tiled_apply_rejects_resolution_changing_fn():
    img = jnp.zeros((64, 64, 3), jnp.float32)
    with pytest.raises(ValueError, match="same-resolution"):
        tiled_apply(lambda t: t[:, ::2, ::2], img, tile_hw=(32, 32))


def test_tiled_apply_rejects_bad_overlap():
    """overlap < 0 would leave uncovered 0/0 NaN pixels; >= 1 clamps the
    stride to 1px (tile-count explosion). Both must fail loudly."""
    img = jnp.zeros((64, 64, 3), jnp.float32)
    for bad in (-0.1, 1.0, 1.5):
        with pytest.raises(ValueError, match="overlap"):
            tiled_apply(lambda t: t, img, tile_hw=(32, 32), overlap=bad)


def test_tiled_predict_multitask_single_forward_per_tile():
    """Multitask stitches BOTH dense heads from one forward per tile
    (channel-concat + split), not one full forward per key."""
    import jax

    from cvm_tpu.models import get_model

    spec = get_model("multitask")
    p = spec.params_cls(input_hw=(32, 32), num_seg_classes=3, backbone="tiny",
                        neck_features=16, head_features=8,
                        class_weights=(1.0, 1.0, 1.0))
    model = spec.create_model(p)
    variables = model.init(jax.random.PRNGKey(0),
                           np.zeros((1, 32, 32, 3), np.float32), train=False)
    img = np.random.default_rng(3).integers(0, 255, (48, 70, 3), np.uint8)

    calls = []
    orig_apply = type(model).apply

    def counting_apply(self, *a, **kw):
        calls.append(1)
        return orig_apply(self, *a, **kw)

    from unittest import mock

    with mock.patch.object(type(model), "apply", counting_apply):
        out = tiled_predict(spec, p, variables, img, tile_batch=4)
    assert out["logits"].shape == (48, 70, 3)
    assert out["depth"].shape == (48, 70, 1)
    assert out["class_map"].shape == (48, 70)
    assert np.isfinite(np.asarray(out["logits"])).all()
    # 48x70 with 32x32 tiles @ 0.25 overlap -> 2x3 grid = 6 tiles = 2 chunks
    # of tile_batch 4; ONE traced forward total (jit traces once), not one
    # per dense key.
    assert sum(calls) == 1


def test_tiled_predict_semseg_arbitrary_resolution():
    import jax

    from cvm_tpu.models import get_model

    spec = get_model("semseg")
    p = spec.params_cls(input_hw=(32, 32), num_classes=3, backbone="tiny",
                        decoder_features=16, class_weights=(1.0, 1.0, 1.0))
    model = spec.create_model(p)
    variables = model.init(jax.random.PRNGKey(0),
                           np.zeros((1, 32, 32, 3), np.float32), train=False)
    img = np.random.default_rng(1).integers(0, 255, (80, 112, 3), np.uint8)
    out = tiled_predict(spec, p, variables, img, tile_batch=4)
    assert out["logits"].shape == (80, 112, 3)
    assert out["class_map"].shape == (80, 112)
    assert np.isfinite(np.asarray(out["logits"])).all()
    assert set(np.unique(np.asarray(out["class_map"]))) <= {0, 1, 2}


def test_tiled_predict_depth_and_detection_rejection():
    import jax

    from cvm_tpu.models import get_model

    spec = get_model("depth")
    p = spec.params_cls(input_hw=(32, 32), backbone="tiny",
                        decoder_features=16, num_scales=1)
    model = spec.create_model(p)
    variables = model.init(jax.random.PRNGKey(0),
                           np.zeros((1, 32, 32, 3), np.float32), train=False)
    img = np.random.default_rng(2).integers(0, 255, (48, 70, 3), np.uint8)
    out = tiled_predict(spec, p, variables, img, tile_batch=4)
    assert out["depth"].shape == (48, 70, 1)
    assert (np.asarray(out["depth"]) > 0).all()  # sigmoid-disparity range

    cn = get_model("centernet")
    cp = cn.params_cls(input_hw=(32, 32), num_classes=3, backbone="tiny",
                       neck_features=16, head_features=8)
    with pytest.raises(ValueError, match="dense-prediction"):
        tiled_predict(cn, cp, {}, img)
