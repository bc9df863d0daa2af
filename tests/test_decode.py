"""Detection decode: GT render → decode roundtrip recovers the boxes."""

import jax
import jax.numpy as jnp
import numpy as np

from cvm_tpu.ops.decode import (
    colorize_semseg,
    decode_centernet,
    semseg_argmax,
    upsample_bilinear,
)
from cvm_tpu.ops.heatmap import render_centernet_targets


def test_decode_roundtrip_recovers_gt_boxes(rng):
    """Render perfect GT maps, decode them, expect the original boxes back."""
    Hs, Ws, C, stride = 32, 32, 3, 4
    boxes = np.array(
        [[2.0, 3.0, 12.0, 13.0], [18.25, 20.5, 28.75, 30.0], [5.0, 20.0, 11.0, 30.0]],
        np.float32,
    )
    classes = np.array([0, 2, 1], np.int32)
    K = 8
    b = np.zeros((K, 4), np.float32)
    c = np.zeros(K, np.int32)
    v = np.zeros(K, bool)
    b[:3], c[:3], v[:3] = boxes, classes, True

    t = render_centernet_targets(jnp.asarray(b), jnp.asarray(c), jnp.asarray(v), (Hs, Ws), C)
    det = decode_centernet(
        t.heatmap[None], t.offset[None], t.size[None], stride=stride, top_k=10, from_logits=False
    )
    scores = np.asarray(det.scores[0])
    got_boxes = np.asarray(det.boxes[0])[scores > 0.9]
    got_cls = np.asarray(det.classes[0])[scores > 0.9]
    assert len(got_boxes) == 3
    # Match each GT box (input-pixel coords = output coords * stride).
    want = boxes * stride
    order = np.argsort(got_boxes[:, 0])
    worder = np.argsort(want[:, 0])
    np.testing.assert_allclose(got_boxes[order], want[worder], atol=1e-3)
    assert set(got_cls.tolist()) == set(classes.tolist())


def test_decode_peak_suppression():
    """A plateau of equal scores still yields peaks, not a dense blob."""
    hm = jnp.zeros((1, 16, 16, 1)).at[0, 8, 8, 0].set(1.0).at[0, 8, 9, 0].set(0.6)
    off = jnp.zeros((1, 16, 16, 2))
    sz = jnp.ones((1, 16, 16, 2))
    det = decode_centernet(hm, off, sz, stride=4, top_k=5, from_logits=False)
    s = np.asarray(det.scores[0])
    assert s[0] == 1.0
    assert (s[1:] <= 0.0).all()  # 0.6 neighbor suppressed by 3x3 pool


def test_semseg_argmax_and_colorize():
    logits = jnp.zeros((1, 4, 4, 3)).at[0, :, :, 1].set(5.0)
    cm = semseg_argmax(logits)
    assert (np.asarray(cm) == 1).all()
    pal = jnp.asarray([[0, 0, 0], [255, 0, 0], [0, 255, 0]], jnp.uint8)
    rgb = colorize_semseg(cm, pal)
    assert rgb.shape == (1, 4, 4, 3)
    assert (np.asarray(rgb)[..., 0] == 255).all()


def test_upsample_bilinear_shapes_and_values():
    x = jnp.arange(16.0).reshape(1, 4, 4, 1)
    up = upsample_bilinear(x, (8, 8))
    assert up.shape == (1, 8, 8, 1)
    # mean preserved by bilinear half-pixel upsampling of smooth data
    assert abs(float(up.mean()) - float(x.mean())) < 0.3


def test_two_stage_topk_matches_naive_global_topk(rng):
    """_decode_core's two-stage exact top-k == one lax.top_k over HW*C.

    Tie-free random scores so the selected set is unique; checks scores,
    classes, and pixel indices agree with the naive reference ranking.
    """
    from cvm_tpu.ops.decode import _decode_core, _maxpool3x3

    B, Hs, Ws, C, K = 2, 24, 24, 7, 50
    hm = jnp.asarray(rng.standard_normal((B, Hs, Ws, C)), jnp.float32)
    off = jnp.asarray(rng.standard_normal((B, Hs, Ws, 2)), jnp.float32)
    sz = jnp.abs(jnp.asarray(rng.standard_normal((B, Hs, Ws, 2)), jnp.float32))

    det, pix = _decode_core(hm, off, sz, stride=4, top_k=K, from_logits=True)

    prob = jax.nn.sigmoid(hm)
    peaks = jnp.where(_maxpool3x3(prob) == prob, prob, 0.0)
    ref_scores, ref_idx = jax.lax.top_k(peaks.reshape(B, Hs * Ws * C), K)

    np.testing.assert_allclose(np.asarray(det.scores), np.asarray(ref_scores),
                               rtol=0, atol=0)
    np.testing.assert_array_equal(np.asarray(det.classes),
                                  np.asarray(ref_idx % C))
    np.testing.assert_array_equal(np.asarray(pix), np.asarray(ref_idx // C))


def test_decode_top_k_exceeds_pixels():
    """Small maps: top_k > Hs*Ws must not crash (stage 1 caps at HW) and
    top_k > Hs*Ws*C pads with empty detections."""
    import jax
    import jax.numpy as jnp

    from cvm_tpu.ops.decode import decode_centernet

    B, Hs, Ws, C = 2, 8, 8, 3
    key = jax.random.PRNGKey(0)
    hm = jax.random.normal(key, (B, Hs, Ws, C))
    off = jnp.zeros((B, Hs, Ws, 2))
    sz = jnp.ones((B, Hs, Ws, 2))
    det = decode_centernet(hm, off, sz, stride=4, top_k=100)  # 100 > 64 px
    assert det.scores.shape == (B, 100)
    assert bool(jnp.all(det.scores[:, :-1] >= det.scores[:, 1:]))  # sorted

    det2 = decode_centernet(hm, off, sz, stride=4, top_k=300)  # > HW*C=192
    assert det2.scores.shape == (B, 300)
    assert bool(jnp.all(det2.scores[:, 192:] == 0.0))  # padded empties
