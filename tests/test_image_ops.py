"""Image-op oracle tests: device resample vs exact float oracle and cv2.

Contract (SURVEY.md §4 item 1, BASELINE north-star): device ops are
"bit-comparable within fp tolerance" to the reference's OpenCV path. cv2
computes INTER_LINEAR in 11-bit fixed point on uint8, so cv2 agreement is
within ~1 on the 0..255 scale; agreement with an exact float64 oracle of the
same half-pixel formula is ~1e-4.
"""

import cv2
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cvm_tpu.ops.image import (
    Roi,
    full_roi,
    jittered_roi,
    letterbox,
    letterbox_roi,
    map_boxes_to_output,
    normalize_imagenet,
    normalize_pm1,
    photometric_augment,
    sample_bilinear,
    sample_nearest,
)


def oracle_resize_bilinear(img, out_h, out_w):
    """Exact float64 half-pixel bilinear resize with border replicate."""
    H, W = img.shape[:2]
    img = img.astype(np.float64)
    sy, sx = H / out_h, W / out_w
    ys = (np.arange(out_h) + 0.5) * sy - 0.5
    xs = (np.arange(out_w) + 0.5) * sx - 0.5
    y0 = np.floor(ys).astype(int)
    x0 = np.floor(xs).astype(int)
    fy = ys - y0
    fx = xs - x0
    y0c, y1c = np.clip(y0, 0, H - 1), np.clip(y0 + 1, 0, H - 1)
    x0c, x1c = np.clip(x0, 0, W - 1), np.clip(x0 + 1, 0, W - 1)
    rows = img[y0c] * (1 - fy)[:, None, None] + img[y1c] * fy[:, None, None]
    out = rows[:, x0c] * (1 - fx)[None, :, None] + rows[:, x1c] * fx[None, :, None]
    return out


@pytest.mark.parametrize("in_hw,out_hw", [((37, 53), (64, 96)), ((128, 200), (64, 96)), ((64, 96), (64, 96))])
def test_resize_matches_float_oracle(rng, in_hw, out_hw):
    img = rng.uniform(0, 255, size=(*in_hw, 3)).astype(np.float32)
    roi = full_roi(in_hw[0], in_hw[1], *out_hw)
    got = np.asarray(sample_bilinear(jnp.asarray(img), roi, out_hw))
    want = oracle_resize_bilinear(img, *out_hw)
    np.testing.assert_allclose(got, want, atol=5e-3, rtol=0)


@pytest.mark.parametrize("in_hw,out_hw", [((48, 64), (96, 128)), ((100, 140), (50, 70))])
def test_resize_matches_cv2_within_quantization(rng, in_hw, out_hw):
    img = rng.integers(0, 256, size=(*in_hw, 3), dtype=np.uint8)
    roi = full_roi(in_hw[0], in_hw[1], *out_hw)
    got = np.asarray(sample_bilinear(jnp.asarray(img), roi, out_hw))
    want = cv2.resize(img, (out_hw[1], out_hw[0]), interpolation=cv2.INTER_LINEAR)
    # cv2 uses 11-bit fixed point on uint8 → up to ~1.2 LSB divergence.
    assert np.abs(got - want.astype(np.float32)).max() <= 1.5


def test_letterbox_geometry_and_padding(rng):
    # 100x200 into 64x64: scale=0.32 → 32x64 content, vertical bars of 16.
    img = rng.uniform(0, 255, size=(128, 256, 3)).astype(np.float32)
    # valid region 100x200 inside padded 128x256 buffer
    out, roi = letterbox(jnp.asarray(img), 100, 200, (64, 64), pad_value=0.0)
    out = np.asarray(out)
    assert out.shape == (64, 64, 3)
    assert np.all(out[:16] == 0.0) and np.all(out[-16:] == 0.0)
    assert out[16:48].std() > 1.0  # content present
    np.testing.assert_allclose(float(roi.scale_x), 0.32, atol=1e-6)
    # Content equals plain resize of the valid crop.
    want = oracle_resize_bilinear(img[:100, :200], 32, 64)
    np.testing.assert_allclose(out[16:48], want, atol=2e-3)


def test_letterbox_never_reads_pad_garbage(rng):
    img = np.full((128, 128, 3), 1e9, np.float32)  # garbage
    img[:50, :60] = 7.0  # valid region constant
    out, _ = letterbox(jnp.asarray(img), 50, 60, (32, 32), pad_value=0.0)
    out = np.asarray(out)
    content = out[np.abs(out - 7.0) < 1e-3]
    assert (np.abs(out) < 1e8).all()
    assert content.size > 0


def test_box_mapping_roundtrip():
    roi = letterbox_roi(100, 200, 64, 64)
    boxes = jnp.asarray([[10.0, 20.0, 110.0, 80.0]])
    out = np.asarray(map_boxes_to_output(boxes, roi))
    # scale 0.32, offset x=0, y=16
    np.testing.assert_allclose(out[0], [3.2, 22.4, 35.2, 41.6], atol=1e-4)


def test_flip_mirrors_image_and_boxes(rng):
    img = rng.uniform(0, 255, (64, 64, 3)).astype(np.float32)
    roi_f = letterbox_roi(64, 64, 64, 64, flip_x=True)
    roi_n = letterbox_roi(64, 64, 64, 64, flip_x=False)
    a = np.asarray(sample_bilinear(jnp.asarray(img), roi_f, (64, 64)))
    b = np.asarray(sample_bilinear(jnp.asarray(img), roi_n, (64, 64)))
    np.testing.assert_allclose(a, b[:, ::-1], atol=1e-3)
    boxes = jnp.asarray([[10.0, 20.0, 30.0, 40.0]])
    fb = np.asarray(map_boxes_to_output(boxes, roi_f))
    np.testing.assert_allclose(fb[0], [64 - 30, 20, 64 - 10, 40], atol=1e-4)


def test_nearest_preserves_label_values(rng):
    mask = rng.integers(0, 7, size=(50, 70), dtype=np.int32)
    roi = letterbox_roi(50, 70, 64, 64)
    out = np.asarray(sample_nearest(jnp.asarray(mask), roi, (64, 64), valid_hw=(50, 70), pad_value=255))
    assert set(np.unique(out)) <= set(range(7)) | {255}
    # pad rows are 255
    assert (out[0] == 255).all()


def test_jittered_roi_in_range_and_flip():
    key = jax.random.PRNGKey(0)
    roi = jittered_roi(key, 480, 640, 256, 256, scale_range=(1.0, 1.0), shift_frac=0.0, flip_prob=0.0)
    # zoom=1 → same as letterbox fit: src window covers min-fit extent
    assert float(roi.src_h) == pytest.approx(480.0, abs=1e-3)
    assert float(roi.src_w) == pytest.approx(480.0, abs=1e-3)


def test_photometric_augment_bounds(rng):
    img = jnp.asarray(rng.uniform(0, 255, (32, 32, 3)).astype(np.float32))
    out = photometric_augment(jax.random.PRNGKey(3), img)
    out = np.asarray(out)
    assert out.min() >= 0.0 and out.max() <= 255.0
    assert np.abs(out - np.asarray(img)).mean() > 0.1  # actually changed


def test_normalizations():
    img = jnp.full((4, 4, 3), 255.0)
    np.testing.assert_allclose(np.asarray(normalize_pm1(img)), 1.0, atol=1e-6)
    out = np.asarray(normalize_imagenet(img))
    assert out.shape == (4, 4, 3) and (out > 1.5).all()


def test_photometric_noise_and_blur(rng):
    """Optional gaussian noise / 3x3 blur extras of the photometric chain."""
    import jax

    from cvm_tpu.ops.image import photometric_augment

    img = jnp.asarray(rng.integers(0, 255, (32, 32, 3)).astype(np.float32))
    key = jax.random.PRNGKey(1)

    # All-off photometric with zero jitter ranges is identity-ish.
    out0 = photometric_augment(key, img, 0.0, 0.0, 0.0, 0.0)
    np.testing.assert_allclose(np.asarray(out0), np.asarray(img), atol=1e-3)

    # Noise only: changes pixels, bounded energy (sigma <= 0.1*255).
    outn = photometric_augment(key, img, 0.0, 0.0, 0.0, 0.0, noise_std=0.1)
    d = np.asarray(outn) - np.asarray(img)
    assert np.abs(d).mean() > 0.01
    assert d.std() < 0.12 * 255

    # Blur with prob=1: equals the separable binomial kernel oracle.
    outb = photometric_augment(key, img, 0.0, 0.0, 0.0, 0.0, blur_prob=1.0)
    x = np.pad(np.asarray(img), ((1, 1), (1, 1), (0, 0)), mode="edge")
    k = np.array([0.25, 0.5, 0.25])
    ref = x[:-2] * k[0] + x[1:-1] * k[1] + x[2:] * k[2]
    ref = ref[:, :-2] * k[0] + ref[:, 1:-1] * k[1] + ref[:, 2:] * k[2]
    np.testing.assert_allclose(np.asarray(outb), np.clip(ref, 0, 255), atol=1e-2)

    # blur_prob=0 never blurs.
    outnb = photometric_augment(key, img, 0.0, 0.0, 0.0, 0.0, blur_prob=0.0)
    np.testing.assert_allclose(np.asarray(outnb), np.asarray(img), atol=1e-3)


def test_rotate_image_exact_quarter_turn():
    """+90 deg is an exact index permutation under nearest: top of the image
    moves to the right (clockwise on screen — x right, y down)."""
    from cvm_tpu.ops.image import rotate_image

    rng = np.random.default_rng(3)
    img = rng.integers(0, 255, (9, 9), dtype=np.uint8)
    out = np.asarray(rotate_image(jnp.asarray(img), jnp.pi / 2, method="nearest"))
    np.testing.assert_array_equal(out, np.rot90(img, k=-1))
    # angle 0 = identity (bilinear too, within float rounding)
    out0 = np.asarray(rotate_image(jnp.asarray(img).astype(jnp.float32), 0.0))
    np.testing.assert_allclose(out0, img.astype(np.float32), atol=1e-4)


def test_rotate_boxes_tracks_rotated_content():
    """rotate_boxes must bound exactly the pixels rotate_image moves: paint a
    rectangle, rotate both, compare the nonzero extent to the mapped box."""
    from cvm_tpu.ops.image import rotate_boxes, rotate_image

    H = W = 64
    img = np.zeros((H, W), np.float32)
    x0, y0, x1, y1 = 10, 22, 30, 34
    img[y0:y1, x0:x1] = 1.0
    angle = np.deg2rad(17.0)
    rot = np.asarray(rotate_image(jnp.asarray(img), angle, method="nearest"))
    ys, xs = np.nonzero(rot > 0.5)
    # Box corners use pixel-edge coords [x0, y0, x1, y1) like the labels.
    box = np.asarray(rotate_boxes(
        jnp.asarray([[x0, y0, x1, y1]], jnp.float32), angle,
        ((W - 1) / 2.0, (H - 1) / 2.0)))[0]
    assert abs(xs.min() - box[0]) <= 1.5 and abs(ys.min() - box[1]) <= 1.5
    assert abs(xs.max() + 1 - box[2]) <= 1.5 and abs(ys.max() + 1 - box[3]) <= 1.5


def test_clip_boxes_drops_offcanvas_extent_and_invalidates_gone_boxes():
    """Rotation can push an AABB partly or fully off-canvas. clip_boxes must
    trim the invisible extent, and a fully-outside box must degenerate so
    prepare_centers' validity check drops it (review finding, round 4)."""
    from cvm_tpu.ops.heatmap import prepare_centers
    from cvm_tpu.ops.image import clip_boxes

    H = W = 64
    boxes = jnp.asarray([
        [-10.0, 20.0, 30.0, 40.0],   # spills left → x0 clamps to 0
        [40.0, -8.0, 80.0, 70.0],    # spills three sides
        [70.0, 70.0, 90.0, 90.0],    # fully outside → degenerate
        [10.0, 10.0, 20.0, 20.0],    # fully inside → untouched
    ], jnp.float32)
    c = np.asarray(clip_boxes(boxes, (H, W)))
    np.testing.assert_allclose(c[0], [0.0, 20.0, 30.0, 40.0])
    np.testing.assert_allclose(c[1], [40.0, 0.0, W - 1, H - 1])
    assert c[2][0] == c[2][2] == W - 1 and c[2][1] == c[2][3] == H - 1
    np.testing.assert_allclose(c[3], np.asarray(boxes)[3])

    valid = jnp.ones((4,), bool)
    *_, v, _, _, _, _ = prepare_centers(jnp.asarray(c), valid, (H, W), 0.7)
    v = np.asarray(v)
    assert v[0] and v[1] and v[3]
    assert not v[2]  # zero-area after clip → never supervised


def test_rotation_augmentation_in_processors():
    """aug_rotate_deg wires image+GT through the same roll in every
    processor; default 0 keeps the program rotation-free."""
    from cvm_tpu.data.synthetic import synthetic_batch
    from cvm_tpu.models import get_model

    rng = np.random.default_rng(0)
    batch = synthetic_batch(rng, 2, (96, 96), num_classes=3, max_objects=6)
    key = jax.random.PRNGKey(1)

    spec = get_model("semseg")
    cfg = spec.params_cls(input_hw=(64, 64), num_classes=3, backbone="tiny",
                          decoder_features=16, class_weights=(1.0, 1.0, 1.0),
                          aug_rotate_deg=25.0, aug_flip_prob=0.0)
    images, tgt = jax.jit(spec.make_processor(cfg, train=True))(key, batch)
    assert images.shape == (2, 64, 64, 3)
    cls = np.asarray(tgt["classes"])
    assert cls.shape == (2, 64, 64)
    # A 25-deg roll rotates padding into at least one corner → ignore_index.
    corners = cls[:, [0, 0, -1, -1], [0, -1, 0, -1]]
    assert (corners == cfg.ignore_index).any()

    cfg0 = cfg.replace(aug_rotate_deg=0.0)
    img0, tgt0 = jax.jit(spec.make_processor(cfg0, train=True))(key, batch)
    assert np.isfinite(np.asarray(img0)).all()

    spec = get_model("centernet")
    ccfg = spec.params_cls(input_hw=(64, 64), num_classes=3, max_objects=6,
                           backbone="tiny", neck_features=32, head_features=16,
                           aug_rotate_deg=25.0)
    imgs, targets = jax.jit(spec.make_processor(ccfg, train=True))(key, batch)
    assert np.isfinite(np.asarray(targets.heatmap)).all()
    assert float(np.asarray(targets.heatmap).max()) > 0.5  # objects survived
