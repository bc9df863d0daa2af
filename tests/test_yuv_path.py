"""YUV420 serving path: native planes + fused device conversion ≈ RGB path."""

import io

import jax
import jax.numpy as jnp
import numpy as np
from PIL import Image

from cvm_tpu.native import decode_jpeg_batch, decode_jpeg_batch_yuv420
from cvm_tpu.pipeline.preprocess import preprocess_image_batch, preprocess_yuv420_batch


def _smooth_jpeg(rng, hw=(120, 160), quality=95):
    base = rng.integers(0, 255, (12, 16, 3)).astype(np.uint8)
    img = np.asarray(Image.fromarray(base).resize((hw[1], hw[0]), Image.BILINEAR))
    buf = io.BytesIO()
    Image.fromarray(img).save(buf, format="JPEG", quality=quality)
    return buf.getvalue()


def test_yuv420_planes_shapes(rng):
    jpeg = _smooth_jpeg(rng)
    Y, U, V, hw = decode_jpeg_batch_yuv420([jpeg], 128, 192, num_threads=1)
    assert Y.shape == (1, 128, 192)
    assert U.shape == (1, 64, 96) and V.shape == (1, 64, 96)
    assert tuple(hw[0]) == (120, 160)
    assert Y[0, :120, :160].std() > 1.0


def test_yuv_path_matches_rgb_path(rng):
    jpegs = [_smooth_jpeg(rng), _smooth_jpeg(rng, hw=(100, 144))]
    Y, U, V, hw = decode_jpeg_batch_yuv420(jpegs, 128, 192, num_threads=2)
    rgb, hw2 = decode_jpeg_batch(jpegs, 128, 192, num_threads=2)
    np.testing.assert_array_equal(hw, hw2)

    out_yuv, _ = preprocess_yuv420_batch(
        None, jnp.asarray(Y), jnp.asarray(U), jnp.asarray(V), jnp.asarray(hw),
        (96, 160), train=False,
    )
    out_rgb, _ = preprocess_image_batch(
        None, jnp.asarray(rgb), jnp.asarray(hw2), (96, 160), train=False
    )
    diff = np.abs(np.asarray(out_yuv) - np.asarray(out_rgb)) * 127.5
    assert diff.mean() < 2.0, f"mean diff {diff.mean()}"


def test_yuv420_bad_jpeg():
    Y, U, V, hw = decode_jpeg_batch_yuv420([b"garbage"], 64, 64)
    assert tuple(hw[0]) == (1, 1)
    assert Y.sum() == 0
