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


def test_train_processor_accepts_yuv_batch(rng):
    """Training processors consume YUV-format loader batches transparently."""
    from cvm_tpu.models import get_model

    spec = get_model("semseg")
    p = spec.params_cls(input_hw=(32, 32), num_classes=3, backbone="tiny",
                        decoder_features=16, class_weights=(1.0, 1.0, 1.0))
    proc = spec.make_processor(p, train=True)
    B, Hm, Wm = 2, 48, 48
    batch = {
        "y": jnp.asarray(rng.integers(0, 255, (B, Hm, Wm), dtype=np.uint8)),
        "u": jnp.asarray(rng.integers(0, 255, (B, Hm // 2, Wm // 2), dtype=np.uint8)),
        "v": jnp.asarray(rng.integers(0, 255, (B, Hm // 2, Wm // 2), dtype=np.uint8)),
        "image_hw": jnp.asarray([[40, 40], [48, 44]], jnp.int32),
        "mask": jnp.asarray(rng.integers(0, 3, (B, Hm, Wm), dtype=np.uint8)),
    }
    inputs, targets = jax.jit(lambda k, b: proc(k, b))(jax.random.PRNGKey(0), batch)
    assert inputs.shape == (B, 32, 32, 3)
    assert float(jnp.abs(inputs).max()) <= 1.0 + 1e-5
    assert targets["classes"].shape == (B, 32, 32)


def test_dmds_two_frame_yuv420(rng):
    """Two-frame records flow through the yuv420 wire format end-to-end:
    loader emits *_t1 plane sets, the DMDS processor trains on them, and the
    serving pipeline runs both frames through one jitted program."""
    import tempfile

    from cvm_tpu.data.loader import RecordLoader
    from cvm_tpu.data.records import RecordDataset, RecordWriter
    from cvm_tpu.data.synthetic import synthetic_batch
    from cvm_tpu.infer.pipeline import InferencePipeline
    from cvm_tpu.models import get_model

    with tempfile.TemporaryDirectory() as td:
        path = f"{td}/two.cvrec"
        with RecordWriter(path) as w:
            for i in range(4):
                w.write(
                    {"id": f"r{i}", "intrinsics": [100.0, 100.0, 60.0, 40.0]},
                    {"jpeg": _smooth_jpeg(rng, hw=(80, 120)),
                     "jpeg_t1": _smooth_jpeg(rng, hw=(80, 120))},
                )
        ld = RecordLoader(RecordDataset([path]), 2, (96, 128),
                          output_format="yuv420", shuffle=False, loop=False)
        batch = next(iter(ld))
    for k in ("y", "u", "v", "y_t1", "u_t1", "v_t1", "intrinsics"):
        assert k in batch, k
    assert batch["y_t1"].shape == batch["y"].shape
    assert batch["y_t1"][0, :80, :120].std() > 1.0  # real decoded content

    spec = get_model("dmds")
    p = spec.params_cls(input_hw=(64, 64), backbone="tiny", decoder_features=16,
                        motion_features=32)
    # Training processor consumes the yuv420 two-frame batch.
    proc = spec.make_processor(p, train=False)
    inputs, targets = jax.jit(lambda k, b: proc(k, b))(None, batch)
    assert inputs.shape == (2, 64, 64, 6)

    # Serving pipeline, yuv420 two-frame.
    model = spec.create_model(p)
    variables = model.init(jax.random.PRNGKey(0),
                           np.zeros((1, 64, 64, 6), np.float32), train=False)
    pipe = InferencePipeline(spec, p, variables, input_format="yuv420")
    out = pipe(batch)
    assert out["depth"].shape == (2, 64, 64, 1)
    assert np.isfinite(np.asarray(out["depth"])).all()


def test_yuv420_bad_jpeg():
    Y, U, V, hw = decode_jpeg_batch_yuv420([b"garbage"], 64, 64)
    assert tuple(hw[0]) == (1, 1)
    assert Y.sum() == 0
