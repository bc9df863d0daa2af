"""Record format + native JPEG feeder + loader tests."""

import io

import numpy as np
import pytest
from PIL import Image

from cvm_tpu.data.loader import RecordLoader, prefetch_to_device
from cvm_tpu.data.records import RecordDataset, RecordReader, RecordWriter
from cvm_tpu.native import decode_jpeg_batch, native_available


def _jpeg_bytes(arr: np.ndarray) -> bytes:
    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, format="JPEG", quality=92)
    return buf.getvalue()


def _write_shard(path, n, rng, hw=(40, 60), with_mask=True, with_depth=True):
    with RecordWriter(path) as w:
        for i in range(n):
            img = rng.integers(0, 255, (*hw, 3), dtype=np.uint8)
            blobs = {"jpeg": _jpeg_bytes(img)}
            if with_mask:
                blobs["mask"] = rng.integers(0, 5, hw).astype(np.uint8)
            if with_depth:
                blobs["depth"] = rng.uniform(0, 80, hw).astype(np.float32)
            meta = {
                "id": f"s{i}",
                "boxes": [[1.0, 2.0, 20.0, 22.0], [5.0, 5.0, 30.0, 35.0]],
                "classes": [0, 2],
                "intrinsics": [50.0, 50.0, 30.0, 20.0],
            }
            w.write(meta, blobs)


def test_record_roundtrip(tmp_path, rng):
    p = str(tmp_path / "a.cvrec")
    _write_shard(p, 5, rng)
    r = RecordReader(p)
    assert len(r) == 5
    meta, blobs = r.get(3)
    assert meta["id"] == "s3"
    assert meta["classes"] == [0, 2]
    assert blobs["mask"].shape == (40, 60) and blobs["mask"].dtype == np.uint8
    assert blobs["depth"].dtype == np.float32
    img = Image.open(io.BytesIO(blobs["jpeg"]))
    assert img.size == (60, 40)
    r.close()


def test_record_dataset_multi_shard_and_split(tmp_path, rng):
    for s in range(3):
        _write_shard(str(tmp_path / f"s{s}.cvrec"), 4, rng)
    ds = RecordDataset([str(tmp_path / "*.cvrec")])
    assert len(ds) == 12
    meta, _ = ds.get(11)
    assert meta["id"] == "s3"
    train, val = ds.split_ids(val_fraction=0.25, seed=1)
    assert len(val) == 3 and len(train) == 9
    assert set(train) | set(val) == set(range(12))


def test_native_decoder_matches_pil(rng):
    imgs = [rng.integers(0, 255, (37, 53, 3), dtype=np.uint8) for _ in range(3)]
    jpegs = [_jpeg_bytes(im) for im in imgs]
    batch, hw = decode_jpeg_batch(jpegs, 64, 64, num_threads=2)
    assert batch.shape == (3, 64, 64, 3)
    for i, im in enumerate(imgs):
        assert tuple(hw[i]) == (37, 53)
        ref = np.asarray(Image.open(io.BytesIO(jpegs[i])).convert("RGB"))
        got = batch[i, :37, :53]
        # Different IDCT implementations may differ by a few LSB.
        assert np.abs(got.astype(int) - ref.astype(int)).mean() < 2.0
        assert np.all(batch[i, 37:] == 0) and np.all(batch[i, :, 53:] == 0)


def test_native_decoder_downscales_oversized(rng):
    img = rng.integers(0, 255, (200, 300, 3), dtype=np.uint8)
    batch, hw = decode_jpeg_batch([_jpeg_bytes(img)], 64, 80, num_threads=1)
    h, w = hw[0]
    assert h <= 64 and w <= 80 and h >= 25  # 1/4 scale → 50x75
    assert batch[0, :h, :w].std() > 1.0


def test_native_decoder_bad_bytes():
    batch, hw = decode_jpeg_batch([b"not a jpeg", b"\xff\xd8\xff"], 32, 32)
    assert tuple(hw[0]) == (1, 1) and tuple(hw[1]) == (1, 1)
    assert batch.sum() == 0


def test_loader_batches(tmp_path, rng):
    p = str(tmp_path / "a.cvrec")
    _write_shard(p, 10, rng)
    ds = RecordDataset([p])
    loader = RecordLoader(ds, batch_size=4, pad_hw=(48, 64), max_objects=8, loop=False, seed=3)
    batches = list(iter(loader))
    assert len(batches) == 2  # drop remainder
    b = batches[0]
    assert b["image"].shape == (4, 48, 64, 3)
    assert tuple(b["image_hw"][0]) == (40, 60)
    assert b["boxes"].shape == (4, 8, 4)
    assert (b["num_objects"] == 2).all()
    assert b["mask"].shape == (4, 48, 64)
    assert b["depth"].dtype == np.float32
    assert b["intrinsics"].shape == (4, 4)


def test_abandoned_iterator_releases_worker_thread(tmp_path, rng):
    """A consumer that stops early (evaluate_model max_batches, eval image
    rendering every --eval_every) must not leak the assembly thread blocked
    in q.put — over a long training run those leaks compound (review
    finding, round 4)."""
    import threading
    import time

    p = str(tmp_path / "a.cvrec")
    _write_shard(p, 10, rng)
    ds = RecordDataset([p])
    loader = RecordLoader(ds, batch_size=2, pad_hw=(48, 64), max_objects=8,
                          loop=True, prefetch_batches=1)
    n0 = threading.active_count()
    it = iter(loader)
    next(it)  # worker is now running and refilling the full queue
    it.close()  # abandon early — generator finally sets the stop event
    deadline = time.time() + 10.0
    while threading.active_count() > n0 and time.time() < deadline:
        time.sleep(0.05)
    assert threading.active_count() <= n0, "loader worker thread leaked"


def test_loader_stage_stats(tmp_path, rng):
    p = str(tmp_path / "a.cvrec")
    _write_shard(p, 8, rng)
    ds = RecordDataset([p])
    loader = RecordLoader(ds, batch_size=4, pad_hw=(48, 64), max_objects=8, loop=False)
    n = len(list(iter(loader)))
    s = loader.stats()
    assert s["batches"] == float(n) == 2.0
    # JPEG batches must attribute decode time; every stage is non-negative.
    assert s["decode_ms_per_batch"] > 0.0
    for k in ("read_ms_per_batch", "decode_ms_per_batch", "assemble_ms_per_batch"):
        assert s[k] >= 0.0


def test_prefetch_to_device(tmp_path, rng):
    import jax

    p = str(tmp_path / "a.cvrec")
    _write_shard(p, 8, rng, with_mask=False, with_depth=False)
    ds = RecordDataset([p])
    loader = RecordLoader(ds, batch_size=4, pad_hw=(48, 64), loop=False)
    sharding = jax.sharding.SingleDeviceSharding(jax.devices()[0])
    out = list(prefetch_to_device(iter(loader), sharding))
    assert len(out) == 2
    assert out[0]["image"].shape == (4, 48, 64, 3)
    assert isinstance(out[0]["image"], jax.Array)


def test_prefetch_stage_reports_transfer(tmp_path, rng):
    """The stall watchdog needs to see 'transfer' while the host→device put
    is in flight (a hang there is a DEVICE stall, restart-eligible) and
    'await_batch' while blocked on the host iterator (ADVICE r3 #1)."""
    import jax

    p = str(tmp_path / "a.cvrec")
    _write_shard(p, 8, rng, with_mask=False, with_depth=False)
    loader = RecordLoader(RecordDataset([p]), batch_size=4, pad_hw=(48, 64),
                          loop=False)
    seen = []

    class RecordingStage(list):
        def __setitem__(self, i, v):
            seen.append(v)
            super().__setitem__(i, v)

    stage = RecordingStage(["await_batch"])
    sharding = jax.sharding.SingleDeviceSharding(jax.devices()[0])
    out = list(prefetch_to_device(iter(loader), sharding, stage=stage))
    assert len(out) == 2
    # Every put is bracketed: await_batch (host wait) then transfer (RPC).
    assert seen[:2] == ["await_batch", "transfer"]
    assert "transfer" in seen and seen.count("await_batch") >= 2

def test_loader_rescales_labels_on_decoder_downscale(tmp_path, rng):
    """Oversized JPEGs are DCT-downscaled by the feeder; labels must follow."""
    p = str(tmp_path / "big.cvrec")
    img = rng.integers(0, 255, (200, 300, 3), dtype=np.uint8)
    mask = rng.integers(0, 5, (200, 300)).astype(np.uint8)
    depth = rng.uniform(1, 80, (200, 300)).astype(np.float32)
    meta = {
        "id": "big0", "height": 200, "width": 300,
        "boxes": [[40.0, 80.0, 120.0, 160.0]], "classes": [1],
        "intrinsics": [100.0, 100.0, 150.0, 100.0],
    }
    with RecordWriter(p) as w:
        w.write(meta, {"jpeg": _jpeg_bytes(img), "mask": mask, "depth": depth})
    ds = RecordDataset([p])
    loader = RecordLoader(ds, batch_size=1, pad_hw=(64, 80), max_objects=4,
                          loop=False, shuffle=False)
    b = next(iter(loader))
    h, w = b["image_hw"][0]
    assert (h, w) == (50, 75)  # 1/4 DCT scale
    np.testing.assert_allclose(b["boxes"][0, 0], [10.0, 20.0, 30.0, 40.0], atol=1e-5)
    np.testing.assert_allclose(b["intrinsics"][0], [25.0, 25.0, 37.5, 25.0], atol=1e-4)
    # mask/depth downsampled to the decoded frame, padding untouched
    assert set(np.unique(b["mask"][0, :50, :75])) <= set(range(5))
    assert (b["mask"][0, 50:, :] == 255).all() and (b["mask"][0, :, 75:] == 255).all()
    assert (b["depth"][0, :50, :75] > 0).all()
    assert (b["depth"][0, 50:, :] == 0).all()
    # nearest resize preserves exact class ids/depth values
    assert b["mask"][0, 0, 0] == mask[0, 0]
    assert b["depth"][0, 0, 0] == depth[0, 0]


def test_loader_yuv420_raw_blob_and_two_frame(tmp_path, rng):
    p = str(tmp_path / "raw.cvrec")
    img = rng.integers(0, 255, (40, 60, 3), dtype=np.uint8)
    with RecordWriter(p) as w:
        w.write({"id": "r0"}, {"image": img})
    ds = RecordDataset([p])
    loader = RecordLoader(ds, batch_size=1, pad_hw=(48, 64), loop=False,
                          output_format="yuv420", drop_remainder=False)
    b = next(iter(loader))
    assert tuple(b["image_hw"][0]) == (40, 60)
    assert b["y"][0, :40, :60].std() > 1.0  # not a blank frame
    assert (b["y"][0, 40:, :] == 0).all()

    # Two-frame records emit a second plane set (DMDS wire format).
    p2 = str(tmp_path / "two.cvrec")
    with RecordWriter(p2) as w:
        w.write({"id": "t0"}, {"jpeg": _jpeg_bytes(img), "image_t1": img})
    loader2 = RecordLoader(RecordDataset([p2]), batch_size=1, pad_hw=(48, 64),
                           loop=False, output_format="yuv420", drop_remainder=False)
    b2 = next(iter(loader2))
    for k in ("y", "u", "v", "y_t1", "u_t1", "v_t1"):
        assert k in b2, k
    assert b2["y_t1"][0, :40, :60].std() > 1.0
    assert (b2["y_t1"][0, 40:, :] == 0).all()


def test_loader_aligns_mismatched_dense_labels_to_frame(tmp_path, rng):
    """A mask at a different resolution than the image snaps to the frame."""
    p = str(tmp_path / "mismatch.cvrec")
    img = rng.integers(0, 255, (40, 60, 3), dtype=np.uint8)
    mask = rng.integers(0, 5, (100, 200)).astype(np.uint8)
    with RecordWriter(p) as w:
        w.write({"id": "h0"}, {"image": img, "mask": mask})
    loader = RecordLoader(RecordDataset([p]), batch_size=1, pad_hw=(48, 64),
                          loop=False, drop_remainder=False)
    b = next(iter(loader))
    assert set(np.unique(b["mask"][0, :40, :60])) <= set(range(5))
    assert (b["mask"][0, 40:, :] == 255).all() and (b["mask"][0, :, 60:] == 255).all()


def test_loader_rejects_oversized_dense_labels(tmp_path, rng):
    """With no decoded frame to align to, an oversized mask errors loudly."""
    p = str(tmp_path / "huge.cvrec")
    mask = rng.integers(0, 5, (100, 200)).astype(np.uint8)
    with RecordWriter(p) as w:
        w.write({"id": "h0"}, {"mask": mask})  # no image/jpeg blob
    loader = RecordLoader(RecordDataset([p]), batch_size=1, pad_hw=(48, 64),
                          loop=False, drop_remainder=False)
    with pytest.raises(ValueError, match="exceeds pad buffer"):
        next(iter(loader))


def test_scale_aware_decode_picks_covering_pow2(rng):
    """target_hw selects the smallest power-of-2 scale covering the model
    input (with 1/8 slack), independent of the pad buffer."""
    img = rng.integers(0, 255, (200, 300, 3), dtype=np.uint8)
    jpeg = _jpeg_bytes(img)
    # No target: fits the big buffer at full size.
    _, hw = decode_jpeg_batch([jpeg], 640, 640, 1)
    assert tuple(hw[0]) == (200, 300)
    # Target 100x100: 1/2 scale (100x150) covers; 1/4 (50x75) does not.
    _, hw = decode_jpeg_batch([jpeg], 640, 640, 1, target_hw=(100, 100))
    assert tuple(hw[0]) == (100, 150)
    from cvm_tpu.native import decode_jpeg_batch_yuv420

    _, _, _, hw = decode_jpeg_batch_yuv420([jpeg], 640, 640, 1, target_hw=(100, 100))
    assert tuple(hw[0]) == (100, 150)


def test_repack_yuv_and_raw_shard_loader(tmp_path, rng):
    """cli.repack pre-decodes to raw planes; the loader blits them with the
    same geometry and near-identical luma as the JPEG decode path."""
    from cvm_tpu.cli.repack import repack_yuv

    p = str(tmp_path / "src.cvrec")
    _write_shard(p, 6, rng, hw=(40, 60), with_mask=True, with_depth=False)
    out = str(tmp_path / "yuv.cvrec")
    stats = repack_yuv(p, out)
    assert stats["written"] == 6 and stats["failed"] == 0

    ds_j = RecordDataset([p])
    ds_r = RecordDataset([out])
    kw = dict(batch_size=6, pad_hw=(48, 64), output_format="yuv420",
              shuffle=False, loop=False, max_objects=8)
    bj = next(iter(RecordLoader(ds_j, **kw)))
    br = next(iter(RecordLoader(ds_r, **kw)))
    np.testing.assert_array_equal(bj["image_hw"], br["image_hw"])
    np.testing.assert_array_equal(bj["boxes"], br["boxes"])
    np.testing.assert_array_equal(bj["mask"], br["mask"])
    diff = np.abs(bj["y"].astype(int) - br["y"].astype(int))
    assert diff.mean() < 1.0  # same decoded planes modulo rounding


def test_split_ids_sharding(tmp_path, rng):
    """Stride-sharded train ids partition exactly; val identical per host."""
    p = str(tmp_path / "shard.cvrec")
    img = rng.integers(0, 255, (16, 16, 3), dtype=np.uint8)
    with RecordWriter(p) as w:
        for i in range(23):
            w.write({"id": f"s{i}"}, {"image": img})
    ds = RecordDataset([p])
    full_train, full_val = ds.split_ids(seed=3)
    parts = [ds.split_ids(seed=3, shard_index=k, num_shards=4) for k in range(4)]
    got = sorted(i for tr, _ in parts for i in tr)
    assert got == sorted(full_train)          # exact partition, no overlap
    for _, val in parts:
        assert val == full_val                # same val everywhere
    sizes = [len(tr) for tr, _ in parts]
    assert max(sizes) - min(sizes) <= 1       # balanced
    with pytest.raises(ValueError):
        ds.split_ids(shard_index=4, num_shards=4)


def test_repack_two_frame_serving_shard(tmp_path, rng):
    """cli.repack pre-decodes BOTH frames; loader assembly is a pure blit."""
    from cvm_tpu.cli.repack import repack_yuv

    src = str(tmp_path / "two_src.cvrec")
    img_a = rng.integers(0, 255, (40, 60, 3), dtype=np.uint8)
    img_b = rng.integers(0, 255, (40, 60, 3), dtype=np.uint8)
    with RecordWriter(src) as w:
        w.write({"id": "t0", "intrinsics": [50.0, 50.0, 30.0, 20.0]},
                {"jpeg": _jpeg_bytes(img_a), "jpeg_t1": _jpeg_bytes(img_b)})
    out = str(tmp_path / "two_yuv.cvrec")
    stats = repack_yuv(src, out)
    assert stats["written"] == 1

    # Repacked shard has plane blobs for both frames.
    ds = RecordDataset([out])
    _, blobs = ds.get(0)
    for k in ("y", "u", "v", "y_t1", "u_t1", "v_t1"):
        assert k in blobs, k
    assert "jpeg_t1" not in blobs

    # Loader blits them into a two-frame yuv420 batch matching the
    # decode-path batch from the original shard.
    kw = dict(batch_size=1, pad_hw=(48, 64), loop=False,
              output_format="yuv420", drop_remainder=False, shuffle=False)
    b_blit = next(iter(RecordLoader(ds, **kw)))
    b_dec = next(iter(RecordLoader(RecordDataset([src]), **kw)))
    np.testing.assert_array_equal(b_blit["y_t1"], b_dec["y_t1"])
    np.testing.assert_array_equal(b_blit["u_t1"], b_dec["u_t1"])
    assert b_blit["y_t1"][0, :40, :60].std() > 1.0


def test_rgb_loader_reads_raw_yuv_shards(tmp_path, rng):
    """output_format='rgb' (the cli.train default) must decode repacked
    raw-YUV shards instead of silently yielding blank frames."""
    from cvm_tpu.cli.repack import repack_yuv

    src = str(tmp_path / "src.cvrec")
    # Smooth image: 4:2:0 chroma subsampling must stay near-lossless (a
    # noise image would lose chroma by construction).
    base = rng.integers(0, 255, (5, 8, 3)).astype(np.uint8)
    img = np.asarray(Image.fromarray(base).resize((60, 40), Image.BILINEAR))
    with RecordWriter(src) as w:
        w.write({"id": "r0", "boxes": [[1.0, 2.0, 20.0, 22.0]], "classes": [0]},
                {"jpeg": _jpeg_bytes(img)})
    out = str(tmp_path / "yuv.cvrec")
    repack_yuv(src, out)

    loader = RecordLoader(RecordDataset([out]), batch_size=1, pad_hw=(48, 64),
                          loop=False, drop_remainder=False)  # rgb default
    b = next(iter(loader))
    assert tuple(b["image_hw"][0]) == (40, 60)
    got = b["image"][0, :40, :60].astype(int)
    assert got.std() > 1.0  # not a blank frame
    # YUV 4:2:0 roundtrip keeps colors close to the decoded original.
    ref = np.asarray(Image.open(io.BytesIO(_jpeg_bytes(img))).convert("RGB")).astype(int)
    assert np.abs(got - ref).mean() < 8.0
    assert (b["image"][0, 40:, :] == 0).all()


def test_decode_out_buffer_matches_alloc(rng):
    """The all-JPEG fast path (decode into caller buffers) must be
    byte-identical to the allocating path, including zeroed padding and
    failed-decode frames, for both RGB and YUV420."""
    from cvm_tpu.native import decode_jpeg_batch_yuv420

    jpegs = [_jpeg_bytes(rng.integers(0, 255, (40 + 2 * i, 60, 3),
                                      dtype=np.uint8)) for i in range(3)]
    jpegs.append(b"not a jpeg")  # failed decode -> zero frame, hw=(1,1)

    ref, ref_hw = decode_jpeg_batch(jpegs, 64, 64, num_threads=2)
    out = np.full((4, 64, 64, 3), 255, np.uint8)  # dirty buffer
    got, got_hw = decode_jpeg_batch(jpegs, 64, 64, num_threads=2, out=out)
    assert got is out
    np.testing.assert_array_equal(got, ref)
    np.testing.assert_array_equal(got_hw, ref_hw)

    rY, rU, rV, r_hw = decode_jpeg_batch_yuv420(jpegs, 64, 64, num_threads=2)
    Y = np.full((4, 64, 64), 255, np.uint8)
    U = np.full((4, 32, 32), 255, np.uint8)
    V = np.full((4, 32, 32), 255, np.uint8)
    gY, gU, gV, g_hw = decode_jpeg_batch_yuv420(
        jpegs, 64, 64, num_threads=2, out_yuv=(Y, U, V))
    assert gY is Y and gU is U and gV is V
    np.testing.assert_array_equal(gY, rY)
    np.testing.assert_array_equal(gU, rU)
    np.testing.assert_array_equal(gV, rV)
    np.testing.assert_array_equal(g_hw, r_hw)

    # Wrong shape/dtype/layout is a loud error, not heap corruption.
    with pytest.raises(ValueError):
        decode_jpeg_batch(jpegs, 64, 64, out=np.zeros((4, 64, 64, 3), np.int16))
    with pytest.raises(ValueError):
        decode_jpeg_batch_yuv420(
            jpegs, 64, 64, out_yuv=(Y[:, :32], U, V))
