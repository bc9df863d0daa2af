"""Synthetic dataset: learnable toy scenes for every task (SURVEY.md §4 item 3).

Generates host-side raw batches in the loader's padded format: colored
rectangles on noise backgrounds, with consistent boxes / masks / depth /
frame-pair labels, so integration tests can assert that N training steps
actually reduce the loss, and benchmarks can run without real datasets.
"""

from __future__ import annotations

from typing import Dict, Iterator, Optional, Tuple

import numpy as np

# One distinctive RGB color per class so every task is learnable.
_CLASS_COLORS = np.array(
    [
        (220, 40, 40),
        (40, 220, 40),
        (40, 40, 220),
        (220, 220, 40),
        (220, 40, 220),
        (40, 220, 220),
        (240, 140, 20),
        (140, 20, 240),
        (20, 240, 140),
        (180, 180, 180),
    ],
    np.uint8,
)


def synthetic_sample(
    rng: np.random.Generator,
    hw: Tuple[int, int],
    num_classes: int = 3,
    max_objects: int = 8,
    smooth_background: bool = False,
) -> Dict[str, np.ndarray]:
    """One scene: noise background + K colored class rectangles.

    ``smooth_background`` replaces the per-pixel noise with the same noise
    rendered at quarter resolution and bilinearly upsampled. Two-frame
    (DMDS) batches need this: per-pixel noise decorrelates under ANY
    subpixel resample, so the exact depth+motion reconstruction of frame
    t+1 scores WORSE photometric error than "no motion" and the
    unsupervised depth objective has no usable minimum (measured 2026-08-19:
    exact-motion warp MSE 8.5e-4 vs zero-motion 7.1e-4 on noise; the order
    flips decisively on piecewise-smooth texture, which is also the regime
    real images live in). Default False keeps every other task's synthetic
    data bit-identical.
    """
    H, W = hw
    if smooth_background:
        # Wider contrast than the noise path (40-110 vs 60-90): the
        # photometric gradient w.r.t. depth scales with local texture
        # contrast, and the parallax shifts being disambiguated are <3 px.
        hb, wb = max(H // 4, 2), max(W // 4, 2)
        base = rng.integers(40, 110, (hb, wb, 3)).astype(np.uint8)
        yy, xx = np.meshgrid(
            np.linspace(0.0, hb - 1.0, H, dtype=np.float32),
            np.linspace(0.0, wb - 1.0, W, dtype=np.float32),
            indexing="ij",
        )
        img = _bilinear_np(base, xx, yy)
    else:
        img = rng.integers(60, 90, (H, W, 3)).astype(np.uint8)
    n = int(rng.integers(1, max_objects + 1))
    boxes = np.zeros((max_objects, 4), np.float32)
    classes = np.zeros((max_objects,), np.int32)
    mask = np.zeros((H, W), np.uint8)
    depth = np.zeros((H, W), np.float32)

    # Background depth: smooth vertical gradient (road-like).
    depth[:] = np.linspace(40.0, 5.0, H)[:, None]

    for k in range(n):
        bw = int(rng.integers(W // 8, W // 3))
        bh = int(rng.integers(H // 8, H // 3))
        x0 = int(rng.integers(0, max(W - bw, 1)))
        y0 = int(rng.integers(0, max(H - bh, 1)))
        c = int(rng.integers(0, num_classes))
        if smooth_background:
            # Textured interiors (smooth luminance modulation of the class
            # color): a flat patch carries zero parallax signal inside —
            # any constant depth explains it — so two-frame scenes need
            # texture ON the near objects, not just the background.
            hb, wb = max(bh // 4, 2), max(bw // 4, 2)
            lum = rng.uniform(0.55, 1.45, (hb, wb, 1)).astype(np.float32)
            yy, xx = np.meshgrid(
                np.linspace(0.0, hb - 1.0, bh, dtype=np.float32),
                np.linspace(0.0, wb - 1.0, bw, dtype=np.float32),
                indexing="ij",
            )
            lum255 = np.clip(lum * 170.0, 0, 255).astype(np.uint8)
            mod = _bilinear_np(lum255, xx, yy).astype(np.float32) / 170.0
            patch = _CLASS_COLORS[c].astype(np.float32) * mod
            img[y0 : y0 + bh, x0 : x0 + bw] = np.clip(
                np.round(patch), 0, 255).astype(np.uint8)
        else:
            img[y0 : y0 + bh, x0 : x0 + bw] = _CLASS_COLORS[c]
        boxes[k] = [x0, y0, x0 + bw, y0 + bh]
        classes[k] = c
        mask[y0 : y0 + bh, x0 : x0 + bw] = c
        depth[y0 : y0 + bh, x0 : x0 + bw] = float(rng.uniform(5.0, 30.0))

    return {
        "image": img,
        "image_hw": np.array([H, W], np.int32),
        "boxes": boxes,
        "classes": classes,
        "num_objects": np.int32(n),
        "mask": mask,
        "depth": depth,
    }


def _bilinear_np(img: np.ndarray, sx: np.ndarray, sy: np.ndarray) -> np.ndarray:
    """Bilinear-sample an (H, W, C) uint8 image at float coords (sy, sx)."""
    x0 = np.floor(sx).astype(np.int64)
    y0 = np.floor(sy).astype(np.int64)
    x1 = np.minimum(x0 + 1, img.shape[1] - 1)
    y1 = np.minimum(y0 + 1, img.shape[0] - 1)
    wx = (sx - x0)[..., None]
    wy = (sy - y0)[..., None]
    f = img.astype(np.float32)
    top = f[y0, x0] * (1.0 - wx) + f[y0, x1] * wx
    bot = f[y1, x0] * (1.0 - wx) + f[y1, x1] * wx
    return np.clip(np.round(top * (1.0 - wy) + bot * wy), 0, 255).astype(np.uint8)


def synthetic_batch(
    rng: np.random.Generator,
    batch_size: int,
    pad_hw: Tuple[int, int],
    num_classes: int = 3,
    max_objects: int = 8,
    vary_sizes: bool = True,
    two_frame: bool = False,
    with_3d: bool = False,
    yuv420: bool = False,
) -> Dict[str, np.ndarray]:
    """Batch of scenes padded to ``pad_hw`` (the loader's static buffer shape).

    ``yuv420=True`` emits the production wire format (planar y/u/v instead
    of an rgb "image" key), matching RecordLoader(output_format="yuv420").
    """
    Hm, Wm = pad_hw
    if yuv420:
        assert Hm % 2 == 0 and Wm % 2 == 0, "pad size must be even for 4:2:0"
    out: Dict[str, list] = {k: [] for k in
                            ("image", "image_hw", "boxes", "classes", "num_objects", "mask", "depth")}
    if two_frame:
        out["image_t1"] = []
        out["ego_t"] = []  # GT camera translation (tx, ty) behind image_t1
    if with_3d:
        out["loc3d"] = []
        out["dims3d"] = []
        out["rot_y"] = []
    if two_frame or with_3d:
        out["intrinsics"] = []  # monocular 3D decode and DMDS both need K
    for _ in range(batch_size):
        if vary_sizes:
            H = int(rng.integers(int(Hm * 0.7), Hm + 1))
            W = int(rng.integers(int(Wm * 0.7), Wm + 1))
        else:
            H, W = Hm, Wm
        if yuv420:  # even valid extents keep the chroma planes aligned
            H -= H % 2
            W -= W % 2
        s = synthetic_sample(rng, (H, W), num_classes, max_objects,
                             smooth_background=two_frame)
        s["image_hw"] = np.array([H, W], np.int32)
        img = np.zeros((Hm, Wm, 3), np.uint8)
        img[:H, :W] = s["image"]
        msk = np.zeros((Hm, Wm), np.uint8)
        msk[:H, :W] = s["mask"]
        dep = np.zeros((Hm, Wm), np.float32)
        dep[:H, :W] = s["depth"]
        out["image"].append(img)
        out["image_hw"].append(s["image_hw"])
        out["boxes"].append(s["boxes"])
        out["classes"].append(s["classes"])
        out["num_objects"].append(s["num_objects"])
        out["mask"].append(msk)
        out["depth"].append(dep)
        if with_3d:
            # Plausible camera-frame 3D labels correlated with 2D box size
            # (bigger box → closer object), so the 3D heads are learnable.
            k = max_objects
            sizes = (s["boxes"][:, 2] - s["boxes"][:, 0]) + 1e-3
            z = np.clip(800.0 / sizes, 2.0, 80.0).astype(np.float32)
            loc = np.zeros((k, 3), np.float32)
            loc[:, 2] = z
            dims = np.tile(np.array([1.6, 1.8, 4.2], np.float32), (k, 1))
            out["loc3d"].append(loc)
            out["dims3d"].append(dims)
            out["rot_y"].append(rng.uniform(-np.pi, np.pi, k).astype(np.float32))
        if two_frame:
            # Frame t+1 from a depth-consistent lateral ego-motion: a camera
            # translating by (tx, ty) meters moves a pixel observing depth Z
            # by (fx*tx/Z, fy*ty/Z) px — near structure moves farther than
            # the distant background, so the photometric loss identifies the
            # scene's (scale-free) depth. The earlier uniform np.roll shift
            # was depth-independent: any depth map explained it, and the
            # median-scaled depth eval on this data read pure noise
            # (delta1 ~0.2, dmds_acc 2026-08-19).
            fx = fy = 0.9 * W  # must match the intrinsics emitted below
            tx = float(rng.uniform(0.10, 0.28)) * (1.0 if rng.random() < 0.5 else -1.0)
            ty = float(rng.uniform(-0.06, 0.06))
            inv_z = 1.0 / np.maximum(s["depth"], 0.5)
            yy, xx = np.meshgrid(np.arange(H, dtype=np.float32),
                                 np.arange(W, dtype=np.float32), indexing="ij")
            # Inverse warp: the frame-t+1 pixel p samples frame t at
            # p + f*t/Z(p). Z is taken at the TARGET pixel — exact for this
            # piecewise-constant scene away from occlusion edges. Bilinear
            # sampling keeps the generative process inside the model family
            # (ops/warp.py uses bilinear sampling too).
            src_x = np.clip(xx + fx * tx * inv_z, 0.0, W - 1.0)
            src_y = np.clip(yy + fy * ty * inv_z, 0.0, H - 1.0)
            img2 = np.zeros((Hm, Wm, 3), np.uint8)
            img2[:H, :W] = _bilinear_np(s["image"], src_x, src_y)
            out["image_t1"].append(img2)
            out["ego_t"].append(np.array([tx, ty], np.float32))
        if two_frame or with_3d:
            out["intrinsics"].append(
                np.array([0.9 * W, 0.9 * W, W / 2.0, H / 2.0], np.float32)
            )
    batch = {k: np.stack(v) for k, v in out.items()}
    if yuv420:
        from cvm_tpu.native import _rgb_to_yuv420_np

        planes = [_rgb_to_yuv420_np(im) for im in batch.pop("image")]
        batch["y"] = np.stack([p[0] for p in planes])
        batch["u"] = np.stack([p[1] for p in planes])
        batch["v"] = np.stack([p[2] for p in planes])
        if two_frame:
            planes = [_rgb_to_yuv420_np(im) for im in batch.pop("image_t1")]
            batch["y_t1"] = np.stack([p[0] for p in planes])
            batch["u_t1"] = np.stack([p[1] for p in planes])
            batch["v_t1"] = np.stack([p[2] for p in planes])
    return batch


def synthetic_iterator(
    seed: int,
    batch_size: int,
    pad_hw: Tuple[int, int],
    num_classes: int = 3,
    max_objects: int = 8,
    two_frame: bool = False,
    with_3d: bool = False,
) -> Iterator[Dict[str, np.ndarray]]:
    rng = np.random.default_rng(seed)
    while True:
        yield synthetic_batch(
            rng, batch_size, pad_hw, num_classes, max_objects,
            two_frame=two_frame, with_3d=with_3d,
        )
