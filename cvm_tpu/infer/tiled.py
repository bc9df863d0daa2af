"""Tiled (sliding-window) inference for dense-prediction models.

Serves images LARGER than the training resolution: the image is covered by
overlapping fixed-size tiles, every tile runs through one compiled forward
(static tile shape + static tile-batch → a single XLA program reused for
every chunk and every image size), and overlaps blend under a Hann window so
tile seams vanish from the stitched map.

TPU-first design notes:
- The model never sees a dynamic shape: tiles are cut with STATIC slice
  starts (Python ints from the tile grid), chunks are padded to a fixed
  ``tile_batch``, and the blend is a short unrolled sequence of
  static-offset ``.at[].add`` updates — all inside one jit.
- Per distinct full-image (H, W) the stitcher traces once (arbitrary-size
  serving is inherently shape-polymorphic); the inner model program is
  shared across all of them via the fixed tile shape.

The reference serves fixed-size inputs only (SURVEY.md §3.2); tiled serving
is additional capability on top of parity, standard practice for high-res
semantic segmentation / depth.
"""

from __future__ import annotations

import functools
from typing import Callable, List, Tuple

import numpy as np


def tile_positions(full: int, tile: int, overlap: float) -> List[int]:
    """Start offsets covering [0, full) with ~``overlap`` fractional overlap.

    The last tile is clamped to the border (standard sliding-window grid),
    so coverage is exact for any full >= 1; full < tile yields [0] (caller
    pads).
    """
    if not 0.0 <= overlap < 1.0:
        # overlap < 0 strides PAST the tile size (uncovered gaps -> 0/0 NaNs
        # in the blend); overlap >= 1 clamps the stride to 1px (a ~tile-count
        # explosion that looks like a hang). Fail loudly instead.
        raise ValueError(f"overlap must be in [0, 1), got {overlap}")
    if tile >= full:
        return [0]
    stride = max(1, int(round(tile * (1.0 - overlap))))
    pos = list(range(0, full - tile + 1, stride))
    if pos[-1] != full - tile:
        pos.append(full - tile)
    return pos


@functools.lru_cache(maxsize=8)
def _hann2d(th: int, tw: int):
    """Separable Hann blend window, floored so borders keep nonzero weight
    (border tiles have no overlapping partner there — the floor makes the
    weighted average well-defined everywhere)."""
    import jax.numpy as jnp

    wy = 0.5 - 0.5 * np.cos(2.0 * np.pi * (np.arange(th) + 0.5) / th)
    wx = 0.5 - 0.5 * np.cos(2.0 * np.pi * (np.arange(tw) + 0.5) / tw)
    w = np.outer(wy, wx).astype(np.float32) + 1e-2
    return jnp.asarray(w[..., None])


def tiled_apply(
    apply_fn: Callable,
    image,
    tile_hw: Tuple[int, int],
    overlap: float = 0.25,
    tile_batch: int = 8,
):
    """Stitch ``apply_fn`` over ``image`` with overlapping tiles.

    apply_fn : (tile_batch, th, tw, C_in) -> (tile_batch, th, tw, C_out),
        same spatial resolution (dense prediction); jitted inside.
    image    : (H, W, C_in) float array (already normalized).
    Returns (H, W, C_out) blended prediction.
    """
    import jax
    import jax.numpy as jnp

    th, tw = tile_hw
    H, W = int(image.shape[0]), int(image.shape[1])
    ph, pw = max(H, th), max(W, tw)
    if (ph, pw) != (H, W):  # image smaller than a tile: pad, crop at the end
        image = jnp.pad(image, ((0, ph - H), (0, pw - W), (0, 0)))
    ys = tile_positions(ph, th, overlap)
    xs = tile_positions(pw, tw, overlap)
    grid = [(y, x) for y in ys for x in xs]

    jfn = jax.jit(apply_fn)
    window = _hann2d(th, tw)

    # Cut/chunk/blend are each ONE jitted program (static grid unrolled
    # inside) — eager per-tile ops would be 3x-per-tile dispatch RPCs over
    # a remote backend. The model program (jfn) is reused for every chunk
    # via the fixed tile_batch (last chunk padded by repeating tile 0).
    T = len(grid)
    pad = (-T) % tile_batch

    @jax.jit
    def _cut(im):
        tiles = jnp.stack([im[y:y + th, x:x + tw] for (y, x) in grid])
        if pad:
            tiles = jnp.concatenate(
                [tiles, jnp.repeat(tiles[:1], pad, axis=0)])
        return tiles

    tiles = _cut(image)
    preds = [jfn(tiles[i:i + tile_batch])
             for i in range(0, T + pad, tile_batch)]
    if preds[0].shape[1:3] != (th, tw):
        raise ValueError(
            f"tiled_apply needs same-resolution dense output, got tile "
            f"{(th, tw)} -> {tuple(preds[0].shape[1:3])}"
        )

    @jax.jit
    def _blend(chunks):
        p = jnp.concatenate(chunks)[:T]
        out = jnp.zeros((ph, pw, p.shape[-1]), jnp.float32)
        wsum = jnp.zeros((ph, pw, 1), jnp.float32)
        for i, (y, x) in enumerate(grid):
            out = out.at[y:y + th, x:x + tw].add(p[i] * window)
            wsum = wsum.at[y:y + th, x:x + tw].add(window)
        return (out / wsum)[:H, :W]

    return _blend(preds)


def tiled_predict(spec, cfg, variables, image_u8, overlap: float = 0.25,
                  tile_batch: int = 8):
    """High-res dense prediction for a zoo model (semseg/depth/multitask).

    image_u8: (H, W, 3) uint8 RGB at ANY resolution >= 1px. Returns the
    model's dense output stitched at full (H, W):
      semseg   -> {"logits", "class_map"}
      depth    -> {"depth"}
      multitask-> {"logits", "class_map", "depth"}
    Uses the training normalization (normalize_pm1) and, for qat configs,
    the same fake-quant forward the pipeline serves (one code path for
    numerics — infer/pipeline.py).
    """
    import jax.numpy as jnp

    from cvm_tpu.models.registry import build_model
    from cvm_tpu.ops.image import normalize_pm1

    dense_keys = {
        "semseg": ("logits",),
        "depth": ("depth",),
        "multitask": ("logits", "depth"),
    }.get(spec.name)
    if dense_keys is None:
        raise ValueError(
            f"tiled inference is for dense-prediction models, not {spec.name!r} "
            "(detection needs global context per tile; run the fixed-size "
            "InferencePipeline instead)"
        )

    model = build_model(spec, cfg)
    base_apply = model.apply
    if bool(getattr(cfg, "qat", False)):
        from cvm_tpu.train.qat import fake_quant_training

        fp_apply = base_apply

        def base_apply(*a, **kw):
            with fake_quant_training():
                return fp_apply(*a, **kw)

    image = normalize_pm1(jnp.asarray(image_u8))
    # ONE forward per tile regardless of how many dense heads the model has:
    # concatenate the dense outputs along channels, stitch once, split back
    # (running tiled_apply per key would re-run the whole backbone per key).
    n_cls = int(getattr(cfg, "num_seg_classes",  # multitask field name
                        getattr(cfg, "num_classes", 0)))
    widths = {"logits": n_cls, "depth": 1}

    def one(tiles):
        o = base_apply(variables, tiles, train=False)
        return jnp.concatenate(
            [o[k].astype(jnp.float32) for k in dense_keys], axis=-1)

    stitched = tiled_apply(one, image, cfg.input_hw, overlap, tile_batch)
    out = {}
    c0 = 0
    for k in dense_keys:
        c1 = c0 + widths[k]
        out[k] = stitched[..., c0:c1]
        c0 = c1
    if "logits" in out:
        out["class_map"] = jnp.argmax(out["logits"], axis=-1)
    return out
