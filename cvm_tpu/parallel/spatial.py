"""Spatial sharding with halo exchange — the conv-net analogue of context
parallelism (SURVEY.md §5 "long-context" row).

The zoo's models never need inputs bigger than one chip, but the framework
supports scaling the *spatial* axis across the mesh the way attention stacks
scale sequence length: the image's H dimension is sharded over a mesh axis,
and 3x3 convolutions exchange one-row halos with mesh neighbors via
``lax.ppermute`` (pure ICI traffic) before a VALID convolution, so the
sharded result is bit-identical to the unsharded op.

Usage (inside shard_map, or via the ``spatial_conv3x3`` wrapper):

    y = spatial_conv3x3(x, w, mesh, axis="model")

with x (B, H, W, C) sharded on H over ``axis`` and w (3, 3, C, Cout)
replicated.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def _halo_conv3x3_block(xb: jnp.ndarray, w: jnp.ndarray, axis: str) -> jnp.ndarray:
    """Per-shard body: exchange 1-row halos along ``axis``, conv VALID on H.

    xb : (B, H_local, W, C) this device's H-slab.
    """
    n = lax.axis_size(axis)

    # Send my bottom row down (it becomes the lower neighbor's top halo) and
    # my top row up. Devices with no source receive zeros — exactly the
    # zero padding a SAME conv applies at the global image border.
    top_halo = lax.ppermute(xb[:, -1:], axis, [(j, j + 1) for j in range(n - 1)])
    bot_halo = lax.ppermute(xb[:, :1], axis, [(j + 1, j) for j in range(n - 1)])

    xpad = jnp.concatenate([top_halo, xb, bot_halo], axis=1)  # (B, H+2, W, C)
    return lax.conv_general_dilated(
        xpad,
        w,
        window_strides=(1, 1),
        padding=((0, 0), (1, 1)),  # VALID on H (halos provide it), SAME on W
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    )


def spatial_conv3x3(
    x: jnp.ndarray,
    w: jnp.ndarray,
    mesh: Mesh,
    axis: str = "model",
    batch_axis: str | None = None,
) -> jnp.ndarray:
    """3x3 stride-1 SAME conv with H sharded over ``mesh[axis]``.

    Bit-identical to ``lax.conv_general_dilated(..., padding="SAME")`` on the
    gathered array (tests/test_spatial_sharding.py). H must divide evenly by
    the axis size (pad H upstream if needed — static shapes as usual).
    ``batch_axis`` additionally keeps the batch dimension sharded (pure DP)
    so this composes with the trainer's ("data", "model") layout without a
    batch all-gather.
    """
    fn = jax.shard_map(
        partial(_halo_conv3x3_block, axis=axis),
        mesh=mesh,
        in_specs=(P(batch_axis, axis, None, None), P()),
        out_specs=P(batch_axis, axis, None, None),
    )
    return fn(x, w)
