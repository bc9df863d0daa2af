"""SSIM for photometric consistency losses (DMDS; SURVEY.md §3.4)."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _avg_pool3(x: jnp.ndarray) -> jnp.ndarray:
    """3x3 stride-1 VALID average pool over (B, H, W, C)."""
    s = jax.lax.reduce_window(
        x, 0.0, jax.lax.add, (1, 3, 3, 1), (1, 1, 1, 1), "VALID"
    )
    return s / 9.0


def ssim(a: jnp.ndarray, b: jnp.ndarray, c1: float = 0.01**2, c2: float = 0.03**2) -> jnp.ndarray:
    """Structural similarity on [0, 1] images; returns per-pixel (1-SSIM)/2 map.

    Output is (B, H-2, W-2, C) (VALID window), the standard form used in
    photometric losses (Monodepth/DMDS convention).
    """
    mu_a = _avg_pool3(a)
    mu_b = _avg_pool3(b)
    var_a = _avg_pool3(a * a) - mu_a * mu_a
    var_b = _avg_pool3(b * b) - mu_b * mu_b
    cov = _avg_pool3(a * b) - mu_a * mu_b
    num = (2.0 * mu_a * mu_b + c1) * (2.0 * cov + c2)
    den = (mu_a * mu_a + mu_b * mu_b + c1) * (var_a + var_b + c2)
    s = num / den
    return jnp.clip((1.0 - s) * 0.5, 0.0, 1.0)
