"""Backend detection helpers."""

from __future__ import annotations

import jax


def is_tpu_backend() -> bool:
    """True when the default backend lowers to TPU (incl. tunneled plugins)."""
    try:
        plat = jax.default_backend()
    except Exception:
        return False
    if plat in ("tpu", "axon"):
        return True
    try:
        return "TPU" in str(jax.devices()[0])
    except Exception:
        return False
