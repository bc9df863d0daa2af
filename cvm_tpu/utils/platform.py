"""Platform selection helper.

The deployment environment may pin JAX_PLATFORMS via an early sitecustomize
(before user code runs), so a plain env var is not enough to retarget jax.
``apply_platform_env()`` lets CVM_PLATFORM=cpu|tpu|axon override after
import; CLIs call it first thing.
"""

from __future__ import annotations

import os


def apply_platform_env() -> None:
    plat = os.environ.get("CVM_PLATFORM")
    if plat:
        import jax

        jax.config.update("jax_platforms", plat)
