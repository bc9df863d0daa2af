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
    enable_compilation_cache()


def enable_compilation_cache() -> None:
    """Point jax at a persistent compilation cache (big XLA programs compile
    in minutes over a remote backend; cached recompiles are seconds). Every
    CLI entry point gets this via apply_platform_env — not just benchmarks."""
    import jax

    cache_dir = os.environ.get(
        "JAX_COMPILATION_CACHE_DIR",
        os.path.join(os.path.expanduser("~"), ".jax_cache"),
    )
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:
        pass  # older jax without these options
