"""Test session config: run all tests on a virtual 8-device CPU mesh.

Multi-chip hardware is unavailable in CI, so sharding/pjit logic is exercised
with ``--xla_force_host_platform_device_count=8`` on the CPU backend
(SURVEY.md §4 item 4). Must run before the first ``import jax``.
"""

import os

# Force CPU: the ambient environment pins JAX_PLATFORMS to the (single-chip,
# tunneled) TPU and a sitecustomize imports jax at interpreter start, so env
# vars alone are too late — use jax.config. Export CVM_TEST_PLATFORM to
# override deliberately.
os.environ["JAX_PLATFORMS"] = os.environ.get("CVM_TEST_PLATFORM", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# Single-core CI: cut XLA CPU compile time for the many tiny test programs.
# Correctness tests only — perf measurement happens in bench.py on real TPU.
os.environ.setdefault("JAX_DISABLE_MOST_OPTIMIZATIONS", "1")

import jax  # noqa: E402

jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
