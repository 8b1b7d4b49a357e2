"""Test configuration: run on a virtual 8-device CPU mesh.

The reference has no automated tests at all (SURVEY.md §4); this suite is
the rebuild's replacement for its runtime NaN screens and validation
passes.  Multi-chip behaviour is tested on XLA's host-platform device farm
(the driver separately dry-runs the real multi-chip path).

Note: this machine's JAX install force-registers a remote-TPU ("axon")
platform via sitecustomize, ignoring JAX_PLATFORMS from the environment —
so we must override via jax.config after import, before any backend use.
"""

import os

xla_flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(1305)  # the reference's RNG seed


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """Drop compiled executables after each test module.

    Full-suite runs (only — every per-module subset passes) died with a
    native XLA:CPU crash (SIGSEGV/abort inside backend_compile_and_load)
    at a deterministic point ~80% in: cumulative compiler/executable
    state over ~180 jitted graphs on the 8-device farm.  Clearing
    between modules bounds that state; modules rarely share shapes so
    the lost cache hits are negligible.
    """
    yield
    jax.clear_caches()
