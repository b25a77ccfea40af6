"""Test harness: force an 8-device CPU mesh before JAX initializes.

Mirrors the SURVEY.md §4 strategy: mesh semantics (global-coverage means, BN
axis handling, gradient reductions) are exercised on a virtual 8-device CPU
platform so every data-parallel invariant is tested without TPU hardware.
"""

import os

# Force-set (not setdefault): the session environment pins JAX_PLATFORMS=axon
# (the real-TPU tunnel); tests must run on the virtual 8-device CPU platform.
# The axon sitecustomize imports jax at interpreter start, so the env var alone
# is latched too early — jax.config.update below is what actually takes effect.
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
