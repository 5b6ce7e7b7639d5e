"""Test configuration: run JAX on a virtual 8-device CPU mesh, and provide
the reference's pure-torch modules (Aggregation, Utils, Meshes, Converter)
as oracles where available (they run fine on CPU; only the CUDA ``_C``
extension is stubbed out)."""
import importlib
import os
import sys
import types

# Must happen before jax is imported anywhere.  Note: this environment's
# sitecustomize force-registers a TPU ("axon") backend and overrides
# JAX_PLATFORMS, so we also pin the platform through jax.config below.
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# Persistent compilation cache: the suite's cost is dominated by XLA CPU
# compiles of the unrolled planes pipeline at many distinct shapes; caching
# them makes repeat runs (the edit loop) fast.
jax.config.update(
    "jax_compilation_cache_dir",
    os.environ.get("JAX_TEST_CACHE_DIR", "/tmp/jax_test_comp_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import numpy as np  # noqa: E402
import pytest  # noqa: E402

assert jax.devices()[0].platform == "cpu"
assert len(jax.devices()) == 8

from ref_loader import _load_reference  # noqa: E402


@pytest.fixture(scope="session")
def ref():
    """The reference VoGE package (pure-torch parts only)."""
    return _load_reference()


@pytest.fixture(scope="session")
def rng():
    return np.random.RandomState(0)
