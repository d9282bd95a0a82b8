"""Test configuration: force CPU with 8 virtual devices + float64.

SURVEY.md section 4: multi-chip logic is exercised on a virtual CPU mesh via
XLA_FLAGS=--xla_force_host_platform_device_count=8; physics oracles run in f64.

Note: this environment pins JAX_PLATFORMS=axon (remote TPU tunnel) at
interpreter startup, so the env var alone is not enough — we must override via
jax.config *before* any backend is initialized.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
assert jax.devices()[0].platform == "cpu"

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)


# Full-suite runs accumulate thousands of compiled CPU executables in one
# process; past ~220 tests the XLA CPU backend_compile can hard-abort
# ("Fatal Python error: Aborted" inside backend_compile_and_load, observed
# at different tests on different runs — state-dependent, never
# reproducible for a file run alone).  Dropping JAX's compilation/tracing
# caches between modules bounds that state; per-module recompiles cost
# little since the suite mostly re-jits per module anyway.
@pytest.fixture(scope="module", autouse=True)
def _clear_jax_caches_between_modules():
    yield
    jax.clear_caches()
