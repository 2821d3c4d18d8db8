"""Test configuration: run everything on a virtual 8-device CPU mesh so the
full suite (including multi-chip sharding tests) runs in CI without TPUs."""

import os

# Force CPU even if the environment pre-sets a TPU platform (e.g. axon):
# the suite relies on deterministic fp32 math and 8 virtual devices.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The axon sitecustomize force-selects its TPU backend via
# jax.config.update("jax_platforms", "axon,cpu") at interpreter start; the
# env var alone cannot win, so re-override through jax.config.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """Free compiled executables between test modules.

    The XLA CPU compiler segfaults deterministically deep into a single-
    process run of the full suite (~120 compiled programs in; the same
    compile succeeds in a fresh process, and disabling the persistent
    compilation cache does not help) — an upstream jitted-code-state
    crash, not a test bug. Dropping the executable caches per module keeps
    the process state small at the cost of some fixture recompiles.
    """
    yield
    jax.clear_caches()
