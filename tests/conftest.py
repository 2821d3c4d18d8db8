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
