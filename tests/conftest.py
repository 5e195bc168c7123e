"""Test configuration: force an 8-device virtual CPU mesh.

The ambient environment preloads jax at interpreter startup (site
customization) with JAX_PLATFORMS=axon (the TPU tunnel), so env vars
set here are too late — the platform must be overridden through
jax.config. XLA_FLAGS is still read at (lazy) backend initialization,
so the virtual device count works from here as long as no test
touched a device before conftest import (pytest imports conftest
first).
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

assert jax.devices()[0].platform == "cpu", (
    "tests must run on the CPU backend; got " + str(jax.devices()[:1])
)
assert len(jax.devices()) == 8, "expected 8 virtual CPU devices"
