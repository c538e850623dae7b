"""Test configuration: force an 8-device virtual CPU platform.

Multi-chip TPU hardware is not available in CI; sharding behavior is
validated on a virtual 8-device CPU mesh. Must run before jax imports.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # the session presets JAX_PLATFORMS=axon (TPU)
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# A pytest plugin may import jax before this conftest runs, freezing the
# platform choice from the session env (axon/TPU); override it explicitly.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
