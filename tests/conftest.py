"""Test config: CPU backend with 8 virtual devices, float64 enabled.

Per SURVEY.md §4: mesh/sharding tests run on a virtual 8-device CPU mesh;
equivalence tests run in float64 (the float32 TPU path has its own documented
tolerance).
"""
import os

# NOTE: this environment's sitecustomize force-registers the axon TPU backend
# and sets JAX_PLATFORMS=axon; the env var route is ignored, but
# jax.config.update("jax_platforms", ...) before first backend use wins.
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
