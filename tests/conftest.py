"""Test config: force the JAX CPU backend with 8 virtual devices so sharding
and collective logic is exercised without TPU hardware (SURVEY.md §4.3).

The axon TPU plugin in this image presets jax_platforms to "axon,cpu" and
ignores JAX_PLATFORMS, so we must also update the config after import."""
import os

os.environ["JAX_PLATFORM_NAME"] = "cpu"
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")
