"""Test config: force the JAX CPU backend with 8 virtual devices so sharding
and collective logic is exercised without TPU hardware (SURVEY.md §4.3).

TPU lane: `TPUBWA_TPU_TESTS=1 python -m pytest tests -m tpu` keeps the real
backend and runs ONLY the @pytest.mark.tpu tests (kernel parity + one e2e
batch on the chip — tests/test_tpu_lane.py). Without the env var, tpu-marked
tests are skipped and everything else runs CPU-forced as before.

The axon TPU plugin in this image presets jax_platforms to "axon,cpu" and
ignores JAX_PLATFORMS, so we must also update the config after import."""
import os

import pytest

TPU_LANE = os.environ.get("TPUBWA_TPU_TESTS") == "1"

if not TPU_LANE:
    os.environ["JAX_PLATFORM_NAME"] = "cpu"
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = \
            (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

if not TPU_LANE:
    jax.config.update("jax_platforms", "cpu")


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "tpu: runs on the real chip (TPUBWA_TPU_TESTS=1 lane)")


def pytest_collection_modifyitems(config, items):
    if TPU_LANE:
        skip = pytest.mark.skip(
            reason="TPU lane runs only @pytest.mark.tpu tests")
        for it in items:
            if "tpu" not in it.keywords:
                it.add_marker(skip)
    else:
        skip = pytest.mark.skip(
            reason="needs TPUBWA_TPU_TESTS=1 and a real chip")
        for it in items:
            if "tpu" in it.keywords:
                it.add_marker(skip)
