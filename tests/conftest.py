# Tests run on a virtual 8-device CPU mesh so sharded paths are exercised
# without TPU hardware (SURVEY.md section 4: multi-host without a cluster).
#
# Note: the session's sitecustomize may import jax at interpreter startup
# (TPU plugin registration), so plain env vars are too late — use
# jax.config.update after import.  XLA_FLAGS is still read lazily at first
# backend initialisation, so setting it here works.
import os
import sys

import pytest

# Real-TPU tier: HORAYZON_TPU_TESTS=1 keeps the session's real backend and
# enables the `tpu`-marked hardware regression tests
# (HORAYZON_TPU_TESTS=1 pytest -m tpu).  Default: virtual CPU mesh, tpu
# tests skipped.
RUN_TPU_TIER = os.environ.get("HORAYZON_TPU_TESTS") == "1"

if not RUN_TPU_TIER:
    _flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in _flags:
        os.environ["XLA_FLAGS"] = (
            _flags + " --xla_force_host_platform_device_count=8").strip()
    os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

if not RUN_TPU_TIER:
    jax.config.update("jax_platforms", "cpu")


def pytest_collection_modifyitems(config, items):
    if RUN_TPU_TIER:
        return
    skip = pytest.mark.skip(
        reason="real-TPU tier (set HORAYZON_TPU_TESTS=1 and run -m tpu)")
    for item in items:
        if "tpu" in item.keywords:
            item.add_marker(skip)


sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
