"""
Test configuration: force an 8-device virtual CPU mesh so multi-chip sharding paths
compile and execute without TPU hardware (the driver's dryrun does the same).
Must run before jax is imported anywhere.

GANCE_TPU_HW_TESTS=1 skips the CPU forcing so the @tpu-marked hardware tests
(tests/test_tpu_hardware.py) run on the real chip:
    GANCE_TPU_HW_TESTS=1 python -m pytest tests/ -m tpu -q
(the reference split its suite the same way with an @gpu marker, pytest.ini:10).
"""

import os

_HW = os.environ.get("GANCE_TPU_HW_TESTS") == "1"

if not _HW:
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()

import jax  # noqa: E402

if not _HW:
    # The axon TPU plugin ignores the JAX_PLATFORMS env var; the config flag works.
    jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


def pytest_collection_modifyitems(config, items):
    """
    In hardware mode, run ONLY @tpu-marked tests regardless of -m: the CPU
    forcing above is off for the whole process, so the CPU-sized tests would
    (a) fail anywhere they assert the 8-virtual-device mesh and (b) hammer the
    tunneled remote compiler with hundreds of tiny programs — the documented
    way to wedge it. Deselecting here makes `GANCE_TPU_HW_TESTS=1 pytest
    tests/` (without `-m tpu`) safe instead of a footgun.
    """
    if not _HW:
        return
    selected, deselected = [], []
    for item in items:
        (selected if item.get_closest_marker("tpu") else deselected).append(item)
    if deselected:
        config.hook.pytest_deselected(items=deselected)
        items[:] = selected


@pytest.fixture()
def rng() -> np.random.RandomState:
    return np.random.RandomState(1234)
