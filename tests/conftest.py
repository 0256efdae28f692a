"""Test env: force CPU with 8 virtual devices (multi-chip sharding tests).

Must set env vars before jax initializes — mirrors the reference's
containers-on-one-host multi-GPU simulation strategy
(/root/reference/.buildkite/run-multi-node-test.sh).
"""

import os

# QSPEC_TPU_TESTS=1 keeps the real TPU platform so the tests/tpu tier can run
# Pallas kernels on the chip (reference .buildkite/run-tpu-test.sh analogue);
# the default CI run forces CPU + 8 virtual devices.
_TPU_TIER = os.environ.get("QSPEC_TPU_TESTS") == "1"

if not _TPU_TIER:
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

# this environment's sitecustomize pre-imports jax with platform "axon";
# config.update after the fact is the reliable override
import jax  # noqa: E402

if not _TPU_TIER:
    jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(1234)
