"""Test configuration: force an 8-device virtual CPU mesh before jax imports.

Multi-chip sharding logic is validated on host devices
(xla_force_host_platform_device_count), the pattern the reference has no
analog of (it is single-GPU; SURVEY.md section 4).
"""

import os

# TRAJCRAFTER_TPU_TESTS=1 (tests/run_tpu_tests.sh) keeps the real accelerator
# so `pytest -m tpu` can assert the Pallas kernels on the chip; the default
# suite runs on a forced 8-device virtual CPU mesh.
_ON_TPU = os.environ.get("TRAJCRAFTER_TPU_TESTS") == "1"

if not _ON_TPU:
    os.environ["JAX_PLATFORMS"] = "cpu"  # override preset accelerator platform
    flags = os.environ.get("XLA_FLAGS", "")
    if "host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

import jax

if not _ON_TPU:
    # The axon sitecustomize imports jax at interpreter startup, so the env
    # var alone is too late -- update the live config as well.
    jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)
