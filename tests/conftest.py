"""Test configuration: force an 8-device virtual CPU mesh before jax imports.

Multi-chip sharding logic is validated on host devices
(xla_force_host_platform_device_count), the pattern the reference has no
analog of (it is single-GPU; SURVEY.md section 4).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # override any preset accelerator platform
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

import jax

# The axon sitecustomize imports jax at interpreter startup, so the env var
# alone is too late -- update the live config as well.
jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)
