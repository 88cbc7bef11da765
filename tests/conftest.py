"""Test config: force CPU with 8 virtual devices so multi-chip sharding logic
is exercised without TPU hardware (SURVEY §4 'distributed tests without a
cluster').

Note: this environment's sitecustomize imports jax and registers the 'axon'
TPU backend before pytest starts, so env vars alone are too late — we must use
``jax.config.update``. XLA_FLAGS is still read lazily at first CPU-client
creation, so setting it here works as long as no test module touches devices
at import time."""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)
