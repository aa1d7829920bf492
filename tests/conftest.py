"""Test configuration: force the JAX CPU backend with 8 virtual devices so
multi-chip sharding logic is exercised without TPU hardware (the fake-backend
strategy called for in SURVEY.md §4)."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax

# the axon boot shim (sitecustomize) force-selects the TPU backend via
# jax.config; override it after import so tests run on the virtual CPU mesh
jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(42)
