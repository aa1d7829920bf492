"""Test configuration: force the JAX CPU backend with 8 virtual devices so
multi-chip sharding logic is exercised without TPU hardware (the fake-backend
strategy called for in SURVEY.md §4)."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
# never register the axon tunnel backend from tests: registration CLAIMS
# the single-chip tunnel at import even under JAX_PLATFORMS=cpu, and a
# second process then blocks inside `import jax` until the holder exits
os.environ["PALLAS_AXON_POOL_IPS"] = ""
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


_last_module = [None]


@pytest.fixture(autouse=True)
def _clear_jax_caches_per_module(request):
    """Drop compiled-executable caches between test MODULES: a full-suite
    run compiles thousands of programs in one process and the XLA CPU
    client eventually aborts/OOMs around the ~500-test mark (observed:
    SIGSEGV/SIGABRT/MemoryError inside backend_compile). Within-module
    reuse (fixtures sharing shapes) is preserved."""
    mod = request.module.__name__
    if _last_module[0] is not None and _last_module[0] != mod:
        jax.clear_caches()
        import gc
        gc.collect()
    _last_module[0] = mod
    yield
