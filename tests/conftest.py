"""Test env: force CPU with 8 virtual devices so sharding tests run anywhere.

Must run before jax initializes its backends (conftest import order
guarantees this for tests that import jax at module level).
"""

import os
import sys

# Force CPU even when the session env points at a (remote) TPU platform.
# A sitecustomize hook may have imported jax already (latching JAX_PLATFORMS
# from the env), so update the live config too — backends are registered at
# that point but not initialized, which is what matters.
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    _flags = (_flags + " --xla_force_host_platform_device_count=8").strip()
# 8 virtual devices timeshare one host core: under load a device thread can
# miss XLA:CPU's 40 s collective-rendezvous terminate timeout, which ABORTS
# the process (rendezvous.cc "Termination timeout ... exceeded"). Benign
# oversubscription, not deadlock — raise the limits for the mesh tests.
if "collective_call_terminate_timeout" not in _flags:
    _flags += (" --xla_cpu_collective_call_terminate_timeout_seconds=600"
               " --xla_cpu_collective_call_warn_stuck_timeout_seconds=120")
os.environ["XLA_FLAGS"] = _flags

# The XLA:CPU persistent compilation cache is DISABLED: this jaxlib's
# cpu_aot_loader is self-incompatible — compiled AOT entries embed tuning
# pseudo-features (+prefer-no-scatter, +prefer-no-gather) that the host
# feature detector never reports, so EVERY load (even of entries this
# same machine wrote moments earlier) logs a machine-feature mismatch and
# some loads execute trapping code: random SIGILL/SIGABRT mid-suite on an
# Eigen worker, with the Python stack parked at whatever eager op the
# main thread happened to be dispatching. Three suite runs died this way
# before the loader warning pinpointed it. A fresh per-process dir plus a
# prohibitive min-compile-time means no loads and no writes ever happen;
# within one pytest process the in-memory jit cache still dedups
# everything. (The TPU cache in bench/TPU scripts is a different,
# unaffected serialization path and stays on.)
os.environ["JAX_COMPILATION_CACHE_DIR"] = f"/tmp/jax_test_nocache_{os.getpid()}"
os.environ["JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS"] = "100000"

import jax  # noqa: E402  (after env setup on purpose)

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 100000)

import pathlib

import numpy as np
import pytest

GOLDEN_DIR = pathlib.Path(__file__).parent / "goldens"


@pytest.fixture(scope="session")
def goldens():
    """Load all golden fixture files lazily as a dict of npz objects."""
    def load(name):
        path = GOLDEN_DIR / f"{name}.npz"
        if not path.exists():
            pytest.skip(f"golden fixture {name} missing (run tests/golden_gen)")
        return np.load(path)
    return load
