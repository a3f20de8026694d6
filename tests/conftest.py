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

# Persistent compilation cache makes repeated test runs fast. The dir is
# keyed by a host-CPU fingerprint: XLA:CPU AOT executables embed machine
# features, and loading an entry cached on a DIFFERENT host (sandboxes
# migrate) aborts the process at execute time (cpu_aot_loader.cc
# "machine type ... doesn't match", then SIGILL/abort).


def _host_cache_dir(prefix: str) -> str:
    import hashlib
    try:
        with open("/proc/cpuinfo") as f:
            flags = next(line for line in f if line.startswith("flags"))
    except (OSError, StopIteration):
        import platform

        flags = platform.processor() or "unknown"
    # + boot id: virtualization masks CPU identity (generic model name,
    # microcode 0x1), so identical-cpuinfo hosts can still have
    # incompatible AOT machine features (observed: SIGABRT in
    # apply_primitive mid-suite). Entries therefore never outlive the
    # sandbox life that compiled them.
    try:
        with open("/proc/sys/kernel/random/boot_id") as f:
            flags += f.read()
    except OSError:
        pass
    return f"{prefix}_{hashlib.sha1(flags.encode()).hexdigest()[:10]}"


_CACHE_DIR = _host_cache_dir("/tmp/jax_test_cache")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", _CACHE_DIR)
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.5")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")

import jax  # noqa: E402  (after env setup on purpose)

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

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
