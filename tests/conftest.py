"""Test configuration: run everything on a virtual 8-device CPU mesh.

This is the TPU-world "fake backend" the reference lacked (SURVEY.md §4):
multi-chip sharding code paths are exercised on host CPU devices via
--xla_force_host_platform_device_count.

Note: the environment pre-sets JAX_PLATFORMS=axon via a sitecustomize hook that
imports jax config at interpreter startup, so plain os.environ assignment is
too late — we must go through jax.config.update.

Parallel runs: `python -m pytest tests/ -q -n <workers>` (pytest-xdist)
works — every fixture here is per-worker (env vars + the 8-device topology
are set at conftest import inside each worker process; the module-scope
clear_caches fixture clears each worker's own caches). It only pays off on
multi-core hosts; the round-4 build container exposes a SINGLE CPU
(len(os.sched_getaffinity(0)) == 1), where the serial suite time is simply
the sum of the work.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"
# CPU tests default to the XLA scan (Pallas interpret mode is slow); the
# dedicated kernel tests in test_lstm_pallas.py call the Pallas impl
# explicitly and verify parity.
os.environ.setdefault("E2E_ASR_NO_PALLAS", "1")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session", autouse=True)
def _assert_cpu_mesh():
    devices = jax.devices()
    assert devices[0].platform == "cpu", devices
    assert len(devices) == 8, devices
    yield


@pytest.fixture(scope="module", autouse=True)
def _clear_jax_caches_between_modules():
    """Drop compiled-executable caches after each test module.

    The full suite compiles hundreds of XLA CPU programs into one
    long-lived process; without clearing, the accumulated executables/
    allocator state eventually destabilizes late modules (observed as a
    segfault in tests that pass in isolation). Cross-module cache hits are
    rare, so the runtime cost is small."""
    yield
    jax.clear_caches()


@pytest.fixture
def rng():
    return np.random.default_rng(0)
