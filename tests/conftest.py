"""Test env: force an 8-device virtual CPU platform BEFORE jax imports.

Multi-chip sharding tests run on this virtual mesh; real-TPU benchmarks
live in bench.py, not the test suite.
"""

import os

# The harness pre-sets JAX_PLATFORMS=axon (the real TPU); tests must
# run on the virtual CPU mesh, so override unconditionally.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax

# The axon sitecustomize imports jax at interpreter startup with
# JAX_PLATFORMS=axon already in the env, so the env vars above are only
# a fallback; this config update is what actually selects CPU (and with
# it, local instead of remote-service XLA compilation).
jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest

# Persistent compile cache: the suite re-jits the same query/render
# programs every run; caching cuts wall time dramatically on re-runs.
# Keyed by the host CPU's feature set: /tmp persists across rounds on
# DIFFERENT machines, and XLA:CPU loads a stale AOT entry compiled for
# another CPU generation with a warning and SUBTLY DIFFERENT NUMERICS
# (r5: a bit-parity test failed only under pytest — the cache-loaded
# single-phase program disagreed with the freshly compiled two-phase
# one in the last ulp; "+prefer-no-gather ... not supported on the
# host machine").
import hashlib as _hl

try:
    _cpu = [ln for ln in open("/proc/cpuinfo") if ln.startswith("flags")][0]
except Exception:
    _cpu = "unknown"
jax.config.update(
    "jax_compilation_cache_dir",
    f"/tmp/pn2s_jax_cache_{_hl.md5(_cpu.encode()).hexdigest()[:10]}")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


@pytest.fixture
def rng():
    return np.random.default_rng(0)
