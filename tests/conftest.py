"""Test configuration: run everything on a virtual 8-device CPU mesh.

Multi-chip behavior is validated without TPU hardware by forcing the host
platform to expose 8 XLA CPU devices (SURVEY.md §4).

Note: this image pre-imports jax at interpreter startup (sitecustomize
registers the axon TPU plugin), so env vars are too late — we switch the
platform via jax.config before any backend is initialized.
"""

import os
import sys

import jax

jax.config.update("jax_platforms", "cpu")
# persistent compilation cache: big win on this 1-CPU host across reruns
_cache_dir = os.path.expanduser("~/.cache/jax_test_compilation")
os.makedirs(_cache_dir, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    flags = (flags + " --xla_force_host_platform_device_count=8").strip()
# XLA:CPU aborts the whole process when one replica thread reaches a
# collective >40s after the others (rendezvous.cc termination timeout).
# On a 1-core host the 8 virtual-device threads serialize, so big DP
# programs (whole-epoch lax.scan with per-step psums) trip it routinely —
# raise it; it exists to catch deadlocks, not slow hosts.
if "collective_call_terminate_timeout" not in flags:
    flags = (flags
             + " --xla_cpu_collective_call_terminate_timeout_seconds=7200"
             + " --xla_cpu_collective_call_warn_stuck_timeout_seconds=600"
             ).strip()
os.environ["XLA_FLAGS"] = flags

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
