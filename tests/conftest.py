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
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
