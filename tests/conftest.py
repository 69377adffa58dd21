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

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# persistent compilation cache: big win on this 1-CPU host across reruns.
# Keyed by a machine fingerprint — foreign-host AOT entries fail to load
# (cpu_aot_loader.cc feature mismatch) and silently force cold recompiles.
from aadg_tpu.utils.cache import setup_compile_cache  # noqa: E402

setup_compile_cache()
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
# Cap the ISA at AVX2: at native ISA, XLA injects pseudo-features
# (+prefer-no-scatter/-gather) into the AOT executables that the loader's
# host-feature check rejects — every persistent-cache load FAILS
# (cpu_aot_loader.cc) and the big programs recompile cold EVERY run, even
# on the machine that wrote them. At AVX2 the entries reload cleanly
# (measured round 3), and are portable across amd64 hosts.
if "max_isa" not in flags:
    flags = (flags + " --xla_cpu_max_isa=AVX2").strip()
os.environ["XLA_FLAGS"] = flags

import numpy as np  # noqa: E402
import pytest  # noqa: E402


def pytest_collection_modifyitems(config, items):
    """Tier the suite: anything not explicitly heavy/slow is quick, so
    `pytest -m quick` is a complete fast tier (<10 min cold on this host)
    and every test belongs to exactly one tier."""
    for item in items:
        names = {m.name for m in item.iter_markers()}
        if not names & {"heavy", "slow", "proof"}:
            item.add_marker(pytest.mark.quick)


@pytest.fixture
def rng():
    return np.random.default_rng(0)
