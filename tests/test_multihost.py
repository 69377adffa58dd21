"""Multi-host bring-up path (`parallel/mesh.py initialize_multihost`).

A real pod isn't available, so the rendezvous is exercised the way JAX
supports everywhere: `jax.distributed.initialize` with one process acting
as its own coordinator. That runs the full client/server handshake and the
distributed runtime, after which the usual mesh + collective path must
work. Runs in a subprocess because distributed init is global,
once-per-process state that must not leak into the shared test process.

Replaces the reference's mp.spawn + NCCL `init_process_group` rendezvous
(`/root/reference/distributed.py:15-31`).
"""

import socket
import subprocess
import sys
import textwrap
from pathlib import Path

import jax
import numpy as np

REPO = str(Path(__file__).resolve().parent.parent)


def _free_port():
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def test_initialize_multihost_single_process_rendezvous():
    port = _free_port()
    script = textwrap.dedent(f"""
        import os, sys
        import jax
        jax.config.update("jax_platforms", "cpu")
        os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "") +
            " --xla_force_host_platform_device_count=8").strip()
        sys.path.insert(0, {REPO!r})
        from aadg_tpu.parallel.mesh import initialize_multihost, make_mesh

        initialize_multihost("localhost:{port}", num_processes=1,
                             process_id=0)
        assert jax.process_count() == 1, jax.process_count()
        assert jax.process_index() == 0

        import jax.numpy as jnp
        from jax.sharding import NamedSharding, PartitionSpec as P

        mesh = make_mesh(8)
        xs = jax.device_put(jnp.arange(8.0),
                            NamedSharding(mesh, P("data")))
        assert len(xs.addressable_shards) == 8
        total = float(jax.jit(lambda v: v.sum())(xs))
        print("MULTIHOST_OK", total)
    """)
    proc = subprocess.run([sys.executable, "-c", script],
                          capture_output=True, text=True, timeout=600)
    assert proc.returncode == 0, proc.stderr[-3000:]
    assert "MULTIHOST_OK 28.0" in proc.stdout


def test_mesh_per_process_sharding_math():
    """Every device of the 1-D data mesh owns exactly batch/n rows —
    the invariant the DP epoch scan and the store sharding rely on."""
    from jax.sharding import NamedSharding, PartitionSpec as P
    from aadg_tpu.parallel.mesh import make_mesh

    mesh = make_mesh(8)
    sharding = NamedSharding(mesh, P("data"))
    x = np.arange(16 * 3, dtype=np.float32).reshape(16, 3)
    xs = jax.device_put(x, sharding)
    seen = {}
    for shard in xs.addressable_shards:
        rows = np.asarray(shard.data)
        assert rows.shape == (2, 3)
        seen[shard.device.id] = rows[:, 0].tolist()
    # contiguous, ordered, disjoint windows
    assert sorted(seen.keys()) == list(range(8))
    flat = [v for d in sorted(seen) for v in seen[d]]
    assert flat == x[:, 0].tolist()
