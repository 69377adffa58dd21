"""Device mesh construction.

Replaces the reference's process-launch layer (`/root/reference/
distributed.py:15-31`: mp.spawn + NCCL rendezvous at tcp://localhost:10001)
with JAX's single-controller model: a 1-D ``data`` mesh over all local (or
``jax.distributed``-initialized multi-host) devices. Collectives are XLA
ops over ICI — no rendezvous code exists because none is needed.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh


def device_count() -> int:
    return len(jax.devices())


def resolve_data_parallel(n_dp: int, batch_size: int) -> int:
    """Resolve ``cfg.TPU.DATA_PARALLEL`` to a device count.

    Bit-equivalence with the single-chip program requires equal shard
    windows, i.e. ``batch_size % n_devices == 0``. Auto mode (``n_dp <=
    0``, the ``--data_parallel -1`` default) picks the LARGEST visible
    device count that divides the batch; an explicit ``n_dp`` is strict
    and raises when it does not divide (reference analogue: DDP's
    per-GPU ``batch_size // n_gpus`` split, `models/__init__.py:37`)."""
    if n_dp > 0:
        if batch_size % n_dp:
            raise ValueError(
                f"TRAIN.BATCH_SIZE={batch_size} must divide evenly over "
                f"{n_dp} data-parallel devices")
        return n_dp
    n = min(len(jax.devices()), max(batch_size, 1))
    while n > 1 and batch_size % n:
        n -= 1
    return n


def make_mesh(n_devices: Optional[int] = None,
              axis_name: str = "data") -> Mesh:
    devs = jax.devices()
    n = n_devices if (n_devices and n_devices > 0) else len(devs)
    if n > len(devs):
        raise ValueError(f"requested {n} devices, have {len(devs)}")
    return Mesh(np.array(devs[:n]), (axis_name,))


def initialize_multihost(coordinator: Optional[str] = None,
                         num_processes: Optional[int] = None,
                         process_id: Optional[int] = None) -> None:
    """Multi-host bring-up: `jax.distributed.initialize` (DCN rendezvous is
    handled by the runtime; TPU pods auto-discover with no arguments)."""
    kwargs = {}
    if coordinator:
        kwargs = dict(coordinator_address=coordinator,
                      num_processes=num_processes, process_id=process_id)
    jax.distributed.initialize(**kwargs)
