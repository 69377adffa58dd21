"""Data parallelism via shard_map over the ``data`` mesh axis.

The TPU-native equivalent of the reference's DDP stack (SURVEY §2.3):

| reference                                   | here                        |
|---------------------------------------------|-----------------------------|
| DDP wrap + implicit grad allreduce           | lax.pmean on grads in-step  |
| per-GPU batch split (models/__init__.py:37)  | per-shard batch B/n_dev     |
| DistributedSampler(set_epoch)                | per-shard PRNG fold_in      |
| vendored SyncBatchNorm                       | BatchNorm(axis_name='data') |
| NCCL over PCIe/IB                            | XLA collectives over ICI    |

State (params, opt) is replicated (in_specs P()); each shard draws its own
domain-balanced sub-batch in-graph, so the global batch is the reference's
BATCH_SIZE with identical semantics.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from ..data.stores import sample_train_batch
from ..losses import normalize_rewards
from .mesh import make_mesh


def _shard_map(fn, mesh, in_specs, out_specs):
    return jax.shard_map(fn, mesh=mesh, in_specs=in_specs,
                         out_specs=out_specs, check_vma=False)


def make_dp_train_step(step_fn, mesh, local_batch: int,
                       axis_name: str = "data"):
    """Wrap a pretrain-style step (built with axis_name=...) into a
    shard_map program: replicated state, per-shard in-graph batch.

    The store is bound as a leading argument at call sites via the
    returned wrapper (replicated over the mesh, device-resident)."""

    def body(ts, store, key):
        key = jax.random.fold_in(key, jax.lax.axis_index(axis_name))
        kb, ks = jax.random.split(key)
        batch = sample_train_batch(store, kb, local_batch)
        return step_fn(ts, batch, ks)

    sharded = jax.jit(_shard_map(body, mesh, in_specs=(P(), P(), P()),
                                 out_specs=(P(), P())))
    return lambda ts, store, key: sharded(ts, store, key)


def make_dp_pretrain_epoch(step_fn, mesh, local_batch: int,
                           steps: int, axis_name: str = "data"):
    """Whole warmup epoch as one sharded scan program (pretrain-step
    signature: (ts, batch, key) -> (ts, metrics))."""

    def epoch(ts, store, key):
        key = jax.random.fold_in(key, jax.lax.axis_index(axis_name))

        def body(carry, k):
            kb, ks = jax.random.split(k)
            batch = sample_train_batch(store, kb, local_batch)
            carry, m = step_fn(carry, batch, ks)
            return carry, m

        keys = jax.random.split(key, steps)
        ts, ms = jax.lax.scan(body, ts, keys)
        return ts, jax.tree_util.tree_map(jnp.mean, ms)

    sharded = jax.jit(_shard_map(epoch, mesh, in_specs=(P(), P(), P()),
                                 out_specs=(P(), P())))
    return lambda ts, store, key: sharded(ts, store, key)


def make_dp_search_epoch(search_step_fn, mesh, local_batch: int,
                         steps: int, axis_name: str = "data"):
    """Whole search epoch as one sharded scan program.

    Rewards are pmean-ed inside the step, so the scanned accumulation and
    normalization are replica-consistent.
    """

    def epoch(ts, store, policies, key):
        key = jax.random.fold_in(key, jax.lax.axis_index(axis_name))

        def body(carry, k):
            kb, ks = jax.random.split(k)
            batch = sample_train_batch(store, kb, local_batch)
            carry, m, r = search_step_fn(carry, batch, policies, ks)
            return carry, (m, r)

        keys = jax.random.split(key, steps)
        ts, (ms, rs) = jax.lax.scan(body, ts, keys)
        rewards = normalize_rewards(jnp.sum(rs, axis=0))
        return ts, jax.tree_util.tree_map(jnp.mean, ms), rewards

    sharded = jax.jit(_shard_map(
        epoch, mesh, in_specs=(P(), P(), P(), P()),
        out_specs=(P(), P(), P())))
    return lambda ts, store, policies, key: sharded(ts, store, policies,
                                                    key)
