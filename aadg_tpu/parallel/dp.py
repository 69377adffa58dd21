"""Data parallelism via shard_map over the ``data`` mesh axis.

The TPU-native equivalent of the reference's DDP stack (SURVEY §2.3):

| reference                                   | here                        |
|---------------------------------------------|-----------------------------|
| DDP wrap + implicit grad allreduce           | lax.pmean on grads in-step  |
| per-GPU batch split (models/__init__.py:37)  | global draw, per-shard slice|
| DistributedSampler(set_epoch)                | same-key draw + row window  |
| vendored SyncBatchNorm                       | BatchNorm(axis_name='data') |
| NCCL over PCIe/IB                            | XLA collectives over ICI    |

State (params, opt) is replicated (in_specs P()). Every shard receives the
SAME per-step key: the global domain-balanced index draw is computed
identically on every shard and each takes its contiguous row window, while
the step's per-sample PRNG keys are shard windows of the global split
(`engine/steps._per_sample_keys`) and Sinkhorn domain features are
all_gathered before the OT — so the DP program is *bit-equivalent* to the
single-chip program on the same global batch (not just statistically
matched), unlike the reference's DDP whose per-rank samplers draw disjoint
streams.
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


def scan_steps(body, carry, keys):
    """``lax.scan``, except a 1-step scan calls the body inline.

    Wrapping the flagship step in a trip-count-1 while loop multiplies
    XLA:CPU cold-compile time >10x on 1-core hosts (measured round 3:
    the bare sharded step compiles in ~33 s, the same step inside
    ``lax.scan(length=1)`` exceeds 13 min) — and single-step epochs are
    exactly what the multi-chip dryrun and smoke tests run. Semantics are
    identical: the body consumes ``keys[0]`` and outputs keep their
    leading scan axis."""
    if keys.shape[0] == 1:
        carry, y = body(carry, keys[0])
        return carry, jax.tree_util.tree_map(lambda a: a[None], y)
    return jax.lax.scan(body, carry, keys)


def _n_shards(mesh, axis_name):
    return mesh.shape[axis_name]


def make_dp_train_step(step_fn, mesh, global_batch: int,
                       axis_name: str = "data"):
    """Wrap a pretrain-style step (built with axis_name=..., n_shards=...)
    into a shard_map program: replicated state, per-shard window of the
    global in-graph batch.

    The store is bound as a leading argument at call sites via the
    returned wrapper (replicated over the mesh, device-resident)."""
    n_shards = _n_shards(mesh, axis_name)

    def body(ts, store, key):
        my = jax.lax.axis_index(axis_name)
        kb, ks = jax.random.split(key)
        batch = sample_train_batch(store, kb, global_batch,
                                   n_shards=n_shards, shard_index=my)
        return step_fn(ts, batch, ks)

    sharded = jax.jit(_shard_map(body, mesh, in_specs=(P(), P(), P()),
                                 out_specs=(P(), P())))
    return lambda ts, store, key: sharded(ts, store, key)


def make_dp_pretrain_epoch(step_fn, mesh, global_batch: int,
                           steps: int, axis_name: str = "data"):
    """Whole warmup epoch as one sharded scan program (pretrain-step
    signature: (ts, batch, key) -> (ts, metrics))."""
    n_shards = _n_shards(mesh, axis_name)

    def epoch(ts, store, key):
        my = jax.lax.axis_index(axis_name)

        def body(carry, k):
            kb, ks = jax.random.split(k)
            batch = sample_train_batch(store, kb, global_batch,
                                       n_shards=n_shards, shard_index=my)
            carry, m = step_fn(carry, batch, ks)
            return carry, m

        keys = jax.random.split(key, steps)
        ts, ms = scan_steps(body, ts, keys)
        return ts, jax.tree_util.tree_map(jnp.mean, ms)

    sharded = jax.jit(_shard_map(epoch, mesh, in_specs=(P(), P(), P()),
                                 out_specs=(P(), P())))
    return lambda ts, store, key: sharded(ts, store, key)


def make_dp_autoaug_epoch(step_fn, mesh, global_batch: int,
                          steps: int, axis_name: str = "data"):
    """Whole autoaugment-train epoch as one sharded scan program
    (autoaug-step signature: (ts, batch, policies, key) -> (ts, m))."""
    n_shards = _n_shards(mesh, axis_name)

    def epoch(ts, store, policies, key):
        my = jax.lax.axis_index(axis_name)

        def body(carry, k):
            kb, ks = jax.random.split(k)
            batch = sample_train_batch(store, kb, global_batch,
                                       n_shards=n_shards, shard_index=my)
            carry, m = step_fn(carry, batch, policies, ks)
            return carry, m

        keys = jax.random.split(key, steps)
        ts, ms = scan_steps(body, ts, keys)
        return ts, jax.tree_util.tree_map(jnp.mean, ms)

    sharded = jax.jit(_shard_map(
        epoch, mesh, in_specs=(P(), P(), P(), P()),
        out_specs=(P(), P())))
    return lambda ts, store, policies, key: sharded(ts, store, policies,
                                                    key)


def make_dp_search_epoch(search_step_fn, mesh, global_batch: int,
                         steps: int, axis_name: str = "data"):
    """Whole search epoch as one sharded scan program.

    Rewards are computed from all_gathered global feature clouds inside
    the step (identical on every replica), so the scanned accumulation and
    normalization match the single-chip epoch exactly.
    """
    n_shards = _n_shards(mesh, axis_name)

    def epoch(ts, store, policies, key):
        my = jax.lax.axis_index(axis_name)

        def body(carry, k):
            kb, ks = jax.random.split(k)
            batch = sample_train_batch(store, kb, global_batch,
                                       n_shards=n_shards, shard_index=my)
            carry, m, r = search_step_fn(carry, batch, policies, ks)
            return carry, (m, r)

        keys = jax.random.split(key, steps)
        ts, (ms, rs) = scan_steps(body, ts, keys)
        rewards = normalize_rewards(jnp.sum(rs, axis=0))
        return ts, jax.tree_util.tree_map(jnp.mean, ms), rewards

    sharded = jax.jit(_shard_map(
        epoch, mesh, in_specs=(P(), P(), P(), P()),
        out_specs=(P(), P(), P())))
    return lambda ts, store, policies, key: sharded(ts, store, policies,
                                                    key)
