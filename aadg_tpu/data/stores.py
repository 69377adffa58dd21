"""Device-resident data stores + in-graph domain-balanced sampling.

The TPU-native replacement for the reference's DataLoader worker processes
(`/root/reference/data/dataloader.py:10-36`): the datasets are tiny
(~60-70 MB raw), so the full training corpus lives in HBM as uint8 and every
"batch" is a pair of in-graph gathers — zero host↔device traffic per step,
which matters on this 1-CPU host.

Sampling semantics match the reference exactly: one *uniformly random*
image per domain per batch index (`data/optic.py:79-91`), epoch length =
ceil(max_pool / batch) for optic and ceil(3 * max_pool / batch) for rvs
(`data/vessel.py:89-96`).
"""

from __future__ import annotations

import math
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np


class TrainStore(NamedTuple):
    images: jnp.ndarray   # (D, Nmax, H, W, 3) uint8, device
    labels: jnp.ndarray   # (D, Nmax, H, W) uint8, device
    counts: jnp.ndarray   # (D,) int32

    @property
    def n_domains(self) -> int:
        return self.images.shape[0]

    def steps_per_epoch(self, batch_size: int, length_mult: int = 1) -> int:
        n_max = int(np.max(np.asarray(self.counts)))
        return max(1, math.ceil(n_max * length_mult / batch_size))


class TestStore(NamedTuple):
    images: jnp.ndarray            # (N_pad, H, W, 3) uint8
    labels: jnp.ndarray            # (N_pad, H, W) uint8
    rois: Optional[jnp.ndarray]    # (N_pad, H, W) uint8 or None
    weights: jnp.ndarray           # (N_pad,) 1.0 for real samples
    names: list                    # len N (unpadded)

    @property
    def n_real(self) -> int:
        return len(self.names)


def make_train_store(images: np.ndarray, labels: np.ndarray,
                     counts: np.ndarray) -> TrainStore:
    return TrainStore(jnp.asarray(images), jnp.asarray(labels),
                      jnp.asarray(counts))


def make_test_store(images: np.ndarray, labels: np.ndarray,
                    rois: Optional[np.ndarray], names: list,
                    batch_size: int) -> TestStore:
    n = images.shape[0]
    n_pad = max(1, math.ceil(n / batch_size)) * batch_size
    pad = [(0, n_pad - n)] + [(0, 0)] * (images.ndim - 1)
    weights = np.zeros((n_pad,), np.float32)
    weights[:n] = 1.0
    return TestStore(
        jnp.asarray(np.pad(images, pad)),
        jnp.asarray(np.pad(labels, pad[:labels.ndim])),
        jnp.asarray(np.pad(rois, pad[:rois.ndim]))
        if rois is not None else None,
        jnp.asarray(weights), list(names))


def sample_train_batch(store: TrainStore, key: jax.Array, batch_size: int,
                       n_shards: int = 1, shard_index=None):
    """Domain-balanced random batch: (B, D, H, W, 3) f32 images in [0,255],
    (B, D, H, W) f32 raw masks, (B, D) int32 domain codes.

    Under data parallelism every shard calls this with the SAME key and the
    GLOBAL ``batch_size``: the global index draw is computed identically
    everywhere and each shard gathers only its contiguous row window
    (``batch_size // n_shards`` rows at ``shard_index``) — so the union of
    shard batches is exactly the single-chip batch, in the same order."""
    d = store.n_domains
    idx = jax.random.randint(
        key, (batch_size, d), 0,
        jnp.broadcast_to(store.counts[None, :], (batch_size, d)))
    if n_shards > 1:
        local_b = batch_size // n_shards
        idx = jax.lax.dynamic_slice_in_dim(idx, shard_index * local_b,
                                           local_b)
    imgs = jax.vmap(lambda i: store.images[jnp.arange(d), i],
                    in_axes=0)(idx).astype(jnp.float32)
    masks = jax.vmap(lambda i: store.labels[jnp.arange(d), i],
                     in_axes=0)(idx).astype(jnp.float32)
    dcs = jnp.broadcast_to(jnp.arange(d, dtype=jnp.int32)[None, :],
                           (idx.shape[0], d))
    return imgs, masks, dcs
