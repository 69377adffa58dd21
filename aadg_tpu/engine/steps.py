"""Jitted train-step builders.

The TPU re-design of the reference's hot loops (`search_dg.py:102-214`
pretrain/train; SURVEY §3.2): ONE traced program per step that fuses
in-graph batch gather, on-device multi-policy augmentation, scale-crop +
normalization, segmentation + discriminator forward/backward, optimizer
updates, and the Sinkhorn diversity rewards. Policies enter as a tensor, so
a new epoch's policies never retrace.

Under a device mesh the same builders take ``axis_name`` (and the static
``n_shards``): gradients are ``lax.pmean``-ed over the data axis, BatchNorm
stats are cross-replica via the models' axis_name, Sinkhorn domain features
are ``all_gather``-ed so rewards are the global-batch OT, and per-sample
PRNG keys are shard windows of the global split — the whole DP program is
bit-equivalent to the single-chip one on the same global batch (replacing
DDP's allreduce + vendored SyncBN, `models/sync_batchnorm/`).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from ..losses import bce_loss, soft_cross_entropy
from ..metrics import samplewise_f1
from ..data.transforms import soft_domain_label
from ..ops.sinkhorn import pairwise_domain_ot
from .state import Entities, SegDisState


def _apply_model(ent: Entities, params, stats, x, train: bool, rng=None):
    variables = {"params": params}
    if stats:
        variables["batch_stats"] = stats
    # dropout rng: the flagship models are dropout-free, but zoo decode
    # heads carry mmseg's dropout_ratio=0.1 classifier dropout
    rngs = {"dropout": rng} if (train and rng is not None) else None
    if train and stats:
        (logits, feat), upd = ent.model.apply(
            variables, x, train=True, mutable=["batch_stats"], rngs=rngs)
        return logits, feat, upd["batch_stats"]
    logits, feat = ent.model.apply(variables, x, train=train, rngs=rngs)
    return logits, feat, stats


def _apply_disc(ent: Entities, params, stats, feat, x, train: bool,
                momentum: bool = False, return_feature: bool = False):
    """Run the discriminator: on pooled features (feature/momentum_feature)
    or raw images (image)."""
    variables = {"params": params}
    if stats:
        variables["batch_stats"] = stats
    if ent.dis_name == "momentum_feature":
        out = ent.disc.apply(variables, feat, momentum=momentum,
                             return_feature=return_feature)
        return out, stats
    if ent.dis_name == "feature":
        out = ent.disc.apply(variables, feat,
                             return_feature=return_feature)
        return out, stats
    # image discriminator: BN stats are mutable in train mode
    if train:
        out, upd = ent.disc.apply(variables, x, train=True,
                                  return_feature=return_feature,
                                  mutable=["batch_stats"])
        return out, upd["batch_stats"]
    out = ent.disc.apply(variables, x, train=False,
                         return_feature=return_feature)
    return out, stats


def _seg_metrics(ent: Entities, seg_soft, y):
    """Train-loop dice metrics: thresholded (argmax of [1-p, p]) samplewise
    F1, class-1 entry (`search_dg.py:56-57` / `search_dg_2d.py:...`)."""
    hard = (seg_soft > 0.5).astype(jnp.float32)
    if ent.num_classes == 2:
        return {"cup_dsc": samplewise_f1(hard[..., 0], y[..., 0])[1],
                "disc_dsc": samplewise_f1(hard[..., 1], y[..., 1])[1]}
    return {"dsc": samplewise_f1(hard[..., 0], y[..., 0])[1]}


def _maybe_pmean(tree, axis_name):
    if axis_name is None:
        return tree
    return jax.lax.pmean(tree, axis_name)


def _per_sample_keys(key, n_local: int, n_shards: int,
                     axis_name: Optional[str]):
    """Per-sample PRNG keys for this shard's window of the global batch.

    Every DP shard receives the SAME step key; the global per-sample split
    is computed identically everywhere and each shard takes its contiguous
    row window — so the multi-chip program draws bit-identical per-sample
    randomness to the single-chip program on the same global batch
    (shard i's local row r is global row i*n_local + r)."""
    if axis_name is None or n_shards == 1:
        return jax.random.split(key, n_local)
    all_keys = jax.random.split(key, n_local * n_shards)
    off = jax.lax.axis_index(axis_name) * n_local
    return jax.lax.dynamic_slice_in_dim(all_keys, off, n_local)


def make_pretrain_step(ent: Entities, axis_name: Optional[str] = None,
                       step_disc: bool = True, n_shards: int = 1):
    """Warmup step (`search_dg.py:24-99`): non-augmented domain-balanced
    batch; seg trains with BCE, discriminator (online branch) with soft CE
    on the soft domain labels.

    ``step_disc=False`` is the plain train mode (`train_dg.py:34-56` /
    `train_dg_2d.py:34-55`): the reference never runs or steps the
    discriminator there — seg-only fwd/bwd."""

    def step(ts: SegDisState, batch, key: jax.Array):
        imgs, masks, dcs = batch  # (B, D, H, W, ...) raw [0,255]
        b, d = imgs.shape[0], imgs.shape[1]
        n = b * d
        imgs = imgs.reshape((n,) + imgs.shape[2:])
        masks = masks.reshape((n,) + masks.shape[2:])
        dcs = dcs.reshape((n,))
        k_t, k_d, k_drop = jax.random.split(key, 3)
        x, y = jax.vmap(ent.transform)(
            imgs, masks, _per_sample_keys(k_t, n, n_shards, axis_name))
        dc_soft = jax.vmap(
            lambda i, k: soft_domain_label(i, ent.n_domains, k))(
                dcs, _per_sample_keys(k_d, n, n_shards, axis_name))

        def loss_fn(seg_params, dis_params):
            logits, feat, new_seg_stats = _apply_model(
                ent, seg_params, ts.seg_stats, x, train=True, rng=k_drop)
            seg_soft = jax.nn.sigmoid(logits)
            seg_loss = bce_loss(seg_soft, y)
            if not step_disc:
                aux = (seg_loss, jnp.float32(0.0), seg_soft,
                       new_seg_stats, ts.dis_stats)
                return seg_loss, aux
            dis_out, new_dis_stats = _apply_disc(
                ent, dis_params, ts.dis_stats,
                jax.lax.stop_gradient(feat), jax.lax.stop_gradient(x),
                train=True, momentum=False)
            dis_loss = soft_cross_entropy(dis_out, dc_soft)
            aux = (seg_loss, dis_loss, seg_soft, new_seg_stats,
                   new_dis_stats)
            return seg_loss + dis_loss, aux

        grads, aux = jax.grad(loss_fn, argnums=(0, 1), has_aux=True)(
            ts.seg_params, ts.dis_params)
        seg_loss, dis_loss, seg_soft, new_seg_stats, new_dis_stats = aux
        grads = _maybe_pmean(grads, axis_name)

        seg_upd, seg_opt = ent.model_tx.update(grads[0], ts.seg_opt,
                                               ts.seg_params)
        if step_disc:
            dis_upd, dis_opt = ent.dis_tx.update(grads[1], ts.dis_opt,
                                                 ts.dis_params)
            dis_params = jax.tree_util.tree_map(
                lambda p, u: p + u, ts.dis_params, dis_upd)
        else:
            dis_params, dis_opt = ts.dis_params, ts.dis_opt
        new_ts = SegDisState(
            seg_params=jax.tree_util.tree_map(
                lambda p, u: p + u, ts.seg_params, seg_upd),
            seg_stats=new_seg_stats, seg_opt=seg_opt,
            dis_params=dis_params,
            dis_stats=new_dis_stats, dis_opt=dis_opt)

        metrics = {"seg_loss": seg_loss,
                   **({"dis_loss": dis_loss} if step_disc else {}),
                   **_seg_metrics(ent, seg_soft, y)}
        return new_ts, _maybe_pmean(metrics, axis_name)

    return step


def make_autoaug_train_step(ent: Entities,
                            axis_name: Optional[str] = None,
                            n_shards: int = 1):
    """Train-mode step with the reference's ``autoaugment`` behavior
    (`train_dg_2d.py:39-44`): with probability 0.5 per step the batch is
    replaced by a policy-augmented copy. ``policies`` is a (1, Q, L, 2)
    tensor (a single fixed/searched policy). Seg-only, like plain train
    mode."""
    base = make_pretrain_step(ent, axis_name, step_disc=False,
                              n_shards=n_shards)

    def step(ts: SegDisState, batch, policies, key: jax.Array):
        imgs, masks, dcs = batch
        b, d = imgs.shape[0], imgs.shape[1]
        n0 = b * d
        k_coin, k_aug, k_rest = jax.random.split(key, 3)
        flat_i = imgs.reshape((n0,) + imgs.shape[2:])
        flat_m = masks.reshape((n0,) + masks.shape[2:])
        aug_i, aug_m = ent.multi_policy(
            flat_i, flat_m, policies,
            _per_sample_keys(k_aug, n0, n_shards, axis_name))
        aug_i = aug_i[:, 0].reshape(imgs.shape)
        aug_m = aug_m[:, 0].reshape(masks.shape)
        use_aug = jax.random.uniform(k_coin) > 0.5
        imgs = jnp.where(use_aug, aug_i, imgs)
        masks = jnp.where(use_aug, aug_m, masks)
        return base(ts, (imgs, masks, dcs), k_rest)

    return step


def make_search_step(ent: Entities, M: int,
                     sinkhorn_blur: float = 0.05,
                     sinkhorn_scaling: float = 0.5,
                     aug_labels_from_augmented: bool = False,
                     axis_name: Optional[str] = None,
                     n_shards: int = 1):
    """The search-mode hot step (`search_dg.py:102-214` / SURVEY §3.2).

    batch: raw (B, D, H0, W0, 3) images / (B, D, H0, W0) masks / (B, D)
    domain codes; ``policies`` is the (M, Q, L, 2) int tensor. Produces the
    per-policy Sinkhorn diversity reward contributions (M,).

    ``aug_labels_from_augmented=False`` replicates the reference's active
    label pipeline: DGRandomScaleCrop re-derives every augmented copy's
    label from the ORIGINAL mask (`data/transform.py:124-133`), so e.g.
    Cutout's mask hole never reaches training labels. True uses the
    co-transformed masks instead (documented divergence option).
    """
    if ent.dis_name not in ("momentum_feature", "feature"):
        raise NotImplementedError(
            "search mode requires a feature discriminator "
            "(reference constraint, models/__init__.py:22)")
    momentum = ent.dis_name == "momentum_feature"

    def step(ts: SegDisState, batch, policies: jnp.ndarray, key: jax.Array):
        imgs, masks, dcs = batch
        b, d = imgs.shape[0], imgs.shape[1]
        n0 = b * d
        imgs = imgs.reshape((n0,) + imgs.shape[2:])
        masks = masks.reshape((n0,) + masks.shape[2:])
        dcs = dcs.reshape((n0,))
        k_aug, k_t, k_d, k_drop = jax.random.split(key, 4)

        aug_i, aug_m = ent.multi_policy(
            imgs, masks, policies,
            _per_sample_keys(k_aug, n0, n_shards, axis_name))
        if not aug_labels_from_augmented:
            aug_m = jnp.broadcast_to(masks[:, None], aug_m.shape)

        n = n0 * M
        flat_i = aug_i.reshape((n,) + aug_i.shape[2:])
        flat_m = aug_m.reshape((n,) + aug_m.shape[2:])
        x, y = jax.vmap(ent.transform)(
            flat_i, flat_m, _per_sample_keys(k_t, n, n_shards, axis_name))
        # one soft domain label per (b, d) sample, shared by its M copies
        # (`data/transform.py:234`)
        dc_soft0 = jax.vmap(
            lambda i, k: soft_domain_label(i, ent.n_domains, k))(
                dcs, _per_sample_keys(k_d, n0, n_shards, axis_name))
        dc_soft = jnp.repeat(dc_soft0, M, axis=0)

        def loss_fn(seg_params, dis_params):
            logits, feat, new_seg_stats = _apply_model(
                ent, seg_params, ts.seg_stats, x, train=True, rng=k_drop)
            seg_soft = jax.nn.sigmoid(logits)
            seg_loss = bce_loss(seg_soft, y)
            # online branch trains (`search_dg.py:137-138,174-176`)
            dis_out_bp, _ = _apply_disc(
                ent, dis_params, ts.dis_stats,
                jax.lax.stop_gradient(feat), None, train=True,
                momentum=False)
            dis_loss_bp = soft_cross_entropy(dis_out_bp, dc_soft)
            aux = (seg_loss, dis_loss_bp, seg_soft, feat, new_seg_stats)
            return seg_loss + dis_loss_bp, aux

        grads, aux = jax.grad(loss_fn, argnums=(0, 1), has_aux=True)(
            ts.seg_params, ts.dis_params)
        seg_loss, dis_loss_bp, seg_soft, feat, new_seg_stats = aux
        grads = _maybe_pmean(grads, axis_name)

        # momentum branch: reward embedding + monitored dis loss
        # (`search_dg.py:134-135,143-144`)
        (dis_out_mom, dom_feat), _ = _apply_disc(
            ent, ts.dis_params, ts.dis_stats,
            jax.lax.stop_gradient(feat), None, train=False,
            momentum=momentum, return_feature=True)
        dis_loss_mon = soft_cross_entropy(dis_out_mom, dc_soft)

        # per-policy pairwise-domain Sinkhorn rewards
        # (`search_dg.py:150-162`): features (n, F) -> (M, D, B, F)
        feats = dom_feat.reshape(b, d, M, -1)
        if axis_name is not None:
            # the OT point clouds are the GLOBAL batch: gather every
            # shard's features (tiny — D*B*M*128 f32) over the data axis
            # so each replica runs the identical global-batch Sinkhorn,
            # bit-equivalent to the single-chip program (shard windows
            # concatenate in global row order)
            feats = jax.lax.all_gather(feats, axis_name, axis=0,
                                       tiled=True)
        feats = feats.transpose(2, 1, 0, 3)
        rewards = jax.vmap(
            lambda f: pairwise_domain_ot(
                f, blur=sinkhorn_blur, scaling=sinkhorn_scaling))(feats)

        seg_upd, seg_opt = ent.model_tx.update(grads[0], ts.seg_opt,
                                               ts.seg_params)
        dis_upd, dis_opt = ent.dis_tx.update(grads[1], ts.dis_opt,
                                             ts.dis_params)
        new_ts = SegDisState(
            seg_params=jax.tree_util.tree_map(
                lambda p, u: p + u, ts.seg_params, seg_upd),
            seg_stats=new_seg_stats, seg_opt=seg_opt,
            dis_params=jax.tree_util.tree_map(
                lambda p, u: p + u, ts.dis_params, dis_upd),
            dis_stats=ts.dis_stats, dis_opt=dis_opt)

        metrics = {"seg_loss": seg_loss, "dis_loss": dis_loss_mon,
                   "diversity_ot": jnp.sum(rewards),
                   **_seg_metrics(ent, seg_soft, y)}
        return new_ts, _maybe_pmean(metrics, axis_name), rewards

    return step
