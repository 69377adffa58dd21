"""User-facing zoo training API.

Equivalent of mmseg's ``apis/train.py::train_segmentor``
(`/root/reference/models/mmseg/apis/train.py`): supervised training of a
zoo segmentor over a `data/pipeline.py` dataset, with the EvalHook's
periodic ``dataset.evaluate`` (`core/evaluation/eval_hooks.py:7-94`),
auxiliary-head deep supervision (`segmentors/encoder_decoder.py:113-128`,
loss weight 0.4 in the mmseg configs), and the optional OHEM pixel
sampler (`core/seg/sampler/ohem_pixel_sampler.py`, wired through the head
loss exactly as ``BaseDecodeHead.losses`` does at
`decode_heads/decode_head.py:225-226`).

TPU-first shape: no Runner/Hook machinery — one jitted train step taking
``(params, batch_stats, opt_state, batch, rng)``, host-side numpy batch
assembly (the pipeline transforms are host-side by design; see
data/pipeline.py), and plain-dict history. Mesh/data-parallel training of
the flagship task lives in `aadg_tpu/engine` — this API is the
mmseg-style entry for the generic zoo surface.
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from .losses import cross_entropy
from .point_head import point_sample_labels
from .sampler import ohem_weights


def _assemble(dataset, idxs: Sequence[int]):
    samples = [dataset[int(i)] for i in idxs]
    x = np.stack([s["img"] for s in samples]).astype(np.float32)
    y = np.stack([s["gt_semantic_seg"] for s in samples])
    return jnp.asarray(x), jnp.asarray(y)


def poly_lr(base_lr: float, max_iters: int, power: float = 0.9,
            min_lr: float = 1e-4):
    """mmcv ``PolyLrUpdaterHook`` (by_epoch=False), the mmseg default LR
    policy: ``lr = (base - min) * (1 - iter/max_iters)**power + min``."""
    def schedule(count):
        coeff = (1.0 - count / max_iters) ** power
        return (base_lr - min_lr) * coeff + min_lr
    return schedule


def build_optimizer(optimizer: Optional[dict] = None,
                    lr_config: Optional[dict] = None,
                    max_iters: int = 100):
    """mmseg-config-convention optimizer + LR policy -> optax transform.

    ``optimizer``: mmseg dict, e.g. ``dict(type='SGD', lr=0.01,
    momentum=0.9, weight_decay=0.0005)`` (the zoo configs' default) or
    ``dict(type='Adam', lr=...)`` — built by mmcv's ``build_optimizer``
    from ``cfg.optimizer`` (`/root/reference/models/mmseg/apis/train.py:71`).
    torch-SGD semantics: weight decay is added to the gradient BEFORE the
    momentum buffer, and the lr scales the buffered update.

    ``lr_config``: ``dict(policy='poly', power=0.9, min_lr=1e-4)`` (the
    mmseg schedules' default, registered via
    ``runner.register_training_hooks(cfg.lr_config, ...)``) or None for a
    constant lr.

    Returns ``(tx, schedule_fn)``.
    """
    import optax

    opt = dict(optimizer or {"type": "Adam", "lr": 1e-3})
    kind = opt.pop("type")
    base_lr = float(opt.pop("lr"))
    if lr_config is not None:
        c = dict(lr_config)
        policy = c.pop("type", None) or c.pop("policy")
        assert policy == "poly", f"unsupported lr policy {policy}"
        schedule = poly_lr(base_lr, max_iters, power=c.pop("power", 0.9),
                           min_lr=c.pop("min_lr", 1e-4))
        assert not c.pop("by_epoch", False), "by_epoch poly not supported"
        assert not c, f"unknown lr_config keys {c}"
    else:
        schedule = lambda count: base_lr  # noqa: E731
    if kind == "SGD":
        momentum = float(opt.pop("momentum", 0.0))
        wd = float(opt.pop("weight_decay", 0.0))
        assert not opt, f"unknown optimizer keys {opt}"
        parts = []
        if wd:
            parts.append(optax.add_decayed_weights(wd))
        if momentum:
            parts.append(optax.trace(decay=momentum, nesterov=False))
        parts.append(optax.scale_by_learning_rate(schedule))
        tx = optax.chain(*parts)
    elif kind == "Adam":
        wd = float(opt.pop("weight_decay", 0.0))
        assert not opt, f"unknown optimizer keys {opt}"
        parts = [optax.scale_by_adam(eps=1e-8)]
        if wd:
            parts.insert(0, optax.add_decayed_weights(wd))
        parts.append(optax.scale_by_learning_rate(schedule))
        tx = optax.chain(*parts)
    else:
        raise ValueError(f"unsupported optimizer type {kind}")
    return tx, schedule


def train_segmentor(model, dataset, *,
                    max_iters: int = 100,
                    batch_size: int = 2,
                    lr: float = 1e-3,
                    optimizer: Optional[dict] = None,
                    lr_config: Optional[dict] = None,
                    ignore_index: int = 255,
                    sampler: Optional[dict] = None,
                    aux_weight: float = 0.4,
                    eval_dataset=None,
                    eval_interval: int = 0,
                    mesh=None,
                    seed: int = 0,
                    log_fn: Callable[[str], None] = print):
    """Train a zoo segmentor on a pipeline dataset. Returns
    ``(variables, history)`` where history holds per-iter losses and any
    periodic eval dicts.

    ``optimizer`` / ``lr_config``: mmseg config dicts (e.g.
    ``dict(type='SGD', lr=0.01, momentum=0.9, weight_decay=0.0005)`` +
    ``dict(policy='poly', power=0.9, min_lr=1e-4)``) built exactly as
    mmcv's ``build_optimizer`` + ``PolyLrUpdaterHook`` do
    (`/root/reference/models/mmseg/apis/train.py:71-90`). When omitted,
    falls back to constant-lr Adam (``lr``).

    ``sampler``: mmseg-style dict, e.g. ``dict(type='OHEMPixelSampler',
    thresh=0.7, min_kept=10000)`` — mined per-pixel weights feed the CE
    exactly like ``BaseDecodeHead.losses`` does.

    ``mesh``: a ``jax.sharding.Mesh`` — the TPU-native MMDistributedDataParallel
    (`apis/train.py:55-68`): each batch is sharded over the mesh's first
    axis with replicated params; XLA GSPMD computes global-batch losses,
    gradients and BN statistics, so results are IDENTICAL to single-device
    (the DDP train-side twin of ``evaluate_segmentor(mesh=)``).
    ``batch_size`` must be a multiple of the mesh size.
    """
    import optax

    if sampler is not None:
        s = dict(sampler)
        assert s.pop("type") == "OHEMPixelSampler", sampler
        ohem_kwargs = dict(thresh=s.pop("thresh", None),
                           min_kept=s.pop("min_kept", 100000))
        assert not s, f"unknown sampler args {s}"
    else:
        ohem_kwargs = None

    has_aux = bool(getattr(model, "auxiliary_heads", ()))
    # PointRend: the point head trains on importance-sampled points with
    # nearest-sampled gt labels (mmseg cascade ``loss_point``)
    has_point = getattr(model, "point_head", None) is not None
    rng = jax.random.PRNGKey(seed)
    perm_rng = np.random.default_rng(seed)

    x0, _ = _assemble(dataset, range(min(batch_size, len(dataset))))
    if has_point:
        variables = model.init(rng, x0, jax.random.PRNGKey(0), train=True,
                               method=type(model).forward_train_points)
    elif has_aux:
        variables = model.init(rng, x0, train=True,
                               method=type(model).forward_train)
    else:
        variables = model.init(rng, x0, train=True)
    params = variables["params"]
    stats = variables.get("batch_stats", {})
    if optimizer is None and lr_config is None:
        optimizer = {"type": "Adam", "lr": lr}
    tx, _ = build_optimizer(optimizer, lr_config, max_iters)
    opt = tx.init(params)

    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P
        n_dev = int(np.prod(list(mesh.shape.values())))
        assert batch_size % n_dev == 0, (batch_size, n_dev)
        repl = NamedSharding(mesh, P())
        data_sh = NamedSharding(mesh, P(mesh.axis_names[0]))
        params, stats, opt = jax.device_put((params, stats, opt), repl)

    def seg_loss(logits, y, sampled=True):
        # mmseg applies the sampler weights through weight_reduce_loss with
        # avg_factor=None -> (loss*weight).mean() over ALL pixels
        # (`losses/utils.py`), and only on the decode head — aux heads have
        # no sampler in the OHEM configs (sampler lives in the decode_head
        # config, `decode_heads/decode_head.py:225-226`).
        w = None
        if sampled and ohem_kwargs is not None:
            w = ohem_weights(logits, y, ignore_index=ignore_index,
                             **ohem_kwargs)
        return cross_entropy(logits, y, weight=w,
                             ignore_index=ignore_index)

    @jax.jit
    def step(params, stats, opt, x, y, key):
        def loss_fn(p):
            v = {"params": p}
            if stats:
                v["batch_stats"] = stats
            if has_point:
                kd, kp = jax.random.split(key)
                (logits, _, plogits, pts), new = model.apply(
                    v, x, kp, train=True, mutable=["batch_stats"],
                    rngs={"dropout": kd},
                    method=type(model).forward_train_points)
                aux = ()
            elif has_aux:
                (logits, _, aux), new = model.apply(
                    v, x, train=True, mutable=["batch_stats"],
                    rngs={"dropout": key},
                    method=type(model).forward_train)
            else:
                (logits, _), new = model.apply(
                    v, x, train=True, mutable=["batch_stats"],
                    rngs={"dropout": key})
                aux = ()
            loss = seg_loss(logits, y)
            for a in aux:
                loss = loss + aux_weight * seg_loss(a, y, sampled=False)
            if has_point:
                plabels = point_sample_labels(y, pts)
                loss = loss + cross_entropy(plogits, plabels,
                                            ignore_index=ignore_index)
            return loss, new.get("batch_stats", {})

        (loss, new_stats), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        upd, opt = tx.update(grads, opt, params)
        return optax.apply_updates(params, upd), new_stats, opt, loss

    history = {"loss": [], "eval": []}
    n = len(dataset)
    order = perm_rng.permutation(n)
    cursor = 0
    for it in range(max_iters):
        if cursor + batch_size > n:
            order = perm_rng.permutation(n)
            cursor = 0
        idxs = order[cursor: cursor + batch_size]
        cursor += batch_size
        x, y = _assemble(dataset, idxs)
        if mesh is not None:
            x, y = jax.device_put((x, y), data_sh)
        rng, krng = jax.random.split(rng)
        params, stats, opt, loss = step(params, stats, opt, x, y, krng)
        history["loss"].append(float(loss))
        if eval_interval and eval_dataset is not None \
                and (it + 1) % eval_interval == 0:
            ev = evaluate_segmentor(model, {"params": params,
                                            "batch_stats": stats},
                                    eval_dataset)
            history["eval"].append({"iter": it + 1, **ev})
            log_fn(f"iter {it + 1}: loss {float(loss):.4f} eval {ev}")

    out = {"params": params}
    if stats:
        out["batch_stats"] = stats
    return out, history


_EVAL_FWD: dict = {}
_EVAL_FWD_MAX = 8  # bounded FIFO: each entry pins a module + compiled
# program; a process sweeping many zoo configs must not grow without bound
# (same pattern as engine/evaluate.py's _EVAL_FWD_CACHE)


def _eval_fwd(model):
    """Per-model jitted eval forward. Cached (flax modules hash
    structurally) so periodic EvalHook calls reuse one compiled program
    instead of retracing a fresh closure every evaluation."""
    try:
        run = _EVAL_FWD.get(model)
    except TypeError:  # unhashable field in the module config
        run = None
    if run is None:
        @jax.jit
        def run(v, x):
            logits, _ = model.apply(v, x, train=False)
            return jnp.argmax(logits, axis=-1).astype(jnp.int32)
        try:
            if len(_EVAL_FWD) >= _EVAL_FWD_MAX:
                _EVAL_FWD.pop(next(iter(_EVAL_FWD)))
            _EVAL_FWD[model] = run
        except TypeError:
            pass
    return run


def evaluate_segmentor(model, variables, dataset, metric: str = "mIoU",
                       batch_size: int = 2, mesh=None):
    """EvalHook equivalent: whole-image inference over ``dataset``, then
    ``dataset.evaluate`` (aAcc / per-class acc / mIoU or mDice).

    ``mesh``: shard each batch over the mesh's first axis with replicated
    params — the TPU-native ``apis/test.py`` ``multi_gpu_test`` (results
    identical to single-device; the batch pads up to the device count)."""
    fwd = _eval_fwd(model)
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P
        n_dev = int(np.prod(list(mesh.shape.values())))
        batch_size = max(batch_size, n_dev)
        variables = jax.device_put(variables, NamedSharding(mesh, P()))
    results = []
    for start in range(0, len(dataset), batch_size):
        idxs = range(start, min(start + batch_size, len(dataset)))
        x, _ = _assemble(dataset, idxs)
        n_orig = x.shape[0]
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P
            n_dev = int(np.prod(list(mesh.shape.values())))
            pad = (-n_orig) % n_dev
            if pad:
                x = jnp.concatenate([x, jnp.repeat(x[-1:], pad, axis=0)])
            x = jax.device_put(
                x, NamedSharding(mesh, P(mesh.axis_names[0])))
        pred = np.asarray(fwd(variables, x))[:n_orig]
        results.extend(list(pred))
    return dataset.evaluate(results, metric=metric)
