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
            min_lr: float = 1e-4, warmup: Optional[str] = None,
            warmup_iters: int = 0, warmup_ratio: float = 0.1):
    """mmcv ``PolyLrUpdaterHook`` (by_epoch=False), the mmseg default LR
    policy: ``lr = (base - min) * (1 - iter/max_iters)**power + min``,
    with mmcv's warmup surface (``LrUpdaterHook.get_warmup_lr``): during
    the first ``warmup_iters`` the regular lr is scaled by

    - ``constant``: ``warmup_ratio``
    - ``linear``:   ``1 - (1 - iter/warmup_iters) * (1 - warmup_ratio)``
    - ``exp``:      ``warmup_ratio ** (1 - iter/warmup_iters)``

    (the SegFormer schedules use ``warmup='linear', warmup_iters=1500,
    warmup_ratio=1e-6``)."""
    assert warmup in (None, "constant", "linear", "exp"), warmup

    def schedule(count):
        coeff = (1.0 - count / max_iters) ** power
        lr = (base_lr - min_lr) * coeff + min_lr
        if warmup is not None and warmup_iters > 0:
            frac = jnp.minimum(count / warmup_iters, 1.0)
            if warmup == "constant":
                k = jnp.where(count < warmup_iters, warmup_ratio, 1.0)
            elif warmup == "linear":
                k = 1.0 - (1.0 - frac) * (1.0 - warmup_ratio)
            else:  # exp
                k = warmup_ratio ** (1.0 - frac)
            lr = lr * k
        return lr
    return schedule


def build_optimizer(optimizer: Optional[dict] = None,
                    lr_config: Optional[dict] = None,
                    max_iters: int = 100,
                    optimizer_config: Optional[dict] = None):
    """mmseg-config-convention optimizer + LR policy -> optax transform.

    ``optimizer``: mmseg dict, e.g. ``dict(type='SGD', lr=0.01,
    momentum=0.9, weight_decay=0.0005)`` (the zoo configs' default),
    ``dict(type='Adam', lr=...)``, or ``dict(type='AdamW', lr=6e-5,
    betas=(0.9, 0.999), weight_decay=0.01)`` (the SegFormer recipe) —
    built by mmcv's ``build_optimizer`` from ``cfg.optimizer``
    (`/root/reference/models/mmseg/apis/train.py:71`).
    torch-SGD semantics: weight decay is added to the gradient BEFORE the
    momentum buffer, and the lr scales the buffered update; AdamW decay is
    decoupled. ``paramwise_cfg=dict(custom_keys={...})`` applies mmcv's
    per-group ``lr_mult``/``decay_mult`` by substring match on the dotted
    param path (longest key wins) — all three torch-oracle-tested.

    ``lr_config``: ``dict(policy='poly', power=0.9, min_lr=1e-4)`` (the
    mmseg schedules' default, registered via
    ``runner.register_training_hooks(cfg.lr_config, ...)``), optionally
    with mmcv warmup keys (``warmup='linear', warmup_iters, warmup_ratio``)
    or None for a constant lr.

    ``optimizer_config``: mmcv ``OptimizerHook`` config —
    ``dict(grad_clip=dict(max_norm=35, norm_type=2))`` applies
    ``clip_grad_norm_`` (global-norm clipping) to the gradients BEFORE the
    optimizer update, exactly where the hook runs it.

    Returns ``(tx, schedule_fn)``.
    """
    import optax

    opt = dict(optimizer or {"type": "Adam", "lr": 1e-3})
    kind = opt.pop("type")
    base_lr = float(opt.pop("lr"))
    # mmcv DefaultOptimizerConstructor paramwise_cfg.custom_keys
    # (`mmcv/runner/optimizer/default_constructor.py`): per-parameter-group
    # lr_mult/decay_mult, matched by SUBSTRING of the parameter name with
    # the longest key winning (mmcv sorts keys and takes the first hit; we
    # sort longest-first so e.g. 'decode_head.norm' shadows 'norm'). Flax
    # param paths are dotted the same way torch module names are, so the
    # published configs' keys ('norm', 'head', 'pos_block') apply as-is.
    pw = opt.pop("paramwise_cfg", None)
    custom_keys = {}
    if pw:
        pwc = dict(pw)
        custom_keys = {str(k): dict(v)
                       for k, v in dict(pwc.pop("custom_keys", {})).items()}
        assert not pwc, f"unsupported paramwise_cfg keys {pwc}"

    def _mults(path) -> tuple:
        name = ".".join(
            str(getattr(k, "key", getattr(k, "name", getattr(k, "idx", k))))
            for k in path)
        # mmcv sorts keys alphabetically first, then by length descending
        # (DefaultOptimizerConstructor: ``sorted(sorted(custom_keys),
        # key=len, reverse=True)``) so equal-length overlapping keys
        # resolve deterministically to the same group as the reference
        for key in sorted(sorted(custom_keys), key=len, reverse=True):
            if key in name:
                c = custom_keys[key]
                return (float(c.get("lr_mult", 1.0)),
                        float(c.get("decay_mult", 1.0)))
        return 1.0, 1.0

    def _paramwise_wd(wd: float):
        """Adds ``wd * decay_mult(param) * param`` to the update — the
        paramwise form of ``optax.add_decayed_weights`` (placed before the
        momentum buffer for SGD/Adam = torch coupled L2, after
        ``scale_by_adam`` for AdamW = decoupled)."""
        def update_fn(updates, state, params=None):
            assert params is not None
            upd = jax.tree_util.tree_map_with_path(
                lambda path, u, p: u + wd * _mults(path)[1] * p,
                updates, params)
            return upd, state
        return optax.GradientTransformation(
            lambda params: optax.EmptyState(), update_fn)

    def _paramwise_lr():
        """Scales each leaf's update by its group's lr_mult (mmcv sets
        group lr = base_lr * lr_mult; placed after scale_by_learning_rate
        so the mult applies to the whole step, weight decay included —
        exactly what per-group lr does in torch)."""
        def update_fn(updates, state, params=None):
            upd = jax.tree_util.tree_map_with_path(
                lambda path, u: u * _mults(path)[0], updates)
            return upd, state
        return optax.GradientTransformation(
            lambda params: optax.EmptyState(), update_fn)

    has_lr_mult = any(float(c.get("lr_mult", 1.0)) != 1.0
                      for c in custom_keys.values())
    if lr_config is not None:
        c = dict(lr_config)
        policy = c.pop("type", None) or c.pop("policy")
        assert policy == "poly", f"unsupported lr policy {policy}"
        schedule = poly_lr(base_lr, max_iters, power=c.pop("power", 0.9),
                           min_lr=c.pop("min_lr", 1e-4),
                           warmup=c.pop("warmup", None),
                           warmup_iters=c.pop("warmup_iters", 0),
                           warmup_ratio=c.pop("warmup_ratio", 0.1))
        assert not c.pop("by_epoch", False), "by_epoch poly not supported"
        assert not c, f"unknown lr_config keys {c}"
    else:
        schedule = lambda count: base_lr  # noqa: E731
    clip = None
    if optimizer_config:
        oc = dict(optimizer_config)
        gc = oc.pop("grad_clip", None)
        assert not oc, f"unknown optimizer_config keys {oc}"
        if gc is not None:
            gc = dict(gc)
            assert gc.pop("norm_type", 2) == 2, "only L2 grad_clip"
            clip = optax.clip_by_global_norm(float(gc.pop("max_norm")))
            assert not gc, f"unknown grad_clip keys {gc}"
    def _wd_part(wd):
        return _paramwise_wd(wd) if custom_keys else \
            optax.add_decayed_weights(wd)

    if kind == "SGD":
        momentum = float(opt.pop("momentum", 0.0))
        wd = float(opt.pop("weight_decay", 0.0))
        assert not opt, f"unknown optimizer keys {opt}"
        parts = [clip] if clip is not None else []
        if wd:
            parts.append(_wd_part(wd))
        if momentum:
            parts.append(optax.trace(decay=momentum, nesterov=False))
        parts.append(optax.scale_by_learning_rate(schedule))
    elif kind == "Adam":
        wd = float(opt.pop("weight_decay", 0.0))
        assert not opt, f"unknown optimizer keys {opt}"
        parts = [optax.scale_by_adam(eps=1e-8)]
        if wd:
            # torch Adam's weight_decay is COUPLED: added to the gradient
            # before the moment estimates
            parts.insert(0, _wd_part(wd))
        if clip is not None:
            parts.insert(0, clip)
        parts.append(optax.scale_by_learning_rate(schedule))
    elif kind == "AdamW":
        # torch AdamW (the published SegFormer recipe,
        # `configs/segformer/*`): DECOUPLED weight decay —
        # p -= lr * (adam_step + wd * p) — so the decay term sits AFTER
        # scale_by_adam and shares the lr (and any lr_mult)
        b1, b2 = opt.pop("betas", (0.9, 0.999))
        eps = float(opt.pop("eps", 1e-8))
        wd = float(opt.pop("weight_decay", 0.0))
        assert not opt, f"unknown optimizer keys {opt}"
        parts = [clip] if clip is not None else []
        parts.append(optax.scale_by_adam(b1=float(b1), b2=float(b2),
                                         eps=eps))
        if wd:
            parts.append(_wd_part(wd))
        parts.append(optax.scale_by_learning_rate(schedule))
    else:
        raise ValueError(f"unsupported optimizer type {kind}")
    if has_lr_mult:
        parts.append(_paramwise_lr())
    tx = optax.chain(*parts)
    return tx, schedule


def _batch_indices(n: int, batch_size: int, it: int, seed: int):
    """Deterministic shuffled batch for iteration ``it``: a fresh
    seed-keyed permutation per epoch, tail dropped (mmcv dataloader
    ``drop_last=True``, `apis/train.py:50`). Pure function of (it, seed)
    so ``resume_from`` replays the exact data stream."""
    bpe = max(1, n // batch_size)
    epoch, within = divmod(it, bpe)
    order = np.random.default_rng((seed, epoch)).permutation(n)
    return order[within * batch_size: within * batch_size + batch_size]


def _save_train_state(path: str, params, stats, opt, it: int) -> None:
    from flax import serialization
    from ...utils import fetch_tree
    # one packed device->host transfer per dtype (fetch_tree) — msgpack's
    # per-leaf numpy conversion would pay a tunnel round trip PER ARRAY
    # on remote-attached TPUs (CLAUDE.md fact 5)
    params, stats, opt = fetch_tree((params, stats, opt))
    blob = serialization.msgpack_serialize(
        {"params": serialization.to_state_dict(params),
         "batch_stats": serialization.to_state_dict(stats),
         "opt": serialization.to_state_dict(opt),
         "iter": np.int64(it)})
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(blob)
    import os
    os.replace(tmp, path)


def _load_train_state(path: str, params, stats, opt):
    from flax import serialization
    with open(path, "rb") as f:
        blob = serialization.msgpack_restore(f.read())
    params = serialization.from_state_dict(params, blob["params"])
    stats = serialization.from_state_dict(stats, blob["batch_stats"])
    opt = serialization.from_state_dict(opt, blob["opt"])
    return params, stats, opt, int(blob["iter"])


def train_segmentor(model, dataset, *,
                    max_iters: int = 100,
                    batch_size: int = 2,
                    lr: float = 1e-3,
                    optimizer: Optional[dict] = None,
                    lr_config: Optional[dict] = None,
                    optimizer_config: Optional[dict] = None,
                    ignore_index: int = 255,
                    sampler: Optional[dict] = None,
                    aux_weight: float = 0.4,
                    eval_dataset=None,
                    eval_interval: int = 0,
                    mesh=None,
                    seed: int = 0,
                    work_dir: Optional[str] = None,
                    checkpoint_config: Optional[dict] = None,
                    resume_from: Optional[str] = None,
                    load_from: Optional[str] = None,
                    log_config: Optional[dict] = None,
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

    Runner-hook surface (``runner.register_training_hooks``,
    `apis/train.py:90-92` + `runner.resume/load_checkpoint`,
    `apis/train.py:111-115`):

    - ``optimizer_config=dict(grad_clip=dict(max_norm=, norm_type=2))`` —
      mmcv OptimizerHook gradient clipping;
    - ``work_dir`` + ``checkpoint_config=dict(interval=N,
      max_keep_ckpts=-1)`` — CheckpointHook: writes
      ``iter_{n}.msgpack`` (params+batch_stats+optimizer+iter) and a
      ``latest.msgpack`` copy every N iters, pruning to the newest
      ``max_keep_ckpts``;
    - ``resume_from`` — restores params/stats/optimizer AND the iteration
      counter; the data stream and dropout keys are pure functions of the
      iteration, so a resumed run replays the original exactly;
    - ``load_from`` — weights-only init from an ``init_segmentor``-format
      variables msgpack (no optimizer state);
    - ``log_config=dict(interval=N)`` — TextLoggerHook-style periodic
      ``Iter [i/max] lr: ... loss: ...`` lines via ``log_fn``.
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

    # cascade segmentors deep-supervise every intermediate stage
    # (`cascade_encoder_decoder.py:63-79`) — their forward_train returns
    # the stage outputs through the same aux tuple
    has_aux = bool(getattr(model, "auxiliary_heads", ())) or \
        bool(getattr(model, "cascade_heads", ()))
    # PointRend: the point head trains on importance-sampled points with
    # nearest-sampled gt labels (mmseg cascade ``loss_point``)
    has_point = getattr(model, "point_head", None) is not None
    rng = jax.random.PRNGKey(seed)

    x0, _ = _assemble(dataset, range(min(batch_size, len(dataset))))
    # jit the init: eager flax init dispatches every op separately, which
    # on a remote-attached TPU pays a tunnel round trip per op (minutes
    # for an R50 — measured; one compiled program is seconds)
    if has_point:
        variables = jax.jit(lambda r, x: model.init(
            r, x, jax.random.PRNGKey(0), train=True,
            method=type(model).forward_train_points))(rng, x0)
    elif has_aux:
        variables = jax.jit(lambda r, x: model.init(
            r, x, train=True,
            method=type(model).forward_train))(rng, x0)
    else:
        variables = jax.jit(
            lambda r, x: model.init(r, x, train=True))(rng, x0)
    params = variables["params"]
    stats = variables.get("batch_stats", {})
    if load_from:
        from flax import serialization
        template = {"params": params}
        if stats:
            template["batch_stats"] = stats
        with open(load_from, "rb") as f:
            loaded = serialization.from_bytes(template, f.read())
        params = loaded["params"]
        stats = loaded.get("batch_stats", stats)
    if optimizer is None and lr_config is None:
        optimizer = {"type": "Adam", "lr": lr}
    tx, schedule = build_optimizer(optimizer, lr_config, max_iters,
                                   optimizer_config)
    opt = tx.init(params)
    start_iter = 0
    if resume_from:
        params, stats, opt, start_iter = _load_train_state(
            resume_from, params, stats, opt)
        log_fn(f"resumed from {resume_from} at iter {start_iter}")

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

    ckpt_interval = (checkpoint_config or {}).get("interval", 0)
    max_keep = (checkpoint_config or {}).get("max_keep_ckpts", -1)
    log_interval = (log_config or {}).get("interval", 0)
    if ckpt_interval and work_dir:
        import os
        os.makedirs(work_dir, exist_ok=True)
    saved_ckpts = []

    history = {"loss": [], "eval": []}
    n = len(dataset)
    for it in range(start_iter, max_iters):
        idxs = _batch_indices(n, batch_size, it, seed)
        x, y = _assemble(dataset, idxs)
        if mesh is not None:
            x, y = jax.device_put((x, y), data_sh)
        krng = jax.random.fold_in(rng, it)
        params, stats, opt, loss = step(params, stats, opt, x, y, krng)
        history["loss"].append(float(loss))
        if log_interval and (it + 1) % log_interval == 0:
            log_fn(f"Iter [{it + 1}/{max_iters}] "
                   f"lr: {float(schedule(it)):.3e} "
                   f"loss: {float(loss):.4f}")
        if eval_interval and eval_dataset is not None \
                and (it + 1) % eval_interval == 0:
            ev = evaluate_segmentor(model, {"params": params,
                                            "batch_stats": stats},
                                    eval_dataset)
            history["eval"].append({"iter": it + 1, **ev})
            log_fn(f"iter {it + 1}: loss {float(loss):.4f} eval {ev}")
        if ckpt_interval and work_dir and (it + 1) % ckpt_interval == 0:
            import os, shutil
            path = os.path.join(work_dir, f"iter_{it + 1}.msgpack")
            _save_train_state(path, params, stats, opt, it + 1)
            shutil.copyfile(path, os.path.join(work_dir, "latest.msgpack"))
            saved_ckpts.append(path)
            if max_keep > 0 and len(saved_ckpts) > max_keep:
                old = saved_ckpts.pop(0)
                if os.path.exists(old):
                    os.remove(old)

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
                       batch_size: int = 2, mesh=None,
                       efficient_test: bool = False):
    """EvalHook equivalent: whole-image inference over ``dataset``, then
    ``dataset.evaluate`` (aAcc / per-class acc / mIoU or mDice).

    ``mesh``: shard each batch over the mesh's first axis with replicated
    params — the TPU-native ``apis/test.py`` ``multi_gpu_test`` (results
    identical to single-device; the batch pads up to the device count).

    ``efficient_test``: spill each prediction to a tempfile ``.npy`` and
    hand the PATHS to ``dataset.evaluate`` (`apis/test.py:39-107`
    ``np2tmp``) so giant result sets (Cityscapes-scale) never sit in
    host RAM; ``metrics.intersect_and_union`` loads them lazily."""
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
        if efficient_test:
            import tempfile
            for p in pred:
                f = tempfile.NamedTemporaryFile(suffix=".npy",
                                                delete=False)
                np.save(f, p)
                f.close()
                results.append(f.name)
        else:
            results.extend(list(pred))
    out = dataset.evaluate(results, metric=metric)
    if efficient_test:
        import os
        for p in results:
            os.unlink(p)
    return out
