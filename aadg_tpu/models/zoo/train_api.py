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


def train_segmentor(model, dataset, *,
                    max_iters: int = 100,
                    batch_size: int = 2,
                    lr: float = 1e-3,
                    ignore_index: int = 255,
                    sampler: Optional[dict] = None,
                    aux_weight: float = 0.4,
                    eval_dataset=None,
                    eval_interval: int = 0,
                    seed: int = 0,
                    log_fn: Callable[[str], None] = print):
    """Train a zoo segmentor on a pipeline dataset. Returns
    ``(variables, history)`` where history holds per-iter losses and any
    periodic eval dicts.

    ``sampler``: mmseg-style dict, e.g. ``dict(type='OHEMPixelSampler',
    thresh=0.7, min_kept=10000)`` — mined per-pixel weights feed the CE
    exactly like ``BaseDecodeHead.losses`` does.
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
    tx = optax.adam(lr)
    opt = tx.init(params)

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
