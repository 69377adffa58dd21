"""mmseg training-schedule fidelity for the zoo train API.

The reference builds its optimizer and LR policy from config — SGD with
momentum + weight decay and the mmcv poly LR hook
(`/root/reference/models/mmseg/apis/train.py:71-90` build_optimizer +
register_training_hooks(cfg.lr_config)). These tests pin:

- the poly formula against mmcv's PolyLrUpdaterHook math,
- torch.optim.SGD semantics (wd folded into the grad BEFORE the momentum
  buffer, lr applied to the buffered update) via a torch oracle,
- an e2e `train_segmentor(optimizer=..., lr_config=...)` run,
- mesh-DP training == single-device training (the DDP-train twin of
  `evaluate_segmentor(mesh=)`, matching `apis/train.py:55-68`).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from flax import linen as nn

from aadg_tpu.models.zoo.train_api import (build_optimizer, poly_lr,
                                           train_segmentor)


def test_poly_lr_formula_matches_mmcv():
    # mmcv PolyLrUpdaterHook (by_epoch=False):
    # lr = (base - min) * (1 - iter/max_iters)**power + min
    s = poly_lr(0.01, max_iters=100, power=0.9, min_lr=1e-4)
    assert np.isclose(s(0), 0.01)
    for it in (1, 10, 50, 99, 100):
        want = (0.01 - 1e-4) * (1 - it / 100) ** 0.9 + 1e-4
        assert np.isclose(s(it), want), it
    assert np.isclose(s(100), 1e-4)


def test_build_optimizer_rejects_unknown_keys():
    with pytest.raises(AssertionError):
        build_optimizer(dict(type="SGD", lr=0.1, nesterov=True))
    with pytest.raises(ValueError):
        build_optimizer(dict(type="RMSprop", lr=0.1))
    with pytest.raises(AssertionError):
        build_optimizer(dict(type="SGD", lr=0.1),
                        dict(policy="step", step=[10]))


def test_sgd_momentum_wd_poly_matches_torch():
    torch = pytest.importorskip("torch")
    rng = np.random.default_rng(0)
    w0 = rng.normal(0, 1, (4, 3)).astype(np.float32)
    grads = [rng.normal(0, 1, (4, 3)).astype(np.float32) for _ in range(6)]
    max_iters, base_lr, mom, wd = 6, 0.05, 0.9, 5e-4

    # torch oracle with per-step poly lr (what mmcv's hook sets on the
    # optimizer before each iter)
    p = torch.nn.Parameter(torch.from_numpy(w0.copy()))
    opt = torch.optim.SGD([p], lr=base_lr, momentum=mom, weight_decay=wd)
    sched = poly_lr(base_lr, max_iters, power=0.9, min_lr=1e-4)
    for i, g in enumerate(grads):
        for group in opt.param_groups:
            group["lr"] = float(sched(i))
        opt.zero_grad()
        p.grad = torch.from_numpy(g.copy())
        opt.step()
    want = p.detach().numpy()

    tx, _ = build_optimizer(
        dict(type="SGD", lr=base_lr, momentum=mom, weight_decay=wd),
        dict(policy="poly", power=0.9, min_lr=1e-4), max_iters)
    import optax
    params = {"w": jnp.asarray(w0)}
    state = tx.init(params)
    for g in grads:
        upd, state = tx.update({"w": jnp.asarray(g)}, state, params)
        params = optax.apply_updates(params, upd)
    np.testing.assert_allclose(np.asarray(params["w"]), want,
                               rtol=1e-5, atol=1e-6)


def test_adamw_poly_matches_torch():
    # the published SegFormer recipe's optimizer (`configs/segformer/*`):
    # AdamW 6e-5, betas (0.9, 0.999), wd 0.01, poly power 1.0 — torch
    # AdamW decay is DECOUPLED: p -= lr*wd*p before the adam step
    torch = pytest.importorskip("torch")
    rng = np.random.default_rng(1)
    w0 = rng.normal(0, 1, (4, 3)).astype(np.float32)
    grads = [rng.normal(0, 1, (4, 3)).astype(np.float32) for _ in range(6)]
    max_iters, base_lr, wd = 6, 6e-2, 0.01  # lr scaled up so decay shows

    p = torch.nn.Parameter(torch.from_numpy(w0.copy()))
    opt = torch.optim.AdamW([p], lr=base_lr, betas=(0.9, 0.999),
                            eps=1e-8, weight_decay=wd)
    sched = poly_lr(base_lr, max_iters, power=1.0, min_lr=0.0)
    for i, g in enumerate(grads):
        for group in opt.param_groups:
            group["lr"] = float(sched(i))
        opt.zero_grad()
        p.grad = torch.from_numpy(g.copy())
        opt.step()
    want = p.detach().numpy()

    tx, _ = build_optimizer(
        dict(type="AdamW", lr=base_lr, betas=(0.9, 0.999),
             weight_decay=wd),
        dict(policy="poly", power=1.0, min_lr=0.0), max_iters)
    import optax
    params = {"w": jnp.asarray(w0)}
    state = tx.init(params)
    for g in grads:
        upd, state = tx.update({"w": jnp.asarray(g)}, state, params)
        params = optax.apply_updates(params, upd)
    np.testing.assert_allclose(np.asarray(params["w"]), want,
                               rtol=1e-5, atol=1e-6)


def test_adamw_paramwise_custom_keys_matches_torch():
    # mmcv paramwise_cfg.custom_keys (the SegFormer recipe:
    # norm -> decay_mult 0, head -> lr_mult 10): torch oracle = param
    # groups with lr = base*lr_mult (re-set per iter by the poly hook,
    # which scales the group lr by the same factor) and
    # weight_decay = wd*decay_mult
    torch = pytest.importorskip("torch")
    rng = np.random.default_rng(2)
    shapes = {"backbone.norm": (3, 4), "backbone.conv": (4, 4),
              "decode_head.w": (2, 5)}
    w0 = {k: rng.normal(0, 1, s).astype(np.float32)
          for k, s in shapes.items()}
    grads = [{k: rng.normal(0, 1, s).astype(np.float32)
              for k, s in shapes.items()} for _ in range(5)]
    max_iters, base_lr, wd = 5, 6e-2, 0.01
    mults = {"backbone.norm": (1.0, 0.0), "backbone.conv": (1.0, 1.0),
             "decode_head.w": (10.0, 1.0)}

    ps = {k: torch.nn.Parameter(torch.from_numpy(v.copy()))
          for k, v in w0.items()}
    opt = torch.optim.AdamW(
        [{"params": [ps[k]], "lr": base_lr * lm, "weight_decay": wd * dm,
          "name": k} for k, (lm, dm) in mults.items()],
        lr=base_lr, betas=(0.9, 0.999), eps=1e-8)
    sched = poly_lr(base_lr, max_iters, power=1.0, min_lr=0.0)
    for i, g in enumerate(grads):
        for group in opt.param_groups:
            lm, _ = mults[group["name"]]
            group["lr"] = float(sched(i)) * lm
        opt.zero_grad()
        for k in ps:
            ps[k].grad = torch.from_numpy(g[k].copy())
        opt.step()
    want = {k: p.detach().numpy() for k, p in ps.items()}

    tx, _ = build_optimizer(
        dict(type="AdamW", lr=base_lr, betas=(0.9, 0.999),
             weight_decay=wd,
             paramwise_cfg=dict(custom_keys={
                 "norm": dict(decay_mult=0.0),
                 "head": dict(lr_mult=10.0)})),
        dict(policy="poly", power=1.0, min_lr=0.0), max_iters)
    import optax
    params = {"backbone": {"norm": jnp.asarray(w0["backbone.norm"]),
                           "conv": jnp.asarray(w0["backbone.conv"])},
              "decode_head": {"w": jnp.asarray(w0["decode_head.w"])}}
    state = tx.init(params)
    for g in grads:
        gt = {"backbone": {"norm": jnp.asarray(g["backbone.norm"]),
                           "conv": jnp.asarray(g["backbone.conv"])},
              "decode_head": {"w": jnp.asarray(g["decode_head.w"])}}
        upd, state = tx.update(gt, state, params)
        params = optax.apply_updates(params, upd)
    np.testing.assert_allclose(np.asarray(params["backbone"]["norm"]),
                               want["backbone.norm"], rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(params["backbone"]["conv"]),
                               want["backbone.conv"], rtol=1e-5, atol=1e-6)
    # lr_mult=10 amplifies f32 mul-ordering noise (we fold the mult into
    # the update, torch folds it into the group lr) — loosen atol
    np.testing.assert_allclose(np.asarray(params["decode_head"]["w"]),
                               want["decode_head.w"], rtol=1e-4, atol=2e-5)


def test_custom_keys_longest_match_wins():
    # mmcv applies the first (sorted) matching key; we sort longest-first
    # so a more specific key shadows a generic one
    import optax
    tx, _ = build_optimizer(
        dict(type="SGD", lr=1.0, weight_decay=1.0,
             paramwise_cfg=dict(custom_keys={
                 "norm": dict(decay_mult=0.0),
                 "backbone.norm": dict(decay_mult=0.5)})))
    params = {"backbone": {"norm": jnp.ones((2,))},
              "head": {"norm": jnp.ones((2,))}}
    state = tx.init(params)
    g = jax.tree_util.tree_map(jnp.zeros_like, params)
    upd, _ = tx.update(g, state, params)
    # update = -lr * wd * decay_mult * p  (zero grads)
    np.testing.assert_allclose(np.asarray(upd["backbone"]["norm"]),
                               -0.5, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(upd["head"]["norm"]), 0.0)


class _MemDataset:
    """Minimal in-memory pipeline-dataset stand-in."""

    def __init__(self, n=8, size=16, n_classes=3, seed=0):
        r = np.random.default_rng(seed)
        self.x = r.normal(0, 1, (n, size, size, 3)).astype(np.float32)
        self.y = r.integers(0, n_classes, (n, size, size)).astype(np.int64)

    def __len__(self):
        return len(self.x)

    def __getitem__(self, i):
        return {"img": self.x[i], "gt_semantic_seg": self.y[i]}


class _TinySeg(nn.Module):
    """Small conv+BN segmentor honoring the (logits, feature) contract —
    BN included so mesh-DP also exercises cross-device batch statistics."""
    num_classes: int = 3

    @nn.compact
    def __call__(self, x, train: bool = True):
        h = nn.Conv(8, (3, 3), padding=1)(x)
        h = nn.BatchNorm(use_running_average=not train, momentum=0.9)(h)
        h = nn.relu(h)
        logits = nn.Conv(self.num_classes, (1, 1))(h)
        return logits, jnp.mean(h, axis=(1, 2))


def test_train_segmentor_sgd_poly_e2e():
    ds = _MemDataset()
    model = _TinySeg()
    variables, hist = train_segmentor(
        model, ds, max_iters=5, batch_size=2,
        optimizer=dict(type="SGD", lr=0.01, momentum=0.9,
                       weight_decay=5e-4),
        lr_config=dict(policy="poly", power=0.9, min_lr=1e-4))
    assert len(hist["loss"]) == 5
    assert all(np.isfinite(hist["loss"]))
    assert "batch_stats" in variables  # BN stats updated through training


@pytest.mark.heavy
def test_train_segmentor_mesh_dp_matches_single_device():
    """DP-vs-single-device equivalence, the train twin of
    tests/test_parallel.py's epoch equivalence: sharding each batch over
    the mesh with replicated params must reproduce the single-device run
    (XLA GSPMD computes the same global-batch losses, grads and BN
    statistics)."""
    from jax.sharding import Mesh

    ds = _MemDataset(n=16)
    model = _TinySeg()
    kw = dict(max_iters=4, batch_size=8,
              optimizer=dict(type="SGD", lr=0.01, momentum=0.9,
                             weight_decay=5e-4),
              lr_config=dict(policy="poly", power=0.9, min_lr=1e-4),
              seed=3)
    v1, h1 = train_segmentor(model, ds, **kw)
    mesh = Mesh(np.array(jax.devices()[:8]).reshape(8), ("data",))
    v2, h2 = train_segmentor(model, ds, mesh=mesh, **kw)
    np.testing.assert_allclose(h2["loss"], h1["loss"], rtol=1e-5, atol=1e-6)
    flat1 = jax.tree_util.tree_leaves(v1["params"])
    flat2 = jax.tree_util.tree_leaves(v2["params"])
    for a, b in zip(flat1, flat2):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-5, atol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(v1["batch_stats"]),
                    jax.tree_util.tree_leaves(v2["batch_stats"])):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-5, atol=1e-6)


def test_poly_lr_warmup_matches_mmcv():
    """mmcv LrUpdaterHook.get_warmup_lr: during warmup_iters the regular
    lr is scaled by the warmup factor, then the plain poly curve resumes."""
    base, mi, wi, wr = 0.01, 100, 10, 0.1

    def regular(it):
        return (base - 1e-4) * (1 - it / mi) ** 0.9 + 1e-4

    lin = poly_lr(base, mi, power=0.9, min_lr=1e-4, warmup="linear",
                  warmup_iters=wi, warmup_ratio=wr)
    con = poly_lr(base, mi, power=0.9, min_lr=1e-4, warmup="constant",
                  warmup_iters=wi, warmup_ratio=wr)
    exp = poly_lr(base, mi, power=0.9, min_lr=1e-4, warmup="exp",
                  warmup_iters=wi, warmup_ratio=wr)
    for it in (0, 3, 9):
        k_lin = 1 - (1 - it / wi) * (1 - wr)
        assert np.isclose(float(lin(it)), regular(it) * k_lin), it
        assert np.isclose(float(con(it)), regular(it) * wr), it
        assert np.isclose(float(exp(it)), regular(it) * wr ** (1 - it / wi))
    for it in (10, 11, 50):  # past warmup: plain poly
        assert np.isclose(float(lin(it)), regular(it)), it
        assert np.isclose(float(con(it)), regular(it)), it
        assert np.isclose(float(exp(it)), regular(it)), it


def test_grad_clip_matches_torch():
    """optimizer_config=dict(grad_clip=...) == mmcv OptimizerHook's
    clip_grad_norm_ before the SGD step."""
    torch = pytest.importorskip("torch")
    import optax

    rng = np.random.default_rng(5)
    w0 = rng.normal(0, 1, (4, 3)).astype(np.float32)
    grads = [10.0 * rng.normal(0, 1, (4, 3)).astype(np.float32)
             for _ in range(4)]
    max_norm, lr, mom = 2.0, 0.05, 0.9

    p = torch.nn.Parameter(torch.from_numpy(w0.copy()))
    opt = torch.optim.SGD([p], lr=lr, momentum=mom)
    for g in grads:
        opt.zero_grad()
        p.grad = torch.from_numpy(g.copy())
        torch.nn.utils.clip_grad_norm_([p], max_norm)
        opt.step()
    want = p.detach().numpy()

    tx, _ = build_optimizer(
        dict(type="SGD", lr=lr, momentum=mom), None, 4,
        optimizer_config=dict(grad_clip=dict(max_norm=max_norm,
                                             norm_type=2)))
    params = {"w": jnp.asarray(w0)}
    state = tx.init(params)
    for g in grads:
        upd, state = tx.update({"w": jnp.asarray(g)}, state, params)
        params = optax.apply_updates(params, upd)
    np.testing.assert_allclose(np.asarray(params["w"]), want,
                               rtol=1e-5, atol=1e-6)


def test_train_segmentor_checkpoint_resume_exact(tmp_path):
    """CheckpointHook + resume_from: train 3+3 with a mid-run checkpoint
    == train 6 straight (params, batch_stats, optimizer state and the
    data/dropout streams all replay)."""
    ds = _MemDataset(n=8)
    model = _TinySeg()
    kw = dict(batch_size=2,
              optimizer=dict(type="SGD", lr=0.01, momentum=0.9,
                             weight_decay=5e-4),
              lr_config=dict(policy="poly", power=0.9, min_lr=1e-4),
              seed=7)
    # checkpoint mid-run of the SAME schedule (max_iters feeds the poly
    # denominator, so an "interrupted" run must share the full config)
    wd = str(tmp_path / "work")
    v_full, h_full = train_segmentor(model, ds, max_iters=6, work_dir=wd,
                                     checkpoint_config=dict(interval=3),
                                     **kw)
    v_res, h_res = train_segmentor(
        model, ds, max_iters=6,
        resume_from=str(tmp_path / "work" / "iter_3.msgpack"), **kw)
    assert len(h_res["loss"]) == 3  # only iters 3..5 run
    np.testing.assert_allclose(h_res["loss"], h_full["loss"][3:],
                               rtol=1e-6, atol=1e-7)
    for a, b in zip(jax.tree_util.tree_leaves(v_full["params"]),
                    jax.tree_util.tree_leaves(v_res["params"])):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-6, atol=1e-7)
    for a, b in zip(jax.tree_util.tree_leaves(v_full["batch_stats"]),
                    jax.tree_util.tree_leaves(v_res["batch_stats"])):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-6, atol=1e-7)


def test_train_segmentor_ckpt_pruning_and_load_from(tmp_path):
    from aadg_tpu.models.zoo.api import save_segmentor
    import os

    ds = _MemDataset(n=8)
    model = _TinySeg()
    wd = str(tmp_path / "work")
    logs = []
    v, _ = train_segmentor(
        model, ds, max_iters=6, batch_size=2, work_dir=wd,
        checkpoint_config=dict(interval=2, max_keep_ckpts=2),
        log_config=dict(interval=3), log_fn=logs.append)
    kept = sorted(f for f in os.listdir(wd) if f.startswith("iter_"))
    assert kept == ["iter_4.msgpack", "iter_6.msgpack"]  # pruned to 2
    assert os.path.exists(os.path.join(wd, "latest.msgpack"))
    assert any("Iter [3/6]" in l for l in logs)
    assert any("lr:" in l and "loss:" in l for l in logs)

    # load_from: weights-only warm start from an init_segmentor-format file
    ck = str(tmp_path / "weights.msgpack")
    save_segmentor(v, ck)
    v2, h2 = train_segmentor(model, ds, max_iters=1, batch_size=2,
                             load_from=ck)
    assert np.isfinite(h2["loss"][0])


def test_train_segmentor_cascade_deep_supervision():
    """Cascade segmentors (ocrnet) train every stage
    (`cascade_encoder_decoder.py:63-79`): forward_train returns the
    intermediate stage outputs through the aux tuple (weight 0.4 = the
    ocrnet recipe's FCN-stage loss weight), and train_segmentor picks
    the path up automatically."""
    from aadg_tpu.models.zoo.segmentor import CascadeEncoderDecoder
    from aadg_tpu.models.zoo.heads import FCNHead
    from aadg_tpu.models.zoo.attention_heads import OCRHead

    class _TinyBackbone(nn.Module):
        @nn.compact
        def __call__(self, x, train: bool = True):
            h = nn.relu(nn.Conv(8, (3, 3), strides=2, padding=1)(x))
            h2 = nn.relu(nn.Conv(16, (3, 3), strides=2, padding=1)(h))
            return [h, h2]

    model = CascadeEncoderDecoder(
        backbone=_TinyBackbone(),
        decode_head=FCNHead(num_classes=3, channels=8, num_convs=1,
                            concat_input=False, in_index=1),
        cascade_heads=(OCRHead(num_classes=3, channels=8, ocr_channels=4,
                               in_index=1),),
        feat_ch=16)

    x = jnp.ones((2, 16, 16, 3))
    v = jax.jit(lambda r, x: model.init(
        r, x, train=True, method=CascadeEncoderDecoder.forward_train))(
        jax.random.PRNGKey(0), x)
    (logits, pooled, aux), _ = model.apply(
        v, x, train=True, mutable=["batch_stats"],
        rngs={"dropout": jax.random.PRNGKey(1)},
        method=CascadeEncoderDecoder.forward_train)
    assert logits.shape == (2, 16, 16, 3)
    assert len(aux) == 1 and aux[0].shape == (2, 16, 16, 3)
    # final logits match __call__ (the stage chain is the same)
    call_logits, _ = model.apply(v, x, train=False)
    assert call_logits.shape == (2, 16, 16, 3)

    ds = _MemDataset()
    variables, hist = train_segmentor(
        model, ds, max_iters=3, batch_size=2,
        optimizer=dict(type="SGD", lr=0.01, momentum=0.9,
                       weight_decay=5e-4),
        lr_config=dict(policy="poly", power=0.9, min_lr=1e-4))
    assert len(hist["loss"]) == 3
    assert all(np.isfinite(hist["loss"]))
