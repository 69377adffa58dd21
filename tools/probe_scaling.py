"""Batch-scaling probe for the flagship search step (VERDICT r3 #2).

bench.py shows the optic step at the reference shape (B=8, 144 images)
runs at 99.9% of its whole-step HBM roofline, but B=16 measures ~0.86 and
B=32 ~0.745 with absolute img/s flat-to-regressing. This tool names the
region: it splits the step into

  front  — in-graph batch gather + multi-policy augmentation + scale-crop
           transform + soft domain labels (everything before the model),
  back   — seg+dis fwd/bwd, optimizer updates, momentum branch, Sinkhorn
           rewards (everything after x/y/dc_soft exist),

times each standalone at a sweep of batch sizes with the same
scan+forced-readback protocol as bench.py, and prints per-component XLA
cost analysis (bytes, FLOPs), the implied roofline floor, and the achieved
fraction — so superlinear degradation is attributed to a component, not to
"XLA scheduling". `--trace DIR` additionally captures a jax profiler trace
of a few full steps at each batch size for HLO-level drill-down.

Semantics mirror `engine/steps.py::make_search_step` exactly (same aug →
label-from-original → transform → loss/grads → momentum branch → pairwise
OT); reference load shape per `search_dg.py:128-141`.
"""

import argparse
import json
import sys
import time

sys.path.insert(0, ".")

# v5e fallbacks; overwritten per-device at probe time from bench.py's
# public-spec tables so floor_ms/frac stay correct on other chips
HBM_BW = 819e9     # bytes/s
PEAK_BF16 = 197e12


def _device_rooflines():
    global HBM_BW, PEAK_BF16
    try:
        import jax
        import bench
        dev = jax.devices()[0]
        bw, peak = bench._hbm_bw(dev), bench._peak_flops(dev)
        if bw:
            HBM_BW = bw
        if peak:
            PEAK_BF16 = peak
    except Exception:
        pass


def _enable_compile_cache():
    """Persistent compile cache for the real-TPU programs: probe iterations
    recompile nothing (the big step programs take ~1 min each to build on
    this 1-core host)."""
    from aadg_tpu.utils.cache import setup_compile_cache
    setup_compile_cache("~/.cache/jax_tpu_probe", min_compile_secs=5.0)


def _costs(compiled):
    ca = compiled.cost_analysis()
    if isinstance(ca, (list, tuple)):
        ca = ca[0]
    return (float(ca.get("flops", 0.0)), float(ca.get("bytes accessed", 0.0)))


def _mem(compiled):
    try:
        ma = compiled.memory_analysis()
        return ma.temp_size_in_bytes + ma.argument_size_in_bytes + \
            ma.output_size_in_bytes
    except Exception:
        return 0


def _mem3(compiled):
    """(temp, argument, output) bytes from XLA buffer assignment."""
    try:
        ma = compiled.memory_analysis()
        return (ma.temp_size_in_bytes, ma.argument_size_in_bytes,
                ma.output_size_in_bytes)
    except Exception:
        return (0, 0, 0)


def build(batch, M=6, n_iters=10):
    import jax
    import jax.numpy as jnp
    from aadg_tpu.config import load_config
    from aadg_tpu.engine.state import build_entities, init_state
    from aadg_tpu.engine.steps import make_search_step
    from aadg_tpu.models import controller as ctrl_mod
    from aadg_tpu.data.datasets import SyntheticDataset, load_train_arrays
    from aadg_tpu.data.stores import make_train_store, sample_train_batch
    from aadg_tpu.data.transforms import soft_domain_label

    cfg = load_config()
    cfg.DATASET.NAME = "synthetic_optic"
    cfg.MODEL.NAME = "deeplabv3+"
    cfg.TRAIN.BATCH_SIZE = batch
    cfg.CONTROLLER.M = M
    cfg.TPU.CROP_SIZE = 256

    ds = SyntheticDataset("optic", n_domains=3, n_per_domain=max(16, batch),
                          size=256)
    store = make_train_store(*load_train_arrays(ds))
    ent = build_entities(cfg, "search", steps_per_epoch=1)
    sd, cs = init_state(ent, jax.random.PRNGKey(0))
    step = make_search_step(ent, M)
    policies, *_ = ctrl_mod.sample(cs.params, ent.ctrl_spec,
                                   jax.random.PRNGKey(1), M)
    ptens = ctrl_mod.policies_to_tensor(policies, ent.ctrl_spec)

    # ---- full step (same as bench.py) ----
    def full_epoch(ts, store, ptens, key):
        def body(carry, k):
            kb, ks = jax.random.split(k)
            b = sample_train_batch(store, kb, batch)
            carry, m, r = step(carry, b, ptens, ks)
            return carry, r
        ts, rs = jax.lax.scan(body, ts, jax.random.split(key, n_iters))
        return ts, jnp.sum(rs)

    # ---- front: gather + augment + transform + labels ----
    def front_once(store, ptens, key):
        kb, k_aug, k_t, k_d = jax.random.split(key, 4)
        imgs, masks, dcs = sample_train_batch(store, kb, batch)
        b, d = imgs.shape[0], imgs.shape[1]
        n0 = b * d
        imgs = imgs.reshape((n0,) + imgs.shape[2:])
        masks = masks.reshape((n0,) + masks.shape[2:])
        dcs = dcs.reshape((n0,))
        aug_i, aug_m = ent.multi_policy(imgs, masks, ptens,
                                        jax.random.split(k_aug, n0))
        aug_m = jnp.broadcast_to(masks[:, None], aug_m.shape)
        n = n0 * M
        flat_i = aug_i.reshape((n,) + aug_i.shape[2:])
        flat_m = aug_m.reshape((n,) + aug_m.shape[2:])
        x, y = jax.vmap(ent.transform)(flat_i, flat_m,
                                       jax.random.split(k_t, n))
        dc_soft0 = jax.vmap(
            lambda i, k: soft_domain_label(i, ent.n_domains, k))(
                dcs, jax.random.split(k_d, n0))
        dc_soft = jnp.repeat(dc_soft0, M, axis=0)
        return x, y, dc_soft

    def front_epoch(store, ptens, key):
        def body(acc, k):
            x, y, dc = front_once(store, ptens, k)
            # cheap data dependence so the scan body cannot be hoisted
            return acc + jnp.float32(x[0, 0, 0, 0]) + dc[0, 0], None
        acc, _ = jax.lax.scan(body, jnp.float32(0.),
                              jax.random.split(key, n_iters))
        return acc

    # ---- back: fwd/bwd + updates + momentum branch + sinkhorn ----
    from aadg_tpu.engine.steps import _apply_model, _apply_disc
    from aadg_tpu.losses import bce_loss, soft_cross_entropy
    from aadg_tpu.ops.sinkhorn import pairwise_domain_ot

    momentum = ent.dis_name == "momentum_feature"

    def back_once(ts, x, y, dc_soft, key, remat=False):
        b = batch

        apply_model = _apply_model
        if remat:
            # jax.checkpoint on the seg forward: drops conv activations at
            # the fwd/bwd boundary and recomputes them in bwd — trades
            # FLOPs (cheap here: MFU ~0.09) for PEAK MEMORY, testing the
            # hypothesis that B>=16's floor_frac loss is HBM-capacity
            # pressure (B=16 back half peaks at ~15.3 GB of 16 GB)
            def apply_model(ent_, p, s, x_, train, rng):
                fn = jax.checkpoint(
                    lambda p_, x__: _apply_model(ent_, p_, s, x__,
                                                 train=train, rng=rng))
                return fn(p, x_)

        def loss_fn(seg_params, dis_params):
            logits, feat, new_seg_stats = apply_model(
                ent, seg_params, ts.seg_stats, x, train=True, rng=key)
            seg_soft = jax.nn.sigmoid(logits)
            seg_loss = bce_loss(seg_soft, y)
            dis_out_bp, _ = _apply_disc(
                ent, dis_params, ts.dis_stats,
                jax.lax.stop_gradient(feat), None, train=True,
                momentum=False)
            dis_loss_bp = soft_cross_entropy(dis_out_bp, dc_soft)
            return seg_loss + dis_loss_bp, (feat, new_seg_stats)

        grads, (feat, new_seg_stats) = jax.grad(
            loss_fn, argnums=(0, 1), has_aux=True)(
                ts.seg_params, ts.dis_params)
        (dis_out_mom, dom_feat), _ = _apply_disc(
            ent, ts.dis_params, ts.dis_stats,
            jax.lax.stop_gradient(feat), None, train=False,
            momentum=momentum, return_feature=True)
        feats = dom_feat.reshape(b, 3, M, -1).transpose(2, 1, 0, 3)
        rewards = jax.vmap(lambda f: pairwise_domain_ot(f))(feats)
        seg_upd, seg_opt = ent.model_tx.update(grads[0], ts.seg_opt,
                                               ts.seg_params)
        dis_upd, dis_opt = ent.dis_tx.update(grads[1], ts.dis_opt,
                                             ts.dis_params)
        new_ts = type(ts)(
            seg_params=jax.tree_util.tree_map(
                lambda p, u: p + u, ts.seg_params, seg_upd),
            seg_stats=new_seg_stats, seg_opt=seg_opt,
            dis_params=jax.tree_util.tree_map(
                lambda p, u: p + u, ts.dis_params, dis_upd),
            dis_stats=ts.dis_stats, dis_opt=dis_opt)
        return new_ts, rewards

    def back_epoch(ts, x, y, dc_soft, key, remat=False):
        def body(carry, k):
            carry, r = back_once(carry, x, y, dc_soft, k, remat=remat)
            return carry, jnp.sum(r)
        ts, rs = jax.lax.scan(body, ts, jax.random.split(key, n_iters))
        return ts, jnp.sum(rs)

    def back_once_micro(ts, x, y, dc_soft, key, n_micro):
        """back_once with the model fwd/bwd split into `n_micro` sequential
        microbatches over the leading (per-sample) axis + grad accumulation,
        ONE optimizer update, rewards on the full per-policy feature set.

        Tests the HBM-capacity hypothesis for B>=16: each microbatch's
        activation liveness is that of a B/n_micro step (which measures at
        ~0.99 of floor), while per-step costs (optimizer, rewards, LUT
        builders) stay amortized. BN batch stats are per-microbatch here
        (sequential momentum updates) — fine for a scheduling probe; a
        production lever would sync them like cross-device BN.
        """
        b = batch
        n = x.shape[0]
        xs = x.reshape((n_micro, n // n_micro) + x.shape[1:])
        ys = y.reshape((n_micro, n // n_micro) + y.shape[1:])
        dcs_ = dc_soft.reshape((n_micro, n // n_micro) + dc_soft.shape[1:])

        def loss_fn(seg_params, dis_params, seg_stats, xm, ym, dcm, k):
            logits, feat, new_seg_stats = _apply_model(
                ent, seg_params, seg_stats, xm, train=True, rng=k)
            seg_soft = jax.nn.sigmoid(logits)
            seg_loss = bce_loss(seg_soft, ym)
            dis_out_bp, _ = _apply_disc(
                ent, dis_params, ts.dis_stats,
                jax.lax.stop_gradient(feat), None, train=True,
                momentum=False)
            dis_loss_bp = soft_cross_entropy(dis_out_bp, dcm)
            return seg_loss + dis_loss_bp, (feat, new_seg_stats)

        def micro(carry, inp):
            gsum, seg_stats = carry
            xm, ym, dcm, k = inp
            grads, (feat, new_stats) = jax.grad(
                loss_fn, argnums=(0, 1), has_aux=True)(
                    ts.seg_params, ts.dis_params, seg_stats, xm, ym, dcm, k)
            gsum = jax.tree_util.tree_map(lambda a, g: a + g, gsum, grads)
            (_, dom_feat), _ = _apply_disc(
                ent, ts.dis_params, ts.dis_stats,
                jax.lax.stop_gradient(feat), None, train=False,
                momentum=momentum, return_feature=True)
            return (gsum, new_stats), dom_feat

        zeros = jax.tree_util.tree_map(
            jnp.zeros_like, (ts.seg_params, ts.dis_params))
        (gsum, new_seg_stats), dom_feats = jax.lax.scan(
            micro, (zeros, ts.seg_stats),
            (xs, ys, dcs_, jax.random.split(key, n_micro)))
        grads = jax.tree_util.tree_map(lambda g: g / n_micro, gsum)
        dom_feat = dom_feats.reshape((n,) + dom_feats.shape[2:])
        feats = dom_feat.reshape(b, 3, M, -1).transpose(2, 1, 0, 3)
        rewards = jax.vmap(lambda f: pairwise_domain_ot(f))(feats)
        seg_upd, seg_opt = ent.model_tx.update(grads[0], ts.seg_opt,
                                               ts.seg_params)
        dis_upd, dis_opt = ent.dis_tx.update(grads[1], ts.dis_opt,
                                             ts.dis_params)
        new_ts = type(ts)(
            seg_params=jax.tree_util.tree_map(
                lambda p, u: p + u, ts.seg_params, seg_upd),
            seg_stats=new_seg_stats, seg_opt=seg_opt,
            dis_params=jax.tree_util.tree_map(
                lambda p, u: p + u, ts.dis_params, dis_upd),
            dis_stats=ts.dis_stats, dis_opt=dis_opt)
        return new_ts, rewards

    def back_epoch_micro(ts, x, y, dc_soft, key, n_micro):
        def body(carry, k):
            carry, r = back_once_micro(carry, x, y, dc_soft, k, n_micro)
            return carry, jnp.sum(r)
        ts, rs = jax.lax.scan(body, ts, jax.random.split(key, n_iters))
        return ts, jnp.sum(rs)

    return dict(cfg=cfg, ent=ent, sd=sd, store=store, ptens=ptens,
                step=step, full_epoch=full_epoch, front_once=front_once,
                front_epoch=front_epoch, back_epoch=back_epoch,
                back_once=back_once, back_epoch_micro=back_epoch_micro,
                n_iters=n_iters)


def time_compiled(fn_compiled, args, readback, n_iters):
    out = fn_compiled(*args)
    readback(out)
    t0 = time.time()
    out = fn_compiled(*args)
    readback(out)
    return (time.time() - t0) / n_iters


def _parse_copts(pairs):
    """['k=v', ...] -> {k: typed v} for jit(...).compile(compiler_options=)."""
    out = {}
    for p in pairs or []:
        k, _, v = p.partition("=")
        if v.lower() in ("true", "false"):
            out[k] = v.lower() == "true"
        else:
            try:
                out[k] = int(v)
            except ValueError:
                out[k] = v
    return out


def run_probe(batch, trace_dir=None, remat=False, micro=(), copts=None):
    import jax
    import jax.numpy as jnp
    _enable_compile_cache()
    _device_rooflines()
    ctx = build(batch)
    n_iters = ctx["n_iters"]
    sd, store, ptens = ctx["sd"], ctx["store"], ctx["ptens"]
    key = jax.random.PRNGKey(2)
    rows = []

    # Cost analysis runs on the SCANNED epoch programs: HloCostAnalysis
    # counts a while-loop body ONCE regardless of trip count, so the
    # scanned program's flops/bytes ≈ the per-step cost (this is the same
    # property that forbids using it for whole-epoch cost in bench.py).
    def _t(msg):
        print(f"  [{time.strftime('%H:%M:%S')}] {msg}", flush=True)

    # full
    _t("compiling full epoch...")
    full = jax.jit(ctx["full_epoch"]).lower(sd, store, ptens, key).compile()
    dt_full = time_compiled(full, (sd, store, ptens, key),
                            lambda o: float(o[1]), n_iters)
    fl, by = _costs(full)
    rows.append(("full", dt_full, fl, by, _mem(full), _mem3(full)))

    # full under explicit compiler-option overrides (scheduling levers)
    if copts:
        _t(f"compiling full epoch with compiler_options={copts}...")
        try:
            full_co = jax.jit(ctx["full_epoch"]).lower(
                sd, store, ptens, key).compile(compiler_options=copts)
            dt_co = time_compiled(full_co, (sd, store, ptens, key),
                                  lambda o: float(o[1]), n_iters)
            fl_c, by_c = _costs(full_co)
            rows.append(("full_co", dt_co, fl_c, by_c, _mem(full_co),
                         _mem3(full_co)))
        except Exception as e:  # noqa: BLE001 - report rejected options
            print(f"  compiler_options rejected: {e}", flush=True)

    # front
    _t("compiling front epoch...")
    fr = jax.jit(ctx["front_epoch"]).lower(store, ptens, key).compile()
    _t("compiling front once...")
    fr1 = jax.jit(ctx["front_once"]).lower(store, ptens, key).compile()
    dt_fr = time_compiled(fr, (store, ptens, key),
                          lambda o: float(o), n_iters)
    fl_f, by_f = _costs(fr1)
    rows.append(("front", dt_fr, fl_f, by_f, _mem(fr1), _mem3(fr1)))

    # back (inputs produced once on device)
    x, y, dc = fr1(store, ptens, key)
    _t("compiling back epoch...")
    bk = jax.jit(ctx["back_epoch"]).lower(sd, x, y, dc, key).compile()
    dt_bk = time_compiled(bk, (sd, x, y, dc, key),
                          lambda o: float(o[1]), n_iters)
    fl_b, by_b = _costs(bk)
    rows.append(("back", dt_bk, fl_b, by_b, _mem(bk), _mem3(bk)))

    if remat:
        _t("compiling back epoch (remat)...")
        bkr = jax.jit(lambda ts, x, y, dc, k: ctx["back_epoch"](
            ts, x, y, dc, k, remat=True)).lower(
                sd, x, y, dc, key).compile()
        dt_br = time_compiled(bkr, (sd, x, y, dc, key),
                              lambda o: float(o[1]), n_iters)
        fl_r, by_r = _costs(bkr)
        rows.append(("back_rmt", dt_br, fl_r, by_r, _mem(bkr), _mem3(bkr)))

    for nm in micro or ():
        imgs_step = batch * 3 * 6
        if imgs_step % nm:
            print(f"  skip micro={nm}: {imgs_step} images not divisible")
            continue
        _t(f"compiling back epoch (micro={nm})...")
        bkm = jax.jit(lambda ts, x, y, dc, k, _nm=nm:
                      ctx["back_epoch_micro"](ts, x, y, dc, k, _nm)).lower(
                          sd, x, y, dc, key).compile()
        dt_bm = time_compiled(bkm, (sd, x, y, dc, key),
                              lambda o: float(o[1]), n_iters)
        fl_m, by_m = _costs(bkm)
        rows.append((f"back_m{nm}", dt_bm, fl_m, by_m, _mem(bkm),
                     _mem3(bkm)))

    imgs = batch * 3 * 6
    print(f"\n== batch {batch} ({imgs} img/step) ==")
    print(f"{'comp':8s} {'ms':>8s} {'GB':>8s} {'GFLOP':>9s} "
          f"{'floor_ms':>9s} {'frac':>6s} {'peakGB':>7s} "
          f"{'tempGB':>7s} {'argGB':>6s}")
    out = {}
    for name, dt, fl, by, mem, m3 in rows:
        floor = max(by / HBM_BW, fl / PEAK_BF16)
        out[name] = dict(ms=dt * 1e3, gb=by / 1e9, gflop=fl / 1e9,
                         floor_ms=floor * 1e3, frac=floor / dt,
                         peak_gb=mem / 1e9, temp_gb=m3[0] / 1e9,
                         arg_gb=m3[1] / 1e9)
        print(f"{name:8s} {dt*1e3:8.2f} {by/1e9:8.2f} {fl/1e9:9.1f} "
              f"{floor*1e3:9.2f} {floor/dt:6.3f} {mem/1e9:7.2f} "
              f"{m3[0]/1e9:7.2f} {m3[1]/1e9:6.2f}")
    print(f"front+back = {(out['front']['ms']+out['back']['ms']):.2f} ms "
          f"vs full {out['full']['ms']:.2f} ms "
          f"(img/s full: {imgs/dt_full:.1f})")

    if trace_dir:
        with jax.profiler.trace(f"{trace_dir}/b{batch}"):
            for i in range(3):
                o = full(sd, store, ptens, jax.random.PRNGKey(3 + i))
                float(o[1])
        print(f"trace written to {trace_dir}/b{batch}")
    return out


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", type=int, nargs="+", default=[8, 16, 32])
    ap.add_argument("--remat", action="store_true",
                    help="also measure the back half under jax.checkpoint")
    ap.add_argument("--trace", default=None,
                    help="directory to write jax profiler traces into")
    ap.add_argument("--micro", type=int, nargs="*", default=[],
                    help="also measure the back half microbatched into N "
                         "sequential grad-accum slices (memory-pressure "
                         "mitigation probe)")
    ap.add_argument("--copt", action="append", default=[],
                    help="compiler_options override key=value for an extra "
                         "full-epoch compile (repeatable)")
    a = ap.parse_args()
    res = {}
    for b in a.batches:
        res[str(b)] = run_probe(b, a.trace, a.remat, tuple(a.micro),
                                _parse_copts(a.copt))
    print(json.dumps(res))
