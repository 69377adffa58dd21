"""Zoo segmentor inference + training throughput on the real TPU.

Serving-oriented companion to the headline ``bench.py``: batched
whole-image eval-mode forward (argmax label maps) for representative zoo
architectures, timed inside one ``lax.scan`` program with a forced host
readback (`CLAUDE.md` #3 — ``block_until_ready`` is unreliable on the
remote-attached backend).

``--train`` benches the TRAINING step instead (VERDICT r3 #6): full
fwd/bwd + optimizer update at the mmseg recipe for each config — SGD
momentum 0.9 / wd 5e-4 / poly(0.9) for the CNN family with the recipe's
auxiliary FCN head (`mmseg/configs/_base_/models/*r50*.py`), AdamW
6e-5 / wd 0.01 / poly(1.0) for SegFormer — same scan+readback protocol,
plus single-step XLA cost analysis (MFU / HBM fraction).

Usage: ``python tools/bench_zoo.py [--train] [--size 512] [--batch 8]``.
Prints one JSON line per (arch, backbone) pair.
"""

import argparse
import json
import sys
import time

sys.path.insert(0, ".")

PAIRS = (
    ("fcn", "resnet50_v1c"),
    ("pspnet", "resnet50_v1c"),
    ("deeplabv3plus", "resnet50_v1c"),
    ("ocrnet", "hrnet_w18"),
    ("lraspp", "mobilenet_v3_large"),
    ("fcn", "unet_s5_d16"),
)

# (name, aux head recipe?, optimizer dict, lr_config dict) — the mmseg
# training recipes for the train bench (`apis/train.py:71-90` consumes
# these from cfg.optimizer/cfg.lr_config)
# the published SegFormer AdamW schedule incl. paramwise_cfg custom_keys
# (`configs/segformer/*`: norm decay_mult 0, head lr_mult 10)
_SEGFORMER_OPT = dict(
    type="AdamW", lr=6e-5, betas=(0.9, 0.999), weight_decay=0.01,
    paramwise_cfg=dict(custom_keys={
        "norm": dict(decay_mult=0.0), "head": dict(lr_mult=10.0)}))

TRAIN_RECIPES = (
    ("fcn", "resnet50_v1c", True,
     dict(type="SGD", lr=0.01, momentum=0.9, weight_decay=0.0005),
     dict(policy="poly", power=0.9, min_lr=1e-4)),
    ("deeplabv3plus", "resnet50_v1c", True,
     dict(type="SGD", lr=0.01, momentum=0.9, weight_decay=0.0005),
     dict(policy="poly", power=0.9, min_lr=1e-4)),
    ("ocrnet", "hrnet_w18", False,  # cascade: FCN stage 0.4 + OCR 1.0
     dict(type="SGD", lr=0.01, momentum=0.9, weight_decay=0.0005),
     dict(policy="poly", power=0.9, min_lr=1e-4)),
    ("segformer", "mit_b1", False, _SEGFORMER_OPT,
     dict(policy="poly", power=1.0, min_lr=0.0)),
    ("segformer", "mit_b4", False, _SEGFORMER_OPT,
     dict(policy="poly", power=1.0, min_lr=0.0)),
    ("segformer", "mit_b5", False, _SEGFORMER_OPT,
     dict(policy="poly", power=1.0, min_lr=0.0)),
)


def bench_train(args):
    import jax
    import jax.numpy as jnp
    import optax

    from aadg_tpu.models.zoo.builder import build_segmentor
    from aadg_tpu.models.zoo.heads import FCNHead
    from aadg_tpu.models.zoo.losses import cross_entropy
    from aadg_tpu.models.zoo.train_api import build_optimizer
    from aadg_tpu.models.segformer import SegFormer
    from bench import _program_costs, _peak_flops, _hbm_bw

    n_cls = 19
    key = jax.random.PRNGKey(0)
    x = jax.random.uniform(key, (args.batch, args.size, args.size, 3),
                           jnp.float32)
    y = jax.random.randint(jax.random.PRNGKey(1),
                           (args.batch, args.size, args.size), 0, n_cls)

    for arch, bb, aux, opt_cfg, lr_cfg in TRAIN_RECIPES:
        name = f"{arch}/{bb}"
        if args.only and args.only not in name:
            continue
        if arch == "segformer":
            model = SegFormer(num_classes=n_cls, variant=bb,
                              remat=args.remat)
            has_aux = False
        else:
            model, _ = build_segmentor(arch, bb, num_classes=n_cls)
            if aux:
                # the R50 recipes' deep-supervision FCN aux head
                # (in_index=2, channels=256, num_convs=1)
                model = model.clone(auxiliary_heads=(
                    FCNHead(num_classes=n_cls, channels=256, num_convs=1,
                            concat_input=False, in_index=2),))
            # cascade stages deep-supervise through the same aux tuple
            has_aux = aux or bool(getattr(model, "cascade_heads", ()))

        x_init = jnp.zeros((1, 64, 64, 3), jnp.float32)
        if has_aux:
            variables = jax.jit(lambda k, xi, m=model: m.init(
                k, xi, train=True,
                method=type(m).forward_train))(jax.random.PRNGKey(0),
                                               x_init)
        else:
            variables = jax.jit(lambda k, xi, m=model: m.init(
                k, xi, train=True))(jax.random.PRNGKey(0), x_init)
        params = variables["params"]
        stats = variables.get("batch_stats", {})
        tx, _ = build_optimizer(opt_cfg, lr_cfg, max_iters=1000)
        opt = jax.jit(tx.init)(params)

        def one_step(params, stats, opt, x, y, key, model=model,
                     tx=tx, has_aux=has_aux):
            def loss_fn(p):
                v = {"params": p}
                if stats:
                    v["batch_stats"] = stats
                if has_aux:
                    (logits, _, aux_l), new = model.apply(
                        v, x, train=True, mutable=["batch_stats"],
                        rngs={"dropout": key},
                        method=type(model).forward_train)
                else:
                    (logits, _), new = model.apply(
                        v, x, train=True, mutable=["batch_stats"],
                        rngs={"dropout": key})
                    aux_l = ()
                loss = cross_entropy(logits, y, ignore_index=255)
                for a in aux_l:
                    loss = loss + 0.4 * cross_entropy(a, y,
                                                      ignore_index=255)
                return loss, new.get("batch_stats", {})

            (loss, new_stats), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(params)
            upd, opt2 = tx.update(grads, opt, params)
            return optax.apply_updates(params, upd), new_stats, opt2, loss

        def epoch(params, stats, opt, x, y, key):
            def body(carry, k):
                p, s, o = carry
                p, s, o, loss = one_step(p, s, o, x, y, k)
                return (p, s, o), loss
            (p, s, o), losses = jax.lax.scan(
                body, (params, stats, opt),
                jax.random.split(key, args.iters))
            return jnp.sum(losses)

        run = jax.jit(epoch).lower(params, stats, opt, x, y, key).compile()
        float(run(params, stats, opt, x, y, key))  # warmup
        t0 = time.time()
        float(run(params, stats, opt, x, y, jax.random.PRNGKey(7)))
        dt = (time.time() - t0) / args.iters

        one = jax.jit(one_step).lower(params, stats, opt, x, y,
                                      key).compile()
        flops, nbytes = _program_costs(one)
        dev = jax.devices()[0]
        peak, bw = _peak_flops(dev), _hbm_bw(dev)
        mfu = (flops / dt) / peak if peak and flops else 0.0
        bw_frac = (nbytes / dt) / bw if bw and nbytes else 0.0
        print(json.dumps({
            "model": name, "mode": "train",
            "optimizer": opt_cfg["type"], "aux_head": has_aux,
            "batch": args.batch, "size": args.size,
            "ms_per_step": round(dt * 1e3, 2),
            "img_per_sec": round(args.batch / dt, 1),
            "mfu": round(mfu, 4),
            "hbm_frac": round(bw_frac, 4)}), flush=True)


def main():
    import jax
    import jax.numpy as jnp

    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--dtype", default=None,
                    help="serving compute dtype, e.g. bfloat16 "
                         "(params+inputs cast at the boundary)")
    ap.add_argument("--train", action="store_true",
                    help="bench the training step (mmseg recipes) instead "
                         "of eval-mode serving")
    ap.add_argument("--only", default=None,
                    help="bench only models whose arch/backbone name "
                         "contains this substring")
    ap.add_argument("--remat", action="store_true",
                    help="per-block MiT activation checkpointing for the "
                         "segformer train rows (TPU.REMAT lever)")
    args = ap.parse_args()

    if args.train:
        bench_train(args)
        return

    from aadg_tpu.models.zoo.builder import build_segmentor
    from aadg_tpu.models.segformer import SegFormer

    def models():
        for arch, bb in PAIRS:
            if args.only and args.only not in f"{arch}/{bb}":
                continue
            m, _ = build_segmentor(arch, bb, num_classes=19)
            yield f"{arch}/{bb}", m
        for variant in ("mit_b1", "mit_b4", "mit_b5"):
            if args.only and args.only not in f"segformer/{variant}":
                continue
            yield f"segformer/{variant}", SegFormer(num_classes=19,
                                                    variant=variant)

    x = jnp.zeros((args.batch, args.size, args.size, 3), jnp.float32)
    # init jitted at a small spatial size: conv/BN params are
    # size-independent, and unjitted init at the bench shape keeps every
    # intermediate alive (OOMs a 16 GB chip on R50-OS8 @8x512²)
    x_init = jnp.zeros((1, 64, 64, 3), jnp.float32)
    if args.dtype:
        x = x.astype(args.dtype)
    for name, model in models():
        variables = jax.jit(
            lambda k, xi, m=model: m.init(k, xi, train=False))(
                jax.random.PRNGKey(0), x_init)
        if args.dtype:
            from aadg_tpu.models.zoo.api import cast_variables
            variables = cast_variables(variables, args.dtype)

        @jax.jit
        def run(v, x):
            # the carry must feed the NEXT iteration's input, else the
            # forward is loop-invariant and XLA hoists it out of the scan
            # (measured: length=20 costs the same as length=1)
            def body(c, _):
                logits, _feat = model.apply(
                    v, x + c.astype(x.dtype) * 1e-24, train=False)
                pred = jnp.argmax(logits, axis=-1)
                return jnp.sum(pred), None
            c, _ = jax.lax.scan(body, jnp.int32(0), None,
                                length=args.iters)
            return c

        c = run.lower(variables, x).compile()
        int(c(variables, x))  # warmup
        t0 = time.time()
        int(c(variables, x))  # forced readback
        dt = (time.time() - t0) / args.iters

        # hardware-grounded columns (same machinery as bench.py): cost
        # analysis of a SINGLE forward (a scan body is costed once, so the
        # scanned timing program would undercount by args.iters)
        from bench import _program_costs, _peak_flops, _hbm_bw

        @jax.jit
        def one(v, x):
            logits, _feat = model.apply(v, x, train=False)
            return jnp.argmax(logits, axis=-1)

        flops, nbytes = _program_costs(one.lower(variables, x).compile())
        dev = jax.devices()[0]
        peak, bw = _peak_flops(dev), _hbm_bw(dev)
        mfu = (flops / dt) / peak if peak and flops else 0.0
        bw_frac = (nbytes / dt) / bw if bw and nbytes else 0.0
        print(json.dumps({
            "model": name, "batch": args.batch, "size": args.size,
            "dtype": args.dtype or "float32",
            "ms_per_batch": round(dt * 1e3, 2),
            "img_per_sec": round(args.batch / dt, 1),
            "mfu": round(mfu, 4),
            "hbm_frac": round(bw_frac, 4)}))


if __name__ == "__main__":
    main()
