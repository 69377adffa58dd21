"""Zoo segmentor inference throughput on the real TPU.

Serving-oriented companion to the headline ``bench.py``: batched
whole-image eval-mode forward (argmax label maps) for representative zoo
architectures, timed inside one ``lax.scan`` program with a forced host
readback (`CLAUDE.md` #3 — ``block_until_ready`` is unreliable on the
remote-attached backend).

Usage: ``python tools/bench_zoo.py [--size 512] [--batch 8]``.
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
    args = ap.parse_args()

    from aadg_tpu.models.zoo.builder import build_segmentor
    from aadg_tpu.models.segformer import SegFormer

    def models():
        for arch, bb in PAIRS:
            m, _ = build_segmentor(arch, bb, num_classes=19)
            yield f"{arch}/{bb}", m
        yield "segformer/mit_b1", SegFormer(num_classes=19,
                                            variant="mit_b1")

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
