"""Benchmark: the search-mode hot step on real TPU hardware.

Measures end-to-end augmented-images/sec/chip for the flagship workload —
the reference's per-step load (`BASELINE.md`): batch 8 x 3 domains x M=6
policies = 144 augmented 256x256 images per step through DeepLabV3+
(MobileNetV2), including on-device policy augmentation, scale-crop,
seg+discriminator fwd/bwd+update, and the 3-pairwise-domain Sinkhorn
rewards for all 6 policies. Steps run inside one lax.scan program (exactly
how the production epoch runs) with all data passed as device-resident
arguments; timing forces a host readback (async dispatch on remote TPU
backends makes block_until_ready unreliable).

``vs_baseline``: the reference publishes no throughput numbers
(BASELINE.json "published": {}); the denominator is a documented
engineering estimate of the reference stack's A100 step rate
(~410 img/s: PyTorch DeepLabV3+ fwd/bwd at equivalent load plus PIL
CPU-worker augmentation and pykeops rewards). Treat vs_baseline as
relative-to-estimate, not a measured reference.

``--scenario rvs`` measures the vessel-task load instead: same 144
images/step but augmentation runs at the datasets' native 512² before the
[0.5,2]-scale + 256² crop (`data/transform.py` rvs pipeline).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", "mfu"}.
``mfu`` is hardware-grounded (VERDICT r1 #8): achieved model FLOPs/s of
the compiled step program (XLA cost analysis) divided by the chip's peak
bf16 FLOPs/s — measurable without the estimated A100 denominator. The
flagship step is HBM-bound (BatchNorm stats + bias-wide convs), so its
speed-of-light MFU is well below 1.0; track it release-to-release.
"""

import argparse
import json
import sys
import time

sys.path.insert(0, ".")

REFERENCE_A100_IMG_PER_SEC_ESTIMATE = 410.0

# peak dense bf16 FLOPs/s per chip by device_kind substring (public specs)
_PEAK_BF16 = (
    ("v6", 918e12), ("v5p", 459e12), ("v5", 197e12),  # v5 lite (v5e)
    ("v4", 275e12), ("v3", 123e12), ("v2", 45e12),
)

# HBM bandwidth per chip, bytes/s (public specs)
_HBM_BW = (
    ("v6", 1640e9), ("v5p", 2765e9), ("v5", 819e9),   # v5 lite (v5e)
    ("v4", 1228e9), ("v3", 900e9), ("v2", 700e9),
)


def _lookup(device, table) -> float:
    kind = getattr(device, "device_kind", "").lower()
    for key, val in table:
        if key in kind:
            return val
    return 0.0


def _peak_flops(device) -> float:
    return _lookup(device, _PEAK_BF16)


def _hbm_bw(device) -> float:
    return _lookup(device, _HBM_BW)


def _program_costs(compiled):
    """(FLOPs, bytes accessed) of a compiled program per XLA's
    HloCostAnalysis (post-optimization HLO: fusions are costed as fused
    ops, so 'bytes accessed' approximates real HBM traffic)."""
    try:
        ca = compiled.cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        return (float(ca.get("flops", 0.0)),
                float(ca.get("bytes accessed", 0.0)))
    except Exception:
        return 0.0, 0.0


def main(scenario: str = "optic", batch: int = 8, remat: bool = False):
    import jax
    import jax.numpy as jnp

    from aadg_tpu.config import load_config
    from aadg_tpu.engine.state import build_entities, init_state
    from aadg_tpu.engine.steps import make_search_step
    from aadg_tpu.models import controller as ctrl_mod
    from aadg_tpu.data.datasets import SyntheticDataset, load_train_arrays
    from aadg_tpu.data.stores import make_train_store, sample_train_batch

    cfg = load_config()
    cfg.DATASET.NAME = f"synthetic_{scenario}"
    cfg.MODEL.NAME = "deeplabv3+"
    cfg.TRAIN.BATCH_SIZE = batch
    cfg.CONTROLLER.M = 6
    cfg.TPU.CROP_SIZE = 256
    cfg.TPU.REMAT = remat

    # reference-shaped data: 3 domains at the task's native resolution
    size = 256 if scenario == "optic" else 512
    ds = SyntheticDataset(scenario, n_domains=3,
                          n_per_domain=16 if scenario == "optic" else 8,
                          size=size)
    store = make_train_store(*load_train_arrays(ds))

    ent = build_entities(cfg, "search", steps_per_epoch=1)
    sd, cs = init_state(ent, jax.random.PRNGKey(0))
    M = int(cfg.CONTROLLER.M)
    step = make_search_step(ent, M)

    n_iters = 20

    @jax.jit
    def epoch(ts, store, ptens, key):
        def body(carry, k):
            kb, ks = jax.random.split(k)
            batch = sample_train_batch(store, kb, cfg.TRAIN.BATCH_SIZE)
            carry, m, r = step(carry, batch, ptens, ks)
            return carry, r
        keys = jax.random.split(key, n_iters)
        ts, rs = jax.lax.scan(body, ts, keys)
        return ts, jnp.sum(rs)

    policies, *_ = ctrl_mod.sample(cs.params, ent.ctrl_spec,
                                   jax.random.PRNGKey(1), M)
    ptens = ctrl_mod.policies_to_tensor(policies, ent.ctrl_spec)

    # warmup / compile
    compiled = epoch.lower(sd, store, ptens,
                           jax.random.PRNGKey(2)).compile()
    sd2, r = compiled(sd, store, ptens, jax.random.PRNGKey(2))
    float(r)
    t0 = time.time()
    sd2, r = compiled(sd, store, ptens, jax.random.PRNGKey(3))
    float(r)  # force full readback
    dt = (time.time() - t0) / n_iters

    imgs_per_step = cfg.TRAIN.BATCH_SIZE * 3 * M  # 144 at the B=8 reference
    value = imgs_per_step / dt

    # MFU + roofline from a SINGLE-step program: XLA's HloCostAnalysis
    # counts a while/scan body once regardless of trip count, so
    # cost-analyzing the scanned epoch would undercount by n_iters. (The
    # Sinkhorn annealing loop inside the step is likewise counted once —
    # negligible next to the conv FLOPs.)
    @jax.jit
    def one_step(ts, store, ptens, key):
        kb, ks = jax.random.split(key)
        batch = sample_train_batch(store, kb, cfg.TRAIN.BATCH_SIZE)
        return step(ts, batch, ptens, ks)

    flops_per_step, bytes_per_step = _program_costs(
        one_step.lower(sd, store, ptens, jax.random.PRNGKey(2)).compile())
    dev = jax.devices()[0]
    peak, bw = _peak_flops(dev), _hbm_bw(dev)
    mfu = (flops_per_step / dt) / peak if peak and flops_per_step else 0.0
    # whole-step roofline: the bandwidth-bound time floor is the compiled
    # step's total HBM traffic over the chip's HBM bandwidth; the
    # compute-bound floor is FLOPs over peak. floor_frac = semantic floor /
    # measured step time, i.e. the fraction of speed-of-light achieved
    # (1.0 = the step takes exactly its roofline time).
    floor = 0.0
    if bw and bytes_per_step:
        floor = max(floor, bytes_per_step / bw)
    if peak and flops_per_step:
        floor = max(floor, flops_per_step / peak)
    floor_frac = floor / dt if floor else 0.0

    prefix = "" if scenario == "optic" else f"{scenario}_"
    suffix = "" if batch == 8 else f"_b{batch}"
    if remat:
        suffix += "_remat"
    print(json.dumps({
        "metric": (f"{prefix}search_step_augmented_images_per_sec_per_chip"
                   f"{suffix}"),
        "value": round(value, 2),
        "unit": "img/s",
        "vs_baseline": round(value / REFERENCE_A100_IMG_PER_SEC_ESTIMATE, 3),
        "mfu": round(mfu, 4),
        "floor_frac": round(floor_frac, 4),
        "batch": batch,
        "step_ms": round(dt * 1e3, 3),
        "step_gbytes": round(bytes_per_step / 1e9, 3),
        "step_gflops": round(flops_per_step / 1e9, 3),
    }))


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--scenario", choices=("optic", "rvs"),
                    default="optic")
    ap.add_argument("--batch", type=int, default=8,
                    help="per-step batch (img load = batch x 3 domains x "
                         "M=6); default 8 = the reference shape")
    ap.add_argument("--remat", action="store_true",
                    help="per-block encoder activation checkpointing "
                         "(TPU.REMAT) — a large-batch peak-memory lever")
    a = ap.parse_args()
    main(a.scenario, a.batch, a.remat)
