"""Plain train-mode orchestrator (fixed-augmentation DG baseline).

Re-design of `/root/reference/train_dg.py:134-204` (optic) and
`train_dg_2d.py:155-226` (rvs): per-epoch seg training on the
domain-balanced raw batches (no controller; the reference never steps the
discriminator here), cosine LR over END_EPOCH, per-epoch validation, best
tracking, ``final_state`` + ``final_result.json``.

The rvs variant's ``autoaugment`` capability (`train_dg_2d.py:39-44`:
use an augmented batch with prob 0.5) is exposed via TRAIN policies when
``cfg.TEST.MODEL_DIR`` carries a searched controller — round-2 wiring;
the flag exists so the config surface matches.
"""

from __future__ import annotations

import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from .. import utils
from ..data.datasets import build_dataset, load_train_arrays, load_test_arrays
from ..parallel.dp import scan_steps
from ..data.stores import (make_train_store, make_test_store,
                           sample_train_batch)
from .evaluate import validate
from .state import build_entities, init_state
from .steps import make_pretrain_step


def run_train(cfg, cfg_path: str):
    logger, out_dir, tb_dir = utils.create_logger(cfg, cfg_path, "train")
    writer = utils.ScalarWriter(tb_dir)
    logger.info(str(cfg))

    train_ds = build_dataset(cfg, "train")
    test_ds = build_dataset(cfg, "test")
    store = make_train_store(*load_train_arrays(train_ds))
    test_store = make_test_store(*load_test_arrays(test_ds),
                                 batch_size=cfg.TEST.BATCH_SIZE)
    length_mult = 3 if cfg.DATASET.NAME == "rvs" else 1
    steps = (int(cfg.TPU.STEPS_PER_EPOCH) or
             store.steps_per_epoch(cfg.TRAIN.BATCH_SIZE, length_mult))

    # data-parallel mesh (reference: DDP wraps all modes,
    # models/__init__.py:37-44 + train_dg.py:134-204)
    from ..parallel.mesh import resolve_data_parallel
    n_devices = resolve_data_parallel(int(cfg.TPU.DATA_PARALLEL),
                                      int(cfg.TRAIN.BATCH_SIZE))
    use_dp = n_devices > 1
    axis_name = "data" if use_dp else None

    ent = build_entities(cfg, "train", steps_per_epoch=steps,
                         axis_name=axis_name, logger=logger)
    key = jax.random.PRNGKey(cfg.SEED)
    sd, cs = init_state(ent, key, pretrained=cfg.TPU.PRETRAINED,
                        logger=logger)

    # the reference's dormant autoaugment capability
    # (`train_dg_2d.py:39-44`): mix policy-augmented batches at p=0.5,
    # policies sampled from the searched controller when available
    autoaug = bool(cfg.TPU.AUTOAUGMENT)
    if autoaug:
        from .steps import make_autoaug_train_step
        from ..models import controller as ctrl_mod
        import os as _os
        ctrl_path = _os.path.join(cfg.TEST.MODEL_DIR or "",
                                  "final_controller_state.msgpack")
        if cfg.TEST.MODEL_DIR and _os.path.exists(ctrl_path):
            restored = utils.load_checkpoint(ctrl_path,
                                             {"params": cs.params})
            cs = cs._replace(params=restored["params"])
            logger.info(f"autoaugment: loaded controller {ctrl_path}")
        step_fn = make_autoaug_train_step(ent, axis_name=axis_name,
                                          n_shards=n_devices)
    else:
        step_fn = make_pretrain_step(ent, axis_name=axis_name,
                                     step_disc=False, n_shards=n_devices)

    if use_dp:
        from ..parallel.mesh import make_mesh
        from ..parallel.dp import (make_dp_autoaug_epoch,
                                   make_dp_pretrain_epoch)
        mesh = make_mesh(n_devices)
        logger.info(f"data parallel over {n_devices} devices, local "
                    f"batch {cfg.TRAIN.BATCH_SIZE // n_devices}")
        if autoaug:
            aa_epoch = make_dp_autoaug_epoch(
                step_fn, mesh, cfg.TRAIN.BATCH_SIZE, steps)
            train_epoch = lambda ts, store, ptens, ekey: \
                aa_epoch(ts, store, ptens, ekey)
        else:
            pre_epoch = make_dp_pretrain_epoch(
                step_fn, mesh, cfg.TRAIN.BATCH_SIZE, steps)
            train_epoch = lambda ts, store, ptens, ekey: \
                pre_epoch(ts, store, ekey)
    else:
        # store passed as an arg, not a closure constant (remote backends
        # re-ship program constants every call)
        @jax.jit
        def train_epoch(ts, store, ptens, ekey):
            def body(carry, k):
                kb, ks = jax.random.split(k)
                batch = sample_train_batch(store, kb, cfg.TRAIN.BATCH_SIZE)
                if autoaug:
                    carry, m = step_fn(carry, batch, ptens, ks)
                else:
                    carry, m = step_fn(carry, batch, ks)
                return carry, m
            keys = jax.random.split(ekey, steps)
            ts, ms = scan_steps(body, ts, keys)
            return ts, jax.tree_util.tree_map(jnp.mean, ms)

    begin_epoch = int(cfg.TRAIN.BEGIN_EPOCH)
    best_dsc = 0.0
    if ent.dataset_name == "optic":
        best_metric = {"epoch": 0, "avg_dsc": 0.0, "cup_dsc": 0.0,
                       "disc_dsc": 0.0}
    else:
        best_metric = {"epoch": 0, "dsc": 0.0, "acc": 0.0, "aucroc": 0.0,
                       "sp": 0.0, "se": 0.0}
    if cfg.TPU.AUTO_RESUME:
        ckpt = utils.find_resume_checkpoint(out_dir)
        if ckpt:
            target = {"sd": sd, "epoch": 0, "best_dsc": 0.0,
                      "best_metric": dict(best_metric)}
            restored = utils.load_checkpoint_lenient(ckpt, target)
            if int(restored["epoch"]) >= cfg.TRAIN.END_EPOCH:
                logger.warning(
                    f"auto-resume: {ckpt} is a COMPLETED run "
                    f"(epoch {int(restored['epoch'])} >= END_EPOCH "
                    f"{cfg.TRAIN.END_EPOCH}); starting fresh instead")
            else:
                sd = restored["sd"]
                begin_epoch = int(restored["epoch"])
                best_dsc = float(restored["best_dsc"])
                best_metric = {k: (v if k == "epoch" else float(v))
                               for k, v in restored["best_metric"].items()}
                logger.info(f"resumed from {ckpt} at epoch {begin_epoch}")

    samples_per_epoch = steps * cfg.TRAIN.BATCH_SIZE * store.n_domains
    for epoch in range(begin_epoch, cfg.TRAIN.END_EPOCH):
        t0 = time.time()
        ekey = jax.random.fold_in(key, epoch + 1)
        if autoaug:
            from ..models import controller as ctrl_mod
            pol, *_ = ctrl_mod.sample(cs.params, ent.ctrl_spec,
                                      jax.random.fold_in(ekey, 7), 1)
            ptens = ctrl_mod.policies_to_tensor(pol, ent.ctrl_spec)
        else:
            ptens = jnp.zeros((1, ent.ctrl_spec.Q, ent.ctrl_spec.L, 2),
                              jnp.int32)
        sd, ms = train_epoch(sd, store, ptens, ekey)
        ms = {k: float(v) for k, v in ms.items()}
        dt = time.time() - t0
        logger.info("Train Epoch {} time:{:.4f} Speed {:.1f} samples/s "
                    .format(epoch, dt, samples_per_epoch / dt)
                    + " ".join(f"{k}:{v:.4f}" for k, v in ms.items()))
        for k, v in ms.items():
            writer.add_scalar(f"train_{k}", v, epoch)

        vm = validate(ent, sd, test_store, cfg.TEST.BATCH_SIZE)
        if ent.dataset_name == "optic":
            dsc = (vm["cup_dsc"] + vm["disc_dsc"]) / 2
            current = {"epoch": epoch + 1, "avg_dsc": dsc,
                       "cup_dsc": vm["cup_dsc"],
                       "disc_dsc": vm["disc_dsc"]}
        else:
            dsc = vm["dsc"]
            current = {"epoch": epoch + 1, **vm}
        logger.info("Test Epoch {} ".format(epoch)
                    + " ".join(f"{k}:{v:.4f}" for k, v in vm.items()))
        for k, v in vm.items():
            writer.add_scalar(f"valid_{k}", v, epoch)

        is_best = dsc > best_dsc
        if is_best:
            best_dsc = max(dsc, best_dsc)
            best_metric = current
        utils.save_checkpoint({"sd": sd, "epoch": epoch + 1,
                               "best_dsc": best_dsc,
                               "best_metric": dict(best_metric)},
                              is_best, out_dir,
                              f"checkpoint_{epoch}.msgpack",
                              background=True)

    utils.wait_pending_checkpoints()
    utils.save_checkpoint({"params": sd.seg_params,
                           "batch_stats": sd.seg_stats},
                          False, out_dir, "final_state.msgpack",
                          update_latest=False)
    logger.info("Best: " + str(best_metric))
    utils.save_json(best_metric, os.path.join(out_dir, "final_result.json"))
    writer.close()
    return best_metric, out_dir
