"""Search-mode orchestrator (the TPU re-design of
`/root/reference/search_dg.py:289-407` and `search_dg_2d.py:284-405`).

Per epoch: [warmup] pretrain; [search] sample M policies from the LSTM
controller, run the epoch as ONE jitted ``lax.scan`` program (in-graph batch
gather -> on-device augmentation -> seg+dis update -> Sinkhorn reward
accumulation), EMA-update the momentum discriminator, normalize rewards,
PPO/REINFORCE-update the controller, validate, checkpoint.

Policies are tensor inputs to the scanned step — nothing retraces across
epochs (the reference instead mutates the dataset's transform object each
epoch, `search_dg.py:341`).
"""

from __future__ import annotations

import os
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .. import utils
from ..losses import normalize_rewards
from ..models import controller as ctrl_mod
from ..models import momentum_update, synchronize_parameters
from ..data.datasets import build_dataset, load_train_arrays, load_test_arrays
from ..parallel.dp import scan_steps
from ..data.stores import (make_train_store, make_test_store,
                           sample_train_batch)
from .evaluate import validate
from .rl import make_controller_update
from .state import build_entities, init_state
from .steps import make_pretrain_step, make_search_step


def _make_epoch_runners(ent, batch_size, steps, M, cfg):
    """Build jitted whole-epoch scan programs for pretrain and search.

    The data store is an explicit argument (NOT a closure constant): on
    remote-attached TPU backends, closure-captured arrays are embedded as
    program constants and re-shipped on every call — passing the store as
    an arg keeps it device-resident (measured 4x step time difference).
    """
    pre_step = make_pretrain_step(ent)
    srch_step = make_search_step(
        ent, M, sinkhorn_blur=cfg.TPU.SINKHORN.BLUR,
        sinkhorn_scaling=cfg.TPU.SINKHORN.SCALING)

    @jax.jit
    def pretrain_epoch(ts, store, key):
        def body(carry, k):
            kb, ks = jax.random.split(k)
            batch = sample_train_batch(store, kb, batch_size)
            carry, m = pre_step(carry, batch, ks)
            return carry, m
        keys = jax.random.split(key, steps)
        ts, ms = scan_steps(body, ts, keys)
        return ts, jax.tree_util.tree_map(jnp.mean, ms)

    @jax.jit
    def search_epoch(ts, store, policies, key):
        def body(carry, k):
            kb, ks = jax.random.split(k)
            batch = sample_train_batch(store, kb, batch_size)
            carry, m, r = srch_step(carry, batch, policies, ks)
            return carry, (m, r)
        keys = jax.random.split(key, steps)
        ts, (ms, rs) = scan_steps(body, ts, keys)
        # rewards accumulate over the epoch (`search_dg.py:161`), then
        # normalize (`search_dg.py:214`)
        rewards = normalize_rewards(jnp.sum(rs, axis=0))
        return ts, jax.tree_util.tree_map(jnp.mean, ms), rewards

    return pretrain_epoch, search_epoch


def describe_policies(policies: np.ndarray, op_names, spec) -> list:
    """Human-readable parse (the `parse_policies` contract,
    `data/policy.py:64-97`): [[(op_name, mag/(num_mags-1)) x L] x Q] x M."""
    out = []
    for m in range(policies.shape[0]):
        toks = policies[m].reshape(spec.Q, spec.L, 2)
        out.append([[(op_names[int(toks[q, l, 0])],
                      float(toks[q, l, 1]) / (spec.num_mags - 1))
                     for l in range(spec.L)] for q in range(spec.Q)])
    return out


def run_search(cfg, cfg_path: str):
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
    logger.info(f"steps/epoch: {steps}, domains: {store.n_domains}, "
                f"pool sizes: {np.asarray(store.counts)}")

    # data-parallel mesh (reference: DDP batch split, models/__init__.py:37)
    from ..parallel.mesh import resolve_data_parallel
    n_devices = resolve_data_parallel(int(cfg.TPU.DATA_PARALLEL),
                                      int(cfg.TRAIN.BATCH_SIZE))
    use_dp = n_devices > 1
    axis_name = "data" if use_dp else None

    ent = build_entities(cfg, "search", steps_per_epoch=steps,
                         axis_name=axis_name, logger=logger)
    key = jax.random.PRNGKey(cfg.SEED)
    sd, cs = init_state(ent, key, pretrained=cfg.TPU.PRETRAINED,
                        logger=logger)
    M = int(cfg.CONTROLLER.M)

    if use_dp:
        from ..parallel.mesh import make_mesh
        from ..parallel.dp import (make_dp_pretrain_epoch,
                                   make_dp_search_epoch)
        mesh = make_mesh(n_devices)
        global_batch = cfg.TRAIN.BATCH_SIZE
        logger.info(f"data parallel over {n_devices} devices, "
                    f"local batch {global_batch // n_devices}")
        pre_step = make_pretrain_step(ent, axis_name="data",
                                      n_shards=n_devices)
        srch_step = make_search_step(
            ent, M, sinkhorn_blur=cfg.TPU.SINKHORN.BLUR,
            sinkhorn_scaling=cfg.TPU.SINKHORN.SCALING, axis_name="data",
            n_shards=n_devices)
        pretrain_epoch = make_dp_pretrain_epoch(pre_step, mesh,
                                                global_batch, steps)
        search_epoch = make_dp_search_epoch(srch_step, mesh,
                                            global_batch, steps)
    else:
        pretrain_epoch, search_epoch = _make_epoch_runners(
            ent, cfg.TRAIN.BATCH_SIZE, steps, M, cfg)
    ctrl_update = jax.jit(make_controller_update(
        ent, cfg.CONTROLLER.LOSS, cfg.CONTROLLER.PENALTY))
    sample_policies = jax.jit(partial(ctrl_mod.sample, spec=ent.ctrl_spec,
                                      batch_size=M))

    begin_epoch = int(cfg.TRAIN.BEGIN_EPOCH)
    best_dsc = 0.0
    if ent.dataset_name == "optic":
        best_metric = {"epoch": 0, "avg_dsc": 0, "cup_dsc": 0,
                       "disc_dsc": 0, "avg_hd": 0, "cup_hd": 0,
                       "disc_hd": 0}
    else:
        best_metric = {"epoch": 0, "dsc": 0, "acc": 0, "aucroc": 0,
                       "sp": 0, "se": 0}
    mag_traj, op_traj = [], []

    # real resume (the reference's BEGIN_EPOCH never loads state,
    # SURVEY §5.4 — fixed here)
    if cfg.TPU.AUTO_RESUME:
        ckpt = utils.find_resume_checkpoint(out_dir)
        if ckpt:
            target = {"sd": sd, "cs": cs, "epoch": 0, "best_dsc": 0.0,
                      "best_metric": dict(best_metric)}
            restored = utils.load_checkpoint_lenient(ckpt, target)
            if int(restored["epoch"]) >= cfg.TRAIN.END_EPOCH:
                logger.warning(
                    f"auto-resume: {ckpt} is a COMPLETED run "
                    f"(epoch {int(restored['epoch'])} >= END_EPOCH "
                    f"{cfg.TRAIN.END_EPOCH}); starting fresh instead")
            else:
                sd, cs = restored["sd"], restored["cs"]
                begin_epoch = int(restored["epoch"])
                best_dsc = float(restored["best_dsc"])
                best_metric = {k: (v if k == "epoch" else float(v))
                               for k, v in restored["best_metric"].items()}
                logger.info(f"resumed from {ckpt} at epoch {begin_epoch}")

    pre_samples = steps * cfg.TRAIN.BATCH_SIZE * store.n_domains
    srch_samples = pre_samples * M  # augmented images ("Speed" line,
    #                                 `search_dg.py:77,128-141`)
    profiled = False
    for epoch in range(begin_epoch, cfg.TRAIN.END_EPOCH):
        ekey = jax.random.fold_in(key, epoch + 1)
        t0 = time.time()
        ctrl_stats = None
        profile_ctx = None
        if cfg.TPU.PROFILE and not profiled:
            from jax import profiler as _profiler
            profile_ctx = _profiler.trace(
                os.path.join(out_dir, "profile"))
            profile_ctx.__enter__()
        if cfg.TRAIN.WARMUP_EPOCH > epoch:
            sd, ms = pretrain_epoch(sd, store, ekey)
            ms = {k: float(v) for k, v in ms.items()}
            dt = time.time() - t0
            logger.info(
                "Train Epoch {} time:{:.4f} Speed {:.1f} samples/s "
                .format(epoch, dt, pre_samples / dt)
                + " ".join(f"{k}:{v:.4f}" for k, v in ms.items()))
        else:
            if cfg.TRAIN.WARMUP_EPOCH == epoch:
                sd = sd._replace(
                    dis_params=synchronize_parameters(sd.dis_params))
            k_s, k_e = jax.random.split(ekey)
            policies, op_probs, mag_probs, log_probs, entropies = \
                sample_policies(cs.params, key=k_s)
            ptens = ctrl_mod.policies_to_tensor(policies, ent.ctrl_spec)
            sd, ms, rewards = search_epoch(sd, store, ptens, k_e)
            sd = sd._replace(dis_params=momentum_update(sd.dis_params))
            cs, ctrl_stats = ctrl_update(cs, policies, log_probs,
                                         entropies, rewards)
            ms = {k: float(v) for k, v in ms.items()}
            dt = time.time() - t0
            logger.info(
                "Train Epoch {} time:{:.4f} Speed {:.1f} samples/s "
                .format(epoch, dt, srch_samples / dt)
                + " ".join(f"{k}:{v:.4f}" for k, v in ms.items()))
            logger.info("policies: " + str(describe_policies(
                np.asarray(policies), ent.op_names, ent.ctrl_spec)))
            for k, v in ms.items():
                writer.add_scalar(f"train_{k}", v, epoch)

        if profile_ctx is not None:
            jax.block_until_ready(jax.tree_util.tree_leaves(sd.seg_params))
            profile_ctx.__exit__(None, None, None)
            profiled = True
            logger.info(f"profiler trace written to {out_dir}/profile")

        # evaluate every epoch (`search_dg.py:353`)
        vm = validate(ent, sd, test_store, cfg.TEST.BATCH_SIZE)
        if ent.dataset_name == "optic":
            dsc = (vm["cup_dsc"] + vm["disc_dsc"]) / 2
            hd = (vm["cup_hd"] + vm["disc_hd"]) / 2
            logger.info(
                "Test Epoch {} dsc@cup:{cup_dsc:.4f} dsc@disc:{disc_dsc:.4f}"
                " HD@cup:{cup_hd:.4f} HD@disc:{disc_hd:.4f}".format(
                    epoch, **vm))
            current = {"epoch": epoch + 1, "avg_dsc": dsc,
                       "cup_dsc": vm["cup_dsc"], "disc_dsc": vm["disc_dsc"],
                       "avg_hd": hd, "cup_hd": vm["cup_hd"],
                       "disc_hd": vm["disc_hd"]}
        else:
            dsc = vm["dsc"]
            logger.info(
                "Test Epoch {} dsc:{dsc:.4f} acc:{acc:.4f} "
                "aucroc:{aucroc:.4f} sp:{sp:.4f} se:{se:.4f}".format(
                    epoch, **vm))
            current = {"epoch": epoch + 1, **vm}
        for k, v in vm.items():
            writer.add_scalar(f"valid_{k}", v, epoch)

        is_best = dsc > best_dsc
        if is_best:
            best_dsc = max(dsc, best_dsc)
            best_metric = current
        logger.info(f"=> best: {is_best}")

        if cfg.TRAIN.WARMUP_EPOCH <= epoch:
            mag_traj.append(np.asarray(mag_probs))
            op_traj.append(np.asarray(op_probs))
            if ctrl_stats is not None:
                logger.info(
                    "Train Epoch {}: controller loss:{:.4f} score "
                    "loss:{:.4f} entropy penalty:{:.4f}".format(
                        epoch, float(ctrl_stats["controller_loss"]),
                        float(ctrl_stats["score_loss"]),
                        float(ctrl_stats["entropy_penalty"])))
                for k, v in ctrl_stats.items():
                    writer.add_scalar(k, float(v), epoch)

            if (epoch - cfg.TRAIN.WARMUP_EPOCH) % max(
                    1, int(cfg.TPU.CHECKPOINT_FREQ)) == 0:
                utils.save_checkpoint(
                    {"sd": sd, "cs": cs, "epoch": epoch + 1,
                     "best_dsc": best_dsc,
                     "best_metric": dict(best_metric)},
                    is_best, out_dir, f"checkpoint_{epoch}.msgpack",
                    background=True)

    # final artifacts (`search_dg.py:388-407`)
    utils.wait_pending_checkpoints()
    utils.save_checkpoint({"params": sd.seg_params,
                           "batch_stats": sd.seg_stats},
                          False, out_dir, "final_model_state.msgpack",
                          update_latest=False)
    utils.save_checkpoint({"params": cs.params}, False, out_dir,
                          "final_controller_state.msgpack",
                          update_latest=False)
    utils.save_array(np.array(mag_traj),
                     os.path.join(out_dir, "mag_probs_trajectory.npy"))
    utils.save_array(np.array(op_traj),
                     os.path.join(out_dir, "op_probs_trajectory.npy"))
    logger.info("Best: " + str(best_metric))
    utils.save_json(best_metric, os.path.join(out_dir, "final_result.json"))
    writer.close()
    return best_metric, out_dir
