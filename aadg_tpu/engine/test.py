"""Test / inference / visualization mode (re-design of
`/root/reference/test.py:23-202`).

- ``output_type='seg'``: load the trained model, save thresholded
  segmentation maps (0.5 rvs / 0.75 optic) as JPGs plus a per-image F1 CSV
  (`test.py:23-91`).
- ``output_type='image'``: load the trained controller, sample 4 policies,
  apply them on-device to training images and dump the augmented images
  (`test.py:94-107`).
"""

from __future__ import annotations

import os
from functools import partial
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from .. import utils
from .. import metrics as M
from ..data.datasets import build_dataset, load_train_arrays, load_test_arrays
from ..data.stores import make_train_store, make_test_store
from ..data.transforms import optic_mask_to_multilabel, vessel_mask_to_binary
from ..models import controller as ctrl_mod
from .evaluate import make_eval_forward
from .state import build_entities, init_state


def _load_model_state(ent, sd, model_dir: str, logger=print):
    """Try model_best -> final_model_state -> final_state (the reference's
    fallback chain, `test.py:153-173`)."""
    for name in ("model_best.msgpack", "final_model_state.msgpack",
                 "final_state.msgpack"):
        path = os.path.join(model_dir, name)
        if os.path.exists(path):
            raw = utils.load_checkpoint(path)
            if "sd" in raw:  # full checkpoint
                restored = utils.load_checkpoint(
                    path, {"sd": sd, "epoch": 0, "best_dsc": 0.0})
                logger(f"Successfully loaded: {path}")
                return restored["sd"]
            target = {"params": sd.seg_params, "batch_stats": sd.seg_stats}
            restored = utils.load_checkpoint(path, target)
            logger(f"Successfully loaded: {path}")
            return sd._replace(seg_params=restored["params"],
                               seg_stats=restored["batch_stats"])
    raise FileNotFoundError(f"no model checkpoint under {model_dir}")


def run_test(cfg, cfg_path: str, vis_dir: str = "vis",
             output_type: str = "seg", seed: int = 1023):
    import imageio
    import pandas as pd

    out_dir = Path(vis_dir)
    out_dir.mkdir(parents=True, exist_ok=True)

    ent = build_entities(cfg, "train", steps_per_epoch=1)
    sd, cs = init_state(ent, jax.random.PRNGKey(cfg.SEED))
    if cfg.TEST.MODEL_DIR:
        sd = _load_model_state(ent, sd, cfg.TEST.MODEL_DIR)

    if output_type == "seg":
        test_ds = build_dataset(cfg, "test")
        imgs, labels, rois, names = load_test_arrays(test_ds)
        store = make_test_store(imgs, labels, rois, names,
                                batch_size=cfg.TEST.BATCH_SIZE)
        fwd = make_eval_forward(ent)
        threshold = 0.75 if ent.dataset_name == "optic" else 0.5
        if ent.dataset_name == "optic":
            output = {"name": [], "f1_score_avg": [], "f1_score_disc": [],
                      "f1_score_cup": []}
        else:
            output = {"name": [], "f1_score": []}
        bs = cfg.TEST.BATCH_SIZE
        n = len(names)
        for lo in range(0, n, bs):
            hi = min(lo + bs, n)
            soft = np.asarray(fwd(sd.seg_params, sd.seg_stats,
                                  store.images[lo:lo + bs]))[:hi - lo]
            hard = (soft > threshold).astype(np.float32)
            if ent.dataset_name == "optic":
                y = np.asarray(optic_mask_to_multilabel(
                    store.labels[lo:lo + bs].astype(jnp.float32)))[:hi - lo]
            else:
                y = np.asarray(vessel_mask_to_binary(
                    store.labels[lo:lo + bs].astype(jnp.float32)))[:hi - lo]
            for j in range(hi - lo):
                name = names[lo + j]
                if ent.dataset_name == "optic":
                    cup = float(M.samplewise_f1(
                        jnp.asarray(hard[j:j+1, ..., 0]),
                        jnp.asarray(y[j:j+1, ..., 0]))[1])
                    disc = float(M.samplewise_f1(
                        jnp.asarray(hard[j:j+1, ..., 1]),
                        jnp.asarray(y[j:j+1, ..., 1]))[1])
                    # composite map: disc=0.5, cup=1.0 (`test.py:84-86`)
                    seg_map = np.where(hard[j, ..., 1] == 1, 0.5, 0.0)
                    seg_map = np.where(hard[j, ..., 0] == 1, 1.0, seg_map)
                    imageio.imsave(
                        out_dir / (name[:-3] + "jpg"),
                        (seg_map * 255).astype(np.uint8))
                    output["name"].append(name)
                    output["f1_score_cup"].append(cup)
                    output["f1_score_disc"].append(disc)
                    output["f1_score_avg"].append((cup + disc) / 2)
                else:
                    f1 = float(M.samplewise_f1(
                        jnp.asarray(hard[j:j+1, ..., 0]),
                        jnp.asarray(y[j:j+1, ..., 0]))[1])
                    imageio.imsave(
                        out_dir / (name[:-3] + "jpg"),
                        (hard[j, ..., 0] * 255).astype(np.uint8))
                    output["name"].append(name)
                    output["f1_score"].append(f1)
        pd.DataFrame.from_dict(output).to_csv(
            out_dir / "test_result.csv", index=False)
        return output

    # output_type == 'image': dump controller-augmented training images
    if cfg.TEST.MODEL_DIR:
        path = os.path.join(cfg.TEST.MODEL_DIR,
                            "final_controller_state.msgpack")
        if os.path.exists(path):
            restored = utils.load_checkpoint(path, {"params": cs.params})
            cs = cs._replace(params=restored["params"])
    train_ds = build_dataset(cfg, "train")
    imgs, labels, counts = load_train_arrays(train_ds)
    n_vis = 4
    policies, *_ = ctrl_mod.sample(cs.params, ent.ctrl_spec,
                                   jax.random.PRNGKey(seed), n_vis)
    ptens = ctrl_mod.policies_to_tensor(policies, ent.ctrl_spec)
    flat_imgs = jnp.asarray(
        imgs.reshape((-1,) + imgs.shape[2:])[:8], jnp.float32)
    flat_masks = jnp.asarray(
        labels.reshape((-1,) + labels.shape[2:])[:8], jnp.float32)
    aug_i, _ = ent.multi_policy(flat_imgs, flat_masks, ptens,
                                jax.random.PRNGKey(seed + 1))
    aug_np = np.asarray(aug_i).astype(np.uint8)
    for j in range(aug_np.shape[0]):
        for k in range(n_vis):
            imageio.imsave(out_dir / f"sample{j}_{k}.jpg", aug_np[j, k])
    return {"n_images": int(aug_np.shape[0] * n_vis)}
