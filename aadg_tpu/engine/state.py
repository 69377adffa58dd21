"""Training entities and state containers.

The reference couples optimizers to loss modules and models to DDP wrappers
(`/root/reference/losses.py:101-112`, `models/__init__.py:27-44`). Here the
split is the idiomatic JAX one: *entities* are static (model definitions,
optax transforms, closures), *state* is a pure pytree (params, batch stats,
optimizer states) that flows through jitted steps and checkpoints as data.

Optimizer semantics match torch (`/root/reference/scheduler.py:5-35`):
torch.Adam's ``weight_decay`` is L2-added-to-gradient (not decoupled), the
model schedule is MultiStepLR(x0.1 at WARMUP_EPOCH) in search and cosine in
plain train; the controller uses Adam(3.5e-4); the discriminator constant
LR (cosine over warmup for the image discriminator).
"""

from __future__ import annotations

import math
from typing import Any, Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax

from ..config import CfgNode
from ..data.transforms import make_train_transform
from ..models import (build_model, build_discriminator, class_parser,
                      channel_parser, domain_parser, spec_from_config,
                      ControllerSpec)
from ..models import controller as ctrl_mod
from ..ops import augment as aug_mod


class SegDisState(NamedTuple):
    seg_params: Any
    seg_stats: Any
    seg_opt: Any
    dis_params: Any
    dis_stats: Any
    dis_opt: Any


class CtrlState(NamedTuple):
    params: Any
    opt: Any


class Entities(NamedTuple):
    model: Any
    disc: Any
    ctrl_spec: ControllerSpec
    model_tx: optax.GradientTransformation
    dis_tx: optax.GradientTransformation
    ctrl_tx: optax.GradientTransformation
    transform: Callable           # (img, mask, key) -> (x, y)
    to_label: Callable            # mask -> label tensor
    multi_policy: Callable        # batched DGMultiPolicy applier
    op_names: list
    n_domains: int
    num_classes: int
    crop: int
    dis_name: str
    dataset_name: str
    feature_dim: int


def torch_adam(lr: Callable | float, wd: float = 0.0
               ) -> optax.GradientTransformation:
    """torch.optim.Adam semantics: L2 weight decay folded into the gradient
    *before* the moment updates (unlike decoupled AdamW)."""
    parts = []
    if wd:
        parts.append(optax.add_decayed_weights(wd))
    parts.append(optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8))
    parts.append(optax.scale_by_learning_rate(lr))
    return optax.chain(*parts)


def multistep_schedule(base_lr: float, milestone_step: int,
                       gamma: float = 0.1) -> Callable:
    """MultiStepLR([WARMUP], gamma) in steps."""
    def schedule(step):
        return base_lr * jnp.where(step >= milestone_step, gamma, 1.0)
    return schedule


def cosine_schedule(base_lr: float, total_steps: int) -> Callable:
    """torch CosineAnnealingLR(T_max=total): eta_min=0."""
    def schedule(step):
        t = jnp.minimum(step, total_steps) / max(total_steps, 1)
        return base_lr * 0.5 * (1.0 + jnp.cos(jnp.pi * t))
    return schedule


def resolve_search_space(cfg: CfgNode, logger=None) -> list:
    """Search-space op names after exclusions.

    EXCLUDE_OPS lists names; EXCLUDE_OPS_NUM randomly removes N ops once at
    startup (the reference does this inside parse_policies, mutating the
    frozen config, `data/policy.py:76-83` — we resolve it once, purely).
    """
    import numpy as np
    names = aug_mod.augment_list()
    if len(cfg.CONTROLLER.EXCLUDE_OPS) > 0:
        names = [n for n in names if n not in cfg.CONTROLLER.EXCLUDE_OPS]
        if logger:
            logger.info(str(list(cfg.CONTROLLER.EXCLUDE_OPS)))
    elif cfg.CONTROLLER.EXCLUDE_OPS_NUM > 0:
        rng = np.random.default_rng(cfg.SEED if cfg.SEED else None)
        for _ in range(cfg.CONTROLLER.EXCLUDE_OPS_NUM):
            removed = names.pop(int(rng.integers(len(names))))
            if logger:
                logger.info(removed)
    return names


def build_entities(cfg: CfgNode, mode: str = "search",
                   steps_per_epoch: int = 1, axis_name: Optional[str] = None,
                   logger=None) -> Entities:
    dataset_name = cfg.DATASET.NAME
    base = "optic" if "optic" in dataset_name else "rvs"
    num_classes = class_parser(base)
    n_domains = domain_parser(base)
    crop = int(cfg.TPU.CROP_SIZE)

    model = build_model(cfg, axis_name=axis_name)
    # pooled-feature width feeding the discriminator: models expose it as
    # a property; zoo EncoderDecoders derive it from the backbone
    feature_dim = getattr(model, "feature_dim", None)
    if feature_dim is None:
        feature_dim = channel_parser(cfg.MODEL.BACKBONE)
    disc = build_discriminator(cfg.DISCRIMINATOR.NAME, n_domains,
                               feature_dim)

    warmup_steps = cfg.TRAIN.WARMUP_EPOCH * steps_per_epoch
    total_steps = cfg.TRAIN.END_EPOCH * steps_per_epoch
    if mode == "search":
        model_sched = multistep_schedule(cfg.TRAIN.LR, warmup_steps, 0.1)
    else:
        model_sched = cosine_schedule(cfg.TRAIN.LR, total_steps)
    model_tx = torch_adam(model_sched, cfg.TRAIN.WD)

    if cfg.TRAIN.WARMUP_EPOCH > 0 and cfg.DISCRIMINATOR.NAME == "image":
        dis_sched = cosine_schedule(cfg.TRAIN.LR, warmup_steps)
    else:
        dis_sched = cfg.TRAIN.LR
    dis_tx = torch_adam(dis_sched)

    ctrl_tx = torch_adam(0.00035)

    transform, to_label = make_train_transform(base, crop)
    op_names = resolve_search_space(cfg, logger)
    spec = spec_from_config(cfg, num_ops=len(op_names))
    multi_policy = aug_mod.make_multi_policy_applier(
        op_names, spec.Q, spec.L, spec.num_mags)

    return Entities(model=model, disc=disc, ctrl_spec=spec,
                    model_tx=model_tx, dis_tx=dis_tx, ctrl_tx=ctrl_tx,
                    transform=transform, to_label=to_label,
                    multi_policy=multi_policy, op_names=op_names,
                    n_domains=n_domains, num_classes=num_classes,
                    crop=crop, dis_name=cfg.DISCRIMINATOR.NAME,
                    dataset_name=base, feature_dim=feature_dim)


def init_state(ent: Entities, key: jax.Array, pretrained: str = "",
               logger=None):
    """Initialize all params/optimizers. Returns (SegDisState, CtrlState).

    ``pretrained``: path to a converted encoder msgpack
    (tools/convert_torch_weights.py) grafted into the model params — the
    reference's ImageNet encoder init (`models/__init__.py:19`).
    """
    k_model, k_dis, k_ctrl = jax.random.split(key, 3)
    dummy = jnp.zeros((1, ent.crop, ent.crop, 3), jnp.float32)
    variables = ent.model.init(k_model, dummy, train=False)
    seg_params = variables["params"]
    seg_stats = variables.get("batch_stats", {})
    if pretrained:
        from ..utils.pretrained import load_pretrained
        seg_params, seg_stats = load_pretrained(
            seg_params, seg_stats, pretrained, logger=logger)

    if ent.dis_name == "image":
        dvars = ent.disc.init(k_dis, dummy, train=False)
    else:
        dvars = ent.disc.init(k_dis, jnp.zeros((1, ent.feature_dim)))
    dis_params = dvars["params"]
    dis_stats = dvars.get("batch_stats", {})

    sd = SegDisState(
        seg_params=seg_params, seg_stats=seg_stats,
        seg_opt=ent.model_tx.init(seg_params),
        dis_params=dis_params, dis_stats=dis_stats,
        dis_opt=ent.dis_tx.init(dis_params))

    ctrl_params = ctrl_mod.init_params(k_ctrl, ent.ctrl_spec)
    cs = CtrlState(params=ctrl_params, opt=ent.ctrl_tx.init(ctrl_params))
    return sd, cs
