"""Configuration system: a small, dependency-free yacs-compatible CfgNode.

The reference uses yacs (`/root/reference/config/defaults.py:5-73`); yacs is not
available in this image, so we provide a compatible subset (attribute access,
``merge_from_file``, ``merge_from_list``, ``freeze``/``defrost``, ``clone``)
plus the same default tree so the reference's ``experiments/*.yaml`` files load
unchanged.
"""

from __future__ import annotations

import copy
from typing import Any, Dict, List

import yaml


class CfgNode(dict):
    """A dict subclass with attribute access and freeze semantics (yacs-like)."""

    _FROZEN = "__frozen__"

    def __init__(self, init_dict: Dict[str, Any] | None = None):
        super().__init__()
        object.__setattr__(self, CfgNode._FROZEN, False)
        if init_dict:
            for k, v in init_dict.items():
                self[k] = CfgNode(v) if isinstance(v, dict) else v

    # -- attribute access -------------------------------------------------
    def __getattr__(self, name: str) -> Any:
        try:
            return self[name]
        except KeyError:
            raise AttributeError(name)

    def __setattr__(self, name: str, value: Any) -> None:
        if self.is_frozen():
            raise AttributeError(
                f"Attempted to set {name} on a frozen CfgNode")
        self[name] = value

    def __setitem__(self, name: str, value: Any) -> None:
        if self.is_frozen():
            raise AttributeError(
                f"Attempted to set {name} on a frozen CfgNode")
        super().__setitem__(name, value)

    # -- freeze ------------------------------------------------------------
    def is_frozen(self) -> bool:
        return object.__getattribute__(self, CfgNode._FROZEN)

    def _set_frozen(self, frozen: bool) -> None:
        object.__setattr__(self, CfgNode._FROZEN, frozen)
        for v in self.values():
            if isinstance(v, CfgNode):
                v._set_frozen(frozen)

    def freeze(self) -> None:
        self._set_frozen(True)

    def defrost(self) -> None:
        self._set_frozen(False)

    def clone(self) -> "CfgNode":
        frozen = self.is_frozen()
        self._set_frozen(False)
        node = copy.deepcopy(self)
        self._set_frozen(frozen)
        node._set_frozen(False)
        return node

    # -- merging -----------------------------------------------------------
    def merge_from_other_cfg(self, other: "CfgNode") -> None:
        _merge_into(other, self)

    def merge_from_file(self, path: str) -> None:
        with open(path) as f:
            loaded = yaml.safe_load(f) or {}
        _merge_into(CfgNode(loaded), self)

    def merge_from_list(self, opts: List[Any]) -> None:
        assert len(opts) % 2 == 0, "Override list must be key, value pairs"
        for key, value in zip(opts[0::2], opts[1::2]):
            node = self
            parts = key.split(".")
            for p in parts[:-1]:
                node = node[p]
            leaf = parts[-1]
            if leaf not in node:
                raise KeyError(f"Non-existent config key: {key}")
            node[leaf] = _coerce(value, node[leaf])

    def dump(self) -> str:
        return yaml.safe_dump(_to_plain(self), sort_keys=True)

    def __str__(self) -> str:  # pragma: no cover - cosmetic
        return self.dump()


def _to_plain(node: Any) -> Any:
    if isinstance(node, CfgNode):
        return {k: _to_plain(v) for k, v in node.items()}
    return node


def _coerce(value: Any, old: Any) -> Any:
    """Parse a CLI string override to the type of the existing value."""
    if not isinstance(value, str):
        return value
    if isinstance(old, bool):
        return value.lower() in ("1", "true", "yes")
    if isinstance(old, int):
        return int(value)
    if isinstance(old, float):
        return float(value)
    if isinstance(old, (list, tuple)):
        return yaml.safe_load(value)
    return value


def _merge_into(src: Dict[str, Any], dst: CfgNode) -> None:
    for k, v in src.items():
        if k not in dst:
            raise KeyError(f"Non-existent config key: {k}")
        if isinstance(dst[k], CfgNode) and isinstance(v, dict):
            _merge_into(v, dst[k])
        else:
            dst[k] = _coerce(v, dst[k]) if isinstance(v, str) else v


# ---------------------------------------------------------------------------
# Default configuration tree. Schema mirrors the reference yacs defaults
# (`/root/reference/config/defaults.py:8-65`) so reference experiment YAMLs
# load unchanged, plus TPU-specific additions under new keys.
# ---------------------------------------------------------------------------

def default_config() -> CfgNode:
    _C = CfgNode()

    _C.OUTPUT_DIR = "output"
    _C.LOG_DIR = "log"
    _C.PRINT_FREQ = 100
    _C.SEED = 0

    _C.MODEL = CfgNode()
    _C.MODEL.NAME = "deeplabv3+"
    _C.MODEL.BACKBONE = "mobilenet_v2"
    _C.MODEL.PRETRAINED_WEIGHTS = ""
    # stochastic depth for transformer backbones (official SegFormer: 0.1)
    _C.MODEL.DROP_PATH_RATE = 0.0

    _C.CONTROLLER = CfgNode()
    _C.CONTROLLER.NAME = "controller"
    _C.CONTROLLER.LOSS = "ppo"
    _C.CONTROLLER.PENALTY = 0.00001
    _C.CONTROLLER.L = 2
    _C.CONTROLLER.M = 6
    _C.CONTROLLER.T = 2
    _C.CONTROLLER.C = 2.5
    _C.CONTROLLER.NUM_MAGS = 10
    _C.CONTROLLER.EXCLUDE_OPS_NUM = 0
    _C.CONTROLLER.EXCLUDE_OPS = []

    _C.DISCRIMINATOR = CfgNode()
    _C.DISCRIMINATOR.NAME = "momentum_feature"

    _C.DATASET = CfgNode()
    _C.DATASET.ROOT = "./dataset"
    _C.DATASET.NAME = "cifar10"
    _C.DATASET.TRAINSET = ""
    _C.DATASET.TESTSET = ""
    _C.DATASET.DG = CfgNode()
    _C.DATASET.DG.TRAIN = [1, 2, 3]
    _C.DATASET.DG.TEST = [4]

    _C.TRAIN = CfgNode()
    _C.TRAIN.LR = 0.1
    _C.TRAIN.WD = 0.0004
    _C.TRAIN.BEGIN_EPOCH = 0
    _C.TRAIN.WARMUP_EPOCH = 0
    _C.TRAIN.END_EPOCH = 200
    _C.TRAIN.BATCH_SIZE = 8
    _C.TRAIN.SHUFFLE = True

    _C.TEST = CfgNode()
    _C.TEST.BATCH_SIZE = 8
    _C.TEST.MODEL_DIR = ""

    # ------------------------------------------------------------------
    # TPU-native additions (no reference equivalent). These do not clash
    # with reference YAML keys.
    # ------------------------------------------------------------------
    _C.TPU = CfgNode()
    # Data-parallel mesh size; -1 = all visible devices.
    _C.TPU.DATA_PARALLEL = -1
    # Compute dtype for model matmuls/convs ("bfloat16" or "float32").
    # Params and losses always stay f32.
    _C.TPU.COMPUTE_DTYPE = "bfloat16"
    # Steps per epoch for the domain-balanced random sampler. 0 = derive
    # from dataset size (reference semantics: max domain pool size / batch;
    # rvs multiplies by 3, see /root/reference/data/vessel.py:89-96).
    _C.TPU.STEPS_PER_EPOCH = 0
    # Fuse the whole training epoch into one lax.scan program (faster);
    # False runs one jitted step per python iteration (easier debugging).
    _C.TPU.SCAN_EPOCH = True
    # Use the Pallas tiled Sinkhorn kernel when point clouds are large
    # enough to profit; pure-jnp log-domain Sinkhorn otherwise.
    _C.TPU.PALLAS_SINKHORN = True
    # Sinkhorn hyperparameters (match geomloss SamplesLoss defaults:
    # blur=0.05, scaling=0.5, debias=True; cost = 1 - cosine).
    _C.TPU.SINKHORN = CfgNode()
    _C.TPU.SINKHORN.BLUR = 0.05
    _C.TPU.SINKHORN.SCALING = 0.5
    _C.TPU.SINKHORN.DEBIAS = True
    # Image side length of the training crop (256 in the reference optic
    # pipeline, /root/reference/data/transform.py:285).
    _C.TPU.CROP_SIZE = 256
    # Side length of the hermetic synthetic datasets (tests use 64;
    # flagship-scale smoke runs set 256/512).
    _C.TPU.SYNTHETIC_SIZE = 64
    # Checkpoint every N epochs (reference saved every epoch post-warmup).
    _C.TPU.CHECKPOINT_FREQ = 1
    # Resume from latest checkpoint in OUTPUT_DIR when present.
    _C.TPU.AUTO_RESUME = False
    # train mode: with probability 0.5 per step, train on a
    # policy-augmented batch instead of the raw batch (the reference's
    # dormant `autoaugment` flag, train_dg_2d.py:39-44). Policies come
    # from the controller checkpoint in TEST.MODEL_DIR when present,
    # otherwise are sampled from a fresh controller.
    _C.TPU.AUTOAUGMENT = False
    # Write a jax profiler trace of one epoch to <run_dir>/profile/.
    _C.TPU.PROFILE = False
    # Per-block activation checkpointing in the flagship encoder
    # (models/mobilenetv2.py): cuts peak HBM for large-batch envelopes at
    # ~1/3 extra forward FLOPs. Numerics and param tree unchanged. Keep
    # False at the reference batch — the step is bandwidth-bound there and
    # remat only adds traffic (measured, RESULTS.md round 4).
    _C.TPU.REMAT = False
    # Path to a converted pretrained-encoder msgpack (written by
    # tools/convert_torch_weights.py); grafted into the model's params at
    # init (utils/pretrained.py). "" = random init. Optionally
    # "file.msgpack::sub/tree" to pin the graft point. Mirrors the
    # reference's ImageNet encoder init (models/__init__.py:19).
    _C.TPU.PRETRAINED = ""

    return _C


def load_config(cfg_file: str | None = None,
                opts: List[Any] | None = None) -> CfgNode:
    cfg = default_config()
    if cfg_file:
        cfg.merge_from_file(cfg_file)
    if opts:
        cfg.merge_from_list(opts)
    return cfg


def update_config(cfg: CfgNode, args) -> None:
    """Reference-compatible entry (`config/defaults.py:68-73`)."""
    cfg.defrost()
    cfg.merge_from_file(args.cfg)
    cfg.OUTPUT_DIR = args.output_dir
    cfg.SEED = args.seed
    cfg.freeze()
