"""Model factories (the functional analogue of
`/root/reference/models/__init__.py:8-222`).

No DDP wrapping: data parallelism is a property of the *train step*
(shard_map over the mesh, `aadg_tpu/parallel`), not of the model object.
"""

from __future__ import annotations

from .controller import (ControllerSpec, spec_from_config, init_params,
                         sample, evaluate, policies_to_tensor)
from .deeplab import DeepLabV3Plus
from .discriminator import (FeatureDiscriminator, ImageDiscriminator,
                            MomentumFeatureDiscriminator,
                            build_discriminator, momentum_update,
                            synchronize_parameters)
from .unet import UNet
from .classifiers import ResNetCIFAR, WideResNet
from .deeplab_custom import (CustomDeepLab, init_centroids,
                             update_centroids)
from .resnet_backbone import ResNetEncoder


def class_parser(dataset: str) -> int:
    return {"rvs": 1, "optic": 2}[dataset]


def domain_parser(dataset: str) -> int:
    return {"optic": 3, "rvs": 3}[dataset]


def channel_parser(backbone: str) -> int:
    table = {"mobilenet_v2": 1280, "unet": 512,
             "mit_b0": 256, "mit_b1": 512, "mit_b2": 512, "mit_b3": 512}
    if backbone in table:
        return table[backbone]
    from .zoo.builder import build_backbone
    return build_backbone(backbone)[1]


def build_model(cfg, axis_name=None):
    """Build the segmentation model from config. Returns a flax Module
    whose __call__ is ``(x, train) -> (seg_logits, pooled_feature)``."""
    import jax.numpy as jnp
    name = cfg.MODEL.NAME
    base = "optic" if "optic" in cfg.DATASET.NAME else "rvs"
    num_classes = class_parser(base)
    compute_dtype = (jnp.bfloat16 if cfg.TPU.COMPUTE_DTYPE == "bfloat16"
                     else jnp.float32)
    if name == "deeplabv3+":
        assert cfg.MODEL.BACKBONE in ("mobilenet_v2",)
        return DeepLabV3Plus(num_classes=num_classes, axis_name=axis_name,
                             compute_dtype=compute_dtype,
                             remat=bool(cfg.TPU.REMAT))
    if name == "unet":
        return UNet(in_channels=3, out_channels=num_classes,
                    axis_name=axis_name)
    if name == "segformer":
        from .segformer import SegFormer
        return SegFormer(num_classes=num_classes,
                         variant=cfg.MODEL.BACKBONE or "mit_b1",
                         axis_name=axis_name,
                         drop_path_rate=float(cfg.MODEL.DROP_PATH_RATE),
                         remat=bool(cfg.TPU.REMAT))
    from .zoo.builder import ZOO_ARCHS, build_segmentor
    if name in ZOO_ARCHS:
        model, _ = build_segmentor(name, cfg.MODEL.BACKBONE, num_classes,
                                   axis_name=axis_name)
        return model
    raise NotImplementedError(name + " has not been implemented!")


__all__ = [
    "ControllerSpec", "spec_from_config", "init_params", "sample",
    "evaluate", "policies_to_tensor", "DeepLabV3Plus", "UNet",
    "FeatureDiscriminator", "ImageDiscriminator",
    "MomentumFeatureDiscriminator", "build_discriminator",
    "momentum_update", "synchronize_parameters", "build_model",
    "class_parser", "domain_parser", "channel_parser",
    "ResNetCIFAR", "WideResNet", "CustomDeepLab", "init_centroids",
    "update_centroids", "ResNetEncoder",
]
