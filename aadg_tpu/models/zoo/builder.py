"""Config-name -> zoo segmentor factories.

The functional replacement for mmseg's registry/builder machinery
(`/root/reference/models/mmseg/models/builder.py`): plain dictionaries
from names to constructors, so ``MODEL.NAME: pspnet`` +
``MODEL.BACKBONE: resnet50_v1c`` in a YAML builds the same architecture
family the reference's configs would. Every segmentor obeys the
framework contract ``(x, train) -> (seg_logits, pooled_feature)``.

Compute dtype: zoo models run f32 (unlike the flagship DeepLabV3+, which
threads ``TPU.COMPUTE_DTYPE`` bf16 through its layers). Deliberate: the
zoo's correctness tests are torch-f32 oracles with tight tolerances, and
these architectures are capability surface rather than the benchmarked
hot path. Thread a ``dtype`` through ``zoo/layers.ConvModule`` + the
backbones if a zoo model is ever promoted to a perf path.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp

from .backbones import (CGNet, FastSCNN, HRNet, MobileNetV3, ResNeSt,
                        ResNeXt, ResNetV1c, UNetBackbone)
from .heads import (ASPPHead, DepthwiseSeparableASPPHead,
                    DepthwiseSeparableFCNHead, FCNHead, FPNHead, LRASPPHead,
                    PSPHead, UPerHead)
from .attention_heads import (ANNHead, APCHead, CCHead, DAHead, DMHead,
                              DNLHead, EMAHead, EncHead, GCHead, NLHead,
                              OCRHead, PSAHead)
from .necks import FPN
from .point_head import PointHead
from .segmentor import (CascadeEncoderDecoder, EncoderDecoder,
                        PointRendSegmentor)


def build_backbone(name: str, axis_name: Optional[str] = None):
    """Returns (backbone module, last-stage feature channels)."""
    table = {
        "resnet50_v1c": (lambda: ResNetV1c(50, axis_name=axis_name), 2048),
        "resnet101_v1c": (lambda: ResNetV1c(101, axis_name=axis_name), 2048),
        "resnext50": (lambda: ResNeXt(50, axis_name=axis_name), 2048),
        "resnext101": (lambda: ResNeXt(101, axis_name=axis_name), 2048),
        "resnest50": (lambda: ResNeSt(50, axis_name=axis_name), 2048),
        "resnest101": (lambda: ResNeSt(101, axis_name=axis_name), 2048),
        "hrnet_w18": (lambda: HRNet(18, axis_name=axis_name), 144),
        "hrnet_w32": (lambda: HRNet(32, axis_name=axis_name), 256),
        "hrnet_w48": (lambda: HRNet(48, axis_name=axis_name), 384),
        "mobilenet_v3_large": (
            lambda: MobileNetV3("large", axis_name=axis_name), 160),
        "mobilenet_v3_small": (
            lambda: MobileNetV3("small", axis_name=axis_name), 96),
        "fast_scnn": (lambda: FastSCNN(axis_name=axis_name), 128),
        "cgnet": (lambda: CGNet(axis_name=axis_name), 256),
        # mmseg's *_unet_s5-d16 config family
        "unet_s5_d16": (lambda: UNetBackbone(axis_name=axis_name), 64),
    }
    fn, ch = table[name]
    return fn(), ch


# arch name -> decode-head constructor (mmseg config-family defaults)
def _head(arch: str, num_classes: int, axis_name):
    k = dict(num_classes=num_classes, axis_name=axis_name)
    table = {
        "fcn": lambda: FCNHead(channels=512, **k),
        "pspnet": lambda: PSPHead(channels=512, **k),
        "deeplabv3": lambda: ASPPHead(channels=512, **k),
        "deeplabv3plus": lambda: DepthwiseSeparableASPPHead(
            channels=512, **k),
        "upernet": lambda: UPerHead(channels=512, **k),
        "sem_fpn": lambda: FPNHead(channels=128, **k),
        "lraspp": lambda: LRASPPHead(channels=128, **k),
        "nonlocal_net": lambda: NLHead(channels=512, **k),
        "gcnet": lambda: GCHead(channels=512, **k),
        "dnlnet": lambda: DNLHead(channels=512, **k),
        "ccnet": lambda: CCHead(channels=512, **k),
        "annnet": lambda: ANNHead(channels=512, **k),
        "apcnet": lambda: APCHead(channels=512, **k),
        "dmnet": lambda: DMHead(channels=512, **k),
        "emanet": lambda: EMAHead(channels=256, **k),
        "danet": lambda: DAHead(channels=512, **k),
        "psanet": lambda: PSAHead(channels=512, **k),
        "encnet": lambda: EncHead(channels=512, **k),
        "fast_scnn": lambda: DepthwiseSeparableFCNHead(
            channels=128, in_index=2, **k),
    }
    return table[arch]()


ZOO_ARCHS = ("fcn", "pspnet", "deeplabv3", "deeplabv3plus", "upernet",
             "sem_fpn", "lraspp", "nonlocal_net", "gcnet", "dnlnet",
             "ccnet", "annnet", "apcnet", "dmnet", "emanet", "danet",
             "psanet", "encnet", "ocrnet", "fast_scnn", "pointrend")


def _hrnet_wire(head):
    """mmseg's HRNet configs (fcn_hr18, ocrnet_hr18, ...) feed heads the
    stride-4 ``resize_concat`` of all four branches, not the coarsest one.
    Applied to single-input heads (int ``in_index``); multi-scale heads
    (FPN/LRASPP/UPer) consume the branch list natively."""
    if isinstance(getattr(head, "in_index", None), int) and \
            hasattr(head, "input_transform"):
        return head.clone(in_index=(0, 1, 2, 3),
                          input_transform="resize_concat")
    return head


def _backbone_strides(bb, size: int = 64):
    """Probe the backbone's true output strides with ``jax.eval_shape``
    (zero FLOPs): dilated families (OS8 ResNetV1c -> (4, 8, 8, 8)) and
    3-output backbones (MobileNetV3) differ from the (4, 8, 16, 32)
    default, and FPNHead's conv-chain depth is static configuration
    keyed on the true strides (`fpn_head.py:19-37`)."""
    import jax

    shapes = jax.eval_shape(
        lambda k, x: bb.init_with_output(k, x, train=False)[0],
        jax.random.PRNGKey(0),
        jax.ShapeDtypeStruct((1, size, size, 3), jnp.float32))
    return tuple(size // max(1, s.shape[1]) for s in shapes)


def _fpn_strides(bb, num_outs: int):
    """Strides of the FPN neck's outputs: the backbone's, extended by
    stride-2 max-pool levels up to ``num_outs`` (`necks/fpn.py`)."""
    strides = list(_backbone_strides(bb))
    while len(strides) < num_outs:
        strides.append(strides[-1] * 2)
    return tuple(strides[:num_outs])


def _unet_wire(head):
    """mmseg's UNet configs (fcn/pspnet/deeplabv3_unet_s5-d16) read the
    full-resolution decoder output: ``in_index=4`` of the 5 dec_outs."""
    if isinstance(getattr(head, "in_index", None), int) and \
            hasattr(head, "input_transform"):
        return head.clone(in_index=4)
    return head


def build_segmentor(arch: str, backbone: str, num_classes: int,
                    axis_name: Optional[str] = None):
    """Returns (EncoderDecoder module, pooled-feature channels)."""
    bb, feat_ch = build_backbone(backbone, axis_name)
    hrnet = backbone.startswith("hrnet")
    unet = backbone.startswith("unet")
    neck = None
    if arch == "sem_fpn":
        neck = FPN(out_channels=256, num_outs=4, axis_name=axis_name)
        feat_ch = 256
        head = _head(arch, num_classes, axis_name).clone(
            feature_strides=_fpn_strides(bb, 4))
        model = EncoderDecoder(backbone=bb, neck=neck, decode_head=head,
                               feat_ch=feat_ch)
        return model, feat_ch
    if arch == "pointrend":
        # mmseg pointrend_r50/r101: FPN base, FPNHead coarse logits,
        # PointHead refinement (fine-grained feats = FPN level 0)
        neck = FPN(out_channels=256, num_outs=4, axis_name=axis_name)
        feat_ch = 256
        coarse = FPNHead(num_classes=num_classes, channels=128,
                         feature_strides=_fpn_strides(bb, 4),
                         axis_name=axis_name)
        point = PointHead(num_classes=num_classes, channels=256,
                          num_fcs=3, in_index=(0,))
        model = PointRendSegmentor(
            backbone=bb, neck=neck, decode_head=coarse, point_head=point,
            feat_ch=feat_ch)
        return model, feat_ch
    if arch == "ocrnet":
        # cascade: FCN first, OCR refiner (mmseg ocrnet configs)
        fcn = FCNHead(num_classes=num_classes, channels=512,
                      num_convs=1, concat_input=False, axis_name=axis_name)
        ocr = OCRHead(num_classes=num_classes, channels=512,
                      ocr_channels=256, axis_name=axis_name)
        if hrnet:
            fcn, ocr = _hrnet_wire(fcn), _hrnet_wire(ocr)
        if unet:
            fcn, ocr = _unet_wire(fcn), _unet_wire(ocr)
        model = CascadeEncoderDecoder(
            backbone=bb, decode_head=fcn, cascade_heads=(ocr,),
            feat_ch=feat_ch)
        return model, feat_ch
    head = _head(arch, num_classes, axis_name)
    if hrnet:
        head = _hrnet_wire(head)
    if unet:
        head = _unet_wire(head)
    model = EncoderDecoder(backbone=bb, neck=neck, decode_head=head,
                           feat_ch=feat_ch)
    return model, feat_ch
