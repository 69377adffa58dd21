"""TPU-native segmentation model zoo.

Capability match for the reference's vendored mmsegmentation v0.11.0
subtree (`/root/reference/models/mmseg/**`, SURVEY.md §2.2): backbones,
decode heads, necks, segmentors (whole/slide inference), losses and eval
metrics — re-designed for JAX/XLA (NHWC, flax modules, pure functions)
rather than translated from the torch registry machinery. The mmcv
Registry/builder layer becomes plain factory functions; `nn.Module`
inheritance trees become flax modules sharing small helper modules.
"""

from .losses import (accuracy, binary_cross_entropy, cross_entropy,
                     lovasz_hinge, lovasz_softmax)
from .layers import (ConvModule, DepthwiseSeparableConvModule,
                     adaptive_avg_pool, resize, transform_inputs)
from .heads import (ASPPHead, ClsSeg, DepthwiseSeparableASPPHead,
                    DepthwiseSeparableFCNHead, FCNHead, FPNHead, LRASPPHead,
                    PSPHead, UPerHead)
from .attention_heads import (ACM, ANNHead, APCHead, CCHead,
                              CrissCrossAttention, DAHead, DCM, DMHead,
                              DNLHead, EMAHead, EncHead, GCHead, NLHead,
                              OCRHead, PSAHead, SelfAttentionBlock,
                              encode_onehot_labels)
from .point_head import (PointHead, calculate_uncertainty, get_points_test,
                         get_points_train, point_rend_refine, point_sample,
                         point_sample_labels)
from .backbones import (CGNet, FastSCNN, HRNet, MobileNetV3, ResNeSt,
                        ResNeXt, ResNetV1c, UNetBackbone)
from .necks import FPN
from .sampler import ohem_weights
from .segmentor import (CascadeEncoderDecoder, EncoderDecoder,
                        PointRendSegmentor, segmentor_slide_inference,
                        whole_inference)
from .api import (aug_test_segmentor, inference_segmentor,
                  init_segmentor, save_segmentor, show_result)
from .train_api import evaluate_segmentor, train_segmentor

__all__ = [
    "accuracy", "binary_cross_entropy", "cross_entropy", "lovasz_hinge",
    "lovasz_softmax", "ConvModule", "DepthwiseSeparableConvModule",
    "adaptive_avg_pool", "resize", "transform_inputs", "ASPPHead", "ClsSeg",
    "DepthwiseSeparableASPPHead", "DepthwiseSeparableFCNHead", "FCNHead",
    "FPNHead", "LRASPPHead", "PSPHead", "UPerHead", "FPN",
    "CascadeEncoderDecoder", "EncoderDecoder", "segmentor_slide_inference",
    "whole_inference", "ACM", "ANNHead", "APCHead", "CCHead",
    "CrissCrossAttention", "DAHead", "DCM", "DMHead", "DNLHead", "EMAHead",
    "EncHead", "GCHead", "NLHead", "OCRHead", "PSAHead",
    "SelfAttentionBlock", "encode_onehot_labels", "PointHead",
    "calculate_uncertainty", "get_points_test", "get_points_train",
    "point_rend_refine", "point_sample", "point_sample_labels",
    "PointRendSegmentor", "CGNet", "FastSCNN", "HRNet",
    "MobileNetV3", "ResNeSt", "ResNeXt", "ResNetV1c", "UNetBackbone",
    "ohem_weights", "aug_test_segmentor", "inference_segmentor", "init_segmentor",
    "save_segmentor", "show_result", "train_segmentor",
    "evaluate_segmentor",
]
