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

__all__ = [
    "accuracy", "binary_cross_entropy", "cross_entropy", "lovasz_hinge",
    "lovasz_softmax",
]
