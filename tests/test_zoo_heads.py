"""Decode heads / neck / segmentor: shape + init + grad-flow checks on a
tiny synthetic 4-stage pyramid (strides 4,8,16,32)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aadg_tpu.models.zoo import (ASPPHead, DepthwiseSeparableASPPHead,
                                 DepthwiseSeparableFCNHead, FCNHead, FPN,
                                 FPNHead, LRASPPHead, PSPHead, UPerHead,
                                 EncoderDecoder, adaptive_avg_pool,
                                 segmentor_slide_inference)
from flax import linen as nn


def pyramid(b=2, base=16, chans=(8, 16, 24, 32)):
    key = jax.random.PRNGKey(0)
    return [jax.random.normal(jax.random.PRNGKey(i),
                              (b, base // (2 ** i), base // (2 ** i), c))
            for i, c in enumerate(chans)]


HEADS = [
    (FCNHead(num_classes=3, channels=16), (2, 2)),          # on stage -1
    (DepthwiseSeparableFCNHead(num_classes=3, channels=16), (2, 2)),
    (PSPHead(num_classes=3, channels=16, pool_scales=(1, 2)), (2, 2)),
    (ASPPHead(num_classes=3, channels=16, dilations=(1, 2, 4)), (2, 2)),
    (DepthwiseSeparableASPPHead(num_classes=3, channels=16,
                                dilations=(1, 2), c1_channels=8), (16, 16)),
    (UPerHead(num_classes=3, channels=16, pool_scales=(1, 2)), (16, 16)),
    (FPNHead(num_classes=3, channels=16), (16, 16)),
    (LRASPPHead(num_classes=3, channels=16, in_index=(0, 1, 2)), (16, 16)),
]


@pytest.mark.parametrize("head,hw", HEADS,
                         ids=[type(h).__name__ for h, _ in HEADS])
def test_head_shapes_and_grads(head, hw):
    feats = pyramid()
    variables = head.init({"params": jax.random.PRNGKey(0)}, feats,
                          train=False)
    out = head.apply(variables, feats, train=False)
    assert out.shape == (2, hw[0], hw[1], 3)
    assert np.isfinite(np.asarray(out)).all()

    def loss(params):
        o = head.apply({**variables, "params": params}, feats, train=True,
                       rngs={"dropout": jax.random.PRNGKey(1)},
                       mutable=["batch_stats"])[0]
        return jnp.sum(o ** 2)

    g = jax.grad(loss)(variables["params"])
    leaves = jax.tree_util.tree_leaves(g)
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)
    assert any(np.abs(np.asarray(l)).max() > 0 for l in leaves)


def test_fpn_neck_shapes():
    feats = pyramid()
    neck = FPN(out_channels=16, num_outs=5)
    variables = neck.init(jax.random.PRNGKey(0), feats, train=False)
    outs = neck.apply(variables, feats, train=False)
    assert len(outs) == 5
    assert outs[0].shape == (2, 16, 16, 16)
    assert outs[3].shape == (2, 2, 2, 16)
    assert outs[4].shape == (2, 1, 1, 16)


class TinyBackbone(nn.Module):
    @nn.compact
    def __call__(self, x, train=True):
        feats = []
        for i, c in enumerate((8, 16, 24, 32)):
            x = nn.Conv(c, (3, 3), strides=(4, 4) if i == 0 else (2, 2),
                        padding=1)(x)
            feats.append(x)
        return feats


def test_encoder_decoder_whole_and_slide():
    model = EncoderDecoder(
        backbone=TinyBackbone(),
        decode_head=FCNHead(num_classes=3, channels=16, num_convs=1,
                            concat_input=False),
        auxiliary_heads=(FCNHead(num_classes=3, channels=8, num_convs=1,
                                 concat_input=False, in_index=2),))
    x = jnp.zeros((1, 32, 32, 3))
    # init through forward_train so auxiliary-head params are created too
    variables = model.init(jax.random.PRNGKey(0), x, train=False,
                           method=EncoderDecoder.forward_train)
    logits, pooled = model.apply(variables, x, train=False)
    assert logits.shape == (1, 32, 32, 3)
    assert pooled.shape == (1, 32)
    logits2, pooled2, aux = model.apply(
        variables, x, train=False, method=EncoderDecoder.forward_train)
    np.testing.assert_allclose(np.asarray(logits), np.asarray(logits2))
    assert aux[0].shape == (1, 32, 32, 3)

    big = jax.random.normal(jax.random.PRNGKey(2), (1, 48, 48, 3))
    apply_fn = lambda imgs: model.apply(variables, imgs, train=False)
    slid = segmentor_slide_inference(apply_fn, big, (32, 32), (16, 16), 3)
    assert slid.shape == (1, 48, 48, 3)
    assert np.isfinite(np.asarray(slid)).all()


def test_adaptive_avg_pool_matches_torch():
    import torch
    x = np.random.default_rng(0).normal(size=(1, 7, 9, 3)).astype(np.float32)
    ours = adaptive_avg_pool(jnp.asarray(x), (3, 4))
    t = torch.nn.functional.adaptive_avg_pool2d(
        torch.tensor(x).permute(0, 3, 1, 2), (3, 4)).permute(0, 2, 3, 1)
    np.testing.assert_allclose(np.asarray(ours), t.numpy(), rtol=1e-5,
                               atol=1e-6)
