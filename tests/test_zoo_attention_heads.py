"""Attention/context decode heads: shapes, finiteness, special behaviors."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aadg_tpu.models.zoo import (ANNHead, APCHead, CCHead, DAHead, DMHead,
                                 DNLHead, EMAHead, EncHead, GCHead, NLHead,
                                 OCRHead, PSAHead, CascadeEncoderDecoder,
                                 FCNHead, encode_onehot_labels)
from flax import linen as nn


def pyramid(b=2, base=16, chans=(8, 16, 24, 32)):
    return [jax.random.normal(jax.random.PRNGKey(i),
                              (b, base // (2 ** i), base // (2 ** i), c))
            for i, c in enumerate(chans)]


SIMPLE_HEADS = [
    NLHead(num_classes=3, channels=16),
    GCHead(num_classes=3, channels=16),
    DNLHead(num_classes=3, channels=16),
    CCHead(num_classes=3, channels=16),
    APCHead(num_classes=3, channels=16, pool_scales=(1, 2)),
    DMHead(num_classes=3, channels=16, filter_sizes=(1, 3)),
    EMAHead(num_classes=3, channels=16, ema_channels=16, num_bases=8),
    PSAHead(num_classes=3, channels=16),
    DAHead(num_classes=3, channels=16),
    EncHead(num_classes=3, channels=16, num_codes=8),
]


@pytest.mark.parametrize("head", SIMPLE_HEADS,
                         ids=[type(h).__name__ for h in SIMPLE_HEADS])
def test_attention_head_shapes(head):
    feats = pyramid()
    variables = head.init({"params": jax.random.PRNGKey(0)}, feats,
                          train=False)
    out = head.apply(variables, feats, train=False)
    assert out.shape == (2, 2, 2, 3)
    assert np.isfinite(np.asarray(out)).all()


def test_ann_head_two_inputs():
    feats = pyramid()
    head = ANNHead(num_classes=3, channels=16, project_channels=8,
                   in_index=(2, 3))
    v = head.init({"params": jax.random.PRNGKey(0)}, feats, train=False)
    out = head.apply(v, feats, train=False)
    assert out.shape == (2, 2, 2, 3)  # at the high-level (c4) resolution


def test_da_head_aux_outputs():
    feats = pyramid()
    head = DAHead(num_classes=3, channels=16)
    v = head.init({"params": jax.random.PRNGKey(0)}, feats, train=False)
    fused, pam, cam = head.apply(v, feats, train=False, return_aux=True)
    only = head.apply(v, feats, train=False)
    np.testing.assert_allclose(np.asarray(fused), np.asarray(only))
    assert pam.shape == cam.shape == (2, 2, 2, 3)


def test_enc_head_se_outputs():
    feats = pyramid()
    head = EncHead(num_classes=3, channels=16, num_codes=8)
    v = head.init({"params": jax.random.PRNGKey(0)}, feats, train=False)
    logits, se = head.apply(v, feats, train=False, return_se=True)
    assert se.shape == (2, 3)
    onehot = encode_onehot_labels(jnp.asarray([[0, 2], [1, 1]]), 3)
    np.testing.assert_array_equal(np.asarray(onehot),
                                  [[1, 0, 1], [0, 1, 0]])


def test_ema_head_momentum_bases_update():
    feats = pyramid()
    head = EMAHead(num_classes=3, channels=16, ema_channels=16, num_bases=8)
    v = head.init({"params": jax.random.PRNGKey(0)}, feats, train=False)
    out, mutated = head.apply(v, feats, train=True,
                              rngs={"dropout": jax.random.PRNGKey(1)},
                              mutable=["batch_stats"])
    before = np.asarray(v["batch_stats"]["bases"])
    after = np.asarray(mutated["batch_stats"]["bases"])
    assert not np.allclose(before, after)  # momentum update happened
    assert np.isfinite(after).all()


def _psamask_oracle(inp, mask_size, mode):
    """Direct numpy transliteration of the mmcv psa_mask kernel loops
    (zero-filled output; channel layout per mode)."""
    n, _, h, w = inp.shape
    mask_h, mask_w = mask_size
    half_h, half_w = (mask_h - 1) // 2, (mask_w - 1) // 2
    out = np.zeros((n, h * w, h, w), dtype=inp.dtype)
    for hh in range(h):
        for ww in range(w):
            hstart, hend = max(0, half_h - hh), min(mask_h, h + half_h - hh)
            wstart, wend = max(0, half_w - ww), min(mask_w, w + half_w - ww)
            for hi in range(hstart, hend):
                for wi in range(wstart, wend):
                    src = inp[:, hi * mask_w + wi, hh, ww]
                    if mode == "collect":
                        out[:, (hi + hh - half_h) * w + (wi + ww - half_w),
                            hh, ww] = src
                    else:  # distribute
                        out[:, hh * w + ww, hi + hh - half_h,
                            wi + ww - half_w] = src
    return out


@pytest.mark.parametrize("mode", ["collect", "distribute"])
def test_psa_mask_attention_matches_mmcv_oracle(mode):
    from aadg_tpu.models.zoo.attention_heads import psa_mask_attention
    rng = np.random.RandomState(0)
    h, w, mask = 5, 6, (3, 5)
    logits = rng.randn(2, mask[0] * mask[1], h, w).astype(np.float32)
    want = _psamask_oracle(logits, mask, mode).reshape(2, h * w, h * w)
    got = psa_mask_attention(
        jnp.asarray(logits.transpose(0, 2, 3, 1)), mask, mode)
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-6)


def test_psa_head_local_mask_variant():
    feats = pyramid()
    head = PSAHead(num_classes=3, channels=16, compact=False,
                   mask_size=(3, 3))
    v = head.init({"params": jax.random.PRNGKey(0)}, feats, train=False)
    out = head.apply(v, feats, train=False)
    assert out.shape == (2, 2, 2, 3)
    assert np.isfinite(np.asarray(out)).all()
    # attention conv emits mask_h*mask_w relative-offset channels
    k = v["params"]["attention_collect_1"]["kernel"]
    assert k.shape[-1] == 9


class TinyBackbone(nn.Module):
    @nn.compact
    def __call__(self, x, train=True):
        feats = []
        for i, c in enumerate((8, 16, 24, 32)):
            x = nn.Conv(c, (3, 3), strides=(4, 4) if i == 0 else (2, 2),
                        padding=1)(x)
            feats.append(x)
        return feats


def test_cascade_encoder_decoder_with_ocr():
    model = CascadeEncoderDecoder(
        backbone=TinyBackbone(),
        decode_head=FCNHead(num_classes=3, channels=16, num_convs=1,
                            concat_input=False),
        cascade_heads=(OCRHead(num_classes=3, channels=16, ocr_channels=8),))
    x = jnp.zeros((1, 32, 32, 3))
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    logits, pooled = model.apply(variables, x, train=False)
    assert logits.shape == (1, 32, 32, 3)
    assert pooled.shape == (1, 32)
    assert np.isfinite(np.asarray(logits)).all()
