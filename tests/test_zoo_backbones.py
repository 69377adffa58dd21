"""Zoo backbones: pyramid shapes + finite outputs on tiny inputs."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aadg_tpu.models.zoo.backbones import (HRNet, MobileNetV3, ResNeSt,
                                           ResNeXt, ResNetV1c)


def _run(model, size=64):
    x = jnp.zeros((1, size, size, 3))
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    feats = model.apply(variables, x, train=False)
    assert all(np.isfinite(np.asarray(f)).all() for f in feats)
    return feats


@pytest.mark.slow
def test_resnetv1c_output_stride8():
    feats = _run(ResNetV1c(depth=50))
    assert [f.shape[1] for f in feats] == [16, 8, 8, 8]  # OS 4,8,8,8
    assert [f.shape[-1] for f in feats] == [256, 512, 1024, 2048]


@pytest.mark.slow
def test_resnext_grouped():
    feats = _run(ResNeXt(depth=50, strides=(1, 2, 2, 2),
                         dilations=(1, 1, 1, 1)))
    assert [f.shape[1] for f in feats] == [16, 8, 4, 2]
    assert feats[-1].shape[-1] == 2048


@pytest.mark.slow
def test_resnest_split_attention():
    feats = _run(ResNeSt(depth=50))
    assert [f.shape[1] for f in feats] == [16, 8, 8, 8]
    assert feats[-1].shape[-1] == 2048


@pytest.mark.slow
def test_hrnet_w18_branches():
    feats = _run(HRNet(width=18, stage_modules=(1, 1, 1)))
    assert [f.shape[1] for f in feats] == [16, 8, 4, 2]
    assert [f.shape[-1] for f in feats] == [18, 36, 72, 144]


@pytest.mark.slow
@pytest.mark.parametrize("arch,chans", [("large", (24, 40, 160)),
                                        ("small", (16, 24, 96))])
def test_mobilenetv3(arch, chans):
    feats = _run(MobileNetV3(arch=arch))
    assert [f.shape[-1] for f in feats] == list(chans)
    assert [f.shape[1] for f in feats] == [16, 8, 2]


@pytest.mark.slow
def test_hrnet_with_fcn_resize_concat():
    """HRNetV2 seg head consumes the resize-concat of all branches
    (mmseg fcn_hr18 config semantics)."""
    from aadg_tpu.models.zoo import FCNHead
    feats = _run(HRNet(width=18, stage_modules=(1, 1, 1)))
    head = FCNHead(num_classes=2, channels=32, num_convs=1,
                   concat_input=False, in_index=(0, 1, 2, 3),
                   input_transform="resize_concat", kernel=1)
    v = head.init({"params": jax.random.PRNGKey(0)}, feats, train=False)
    out = head.apply(v, feats, train=False)
    assert out.shape == (1, 16, 16, 2)


@pytest.mark.slow
def test_fast_scnn_triplet():
    from aadg_tpu.models.zoo.backbones import FastSCNN
    feats = _run(FastSCNN(), size=64)
    assert len(feats) == 3
    assert feats[0].shape == (1, 8, 8, 64)    # higher res 1/8
    assert feats[1].shape == (1, 2, 2, 128)   # lower res 1/32
    assert feats[2].shape == (1, 8, 8, 128)   # fusion 1/8


@pytest.mark.slow
def test_cgnet_stages():
    from aadg_tpu.models.zoo.backbones import CGNet
    feats = _run(CGNet(num_blocks=(3, 5)), size=64)
    assert [f.shape[1] for f in feats] == [32, 16, 8]
    assert feats[0].shape[-1] == 32 + 3       # stem + input injection
    assert feats[1].shape[-1] == 64 * 2 + 3   # blocks + first + injection
    assert feats[2].shape[-1] == 128 * 2      # blocks + first
