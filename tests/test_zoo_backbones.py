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


# ---------------------------------------------------------------------------
# UNet (configurable mmseg backbone)
# ---------------------------------------------------------------------------


@pytest.mark.slow
def test_unet_s5_d16_shapes():
    from aadg_tpu.models.zoo.backbones import UNetBackbone
    feats = _run(UNetBackbone(base_channels=16), size=64)
    # dec_outs: bottleneck then decoder coarse->fine (unet.py:380-386)
    assert [f.shape[1] for f in feats] == [4, 8, 16, 32, 64]
    assert [f.shape[-1] for f in feats] == [256, 128, 64, 32, 16]


@pytest.mark.slow
def test_unet_deconv_and_stride_variants():
    from aadg_tpu.models.zoo.backbones import UNetBackbone
    # strided convs downsample instead of maxpool; Deconv upsampling
    m = UNetBackbone(base_channels=8, num_stages=3,
                     strides=(1, 2, 2), enc_num_convs=(1, 1, 1),
                     dec_num_convs=(1, 1), downsamples=(False, False),
                     enc_dilations=(1, 1, 1), dec_dilations=(1, 1),
                     upsample="DeconvModule")
    feats = _run(m, size=32)
    assert [f.shape[1] for f in feats] == [8, 16, 32]
    assert [f.shape[-1] for f in feats] == [32, 16, 8]


@pytest.mark.slow
def test_unet_no_downsample_stage_uses_1x1_upsample():
    from aadg_tpu.models.zoo.backbones import UNetBackbone
    # stage 1 neither strides nor pools -> its decoder step must NOT
    # upsample (upsample=None 1x1-conv identity-resolution path)
    m = UNetBackbone(base_channels=8, num_stages=2, strides=(1, 1),
                     enc_num_convs=(1, 1), dec_num_convs=(1,),
                     downsamples=(False,), enc_dilations=(1, 1),
                     dec_dilations=(1,))
    feats = _run(m, size=16)
    assert [f.shape[1] for f in feats] == [16, 16]


@pytest.mark.slow
def test_unet_through_builder():
    import numpy as _np
    from aadg_tpu.models.zoo.builder import build_segmentor
    model, feat_ch = build_segmentor("fcn", "unet_s5_d16", num_classes=3)
    assert feat_ch == 64
    x = jnp.zeros((1, 32, 32, 3))
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    logits, pooled = model.apply(variables, x, train=False)
    assert logits.shape == (1, 32, 32, 3)
    assert pooled.shape == (1, 64)
    assert _np.isfinite(_np.asarray(logits)).all()
