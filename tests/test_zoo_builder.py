"""Zoo builder: config-name surface + framework model contract."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aadg_tpu.config import load_config
from aadg_tpu.models import build_model, channel_parser
from aadg_tpu.models.zoo.builder import ZOO_ARCHS, build_segmentor


def test_channel_parser_zoo_backbones():
    assert channel_parser("hrnet_w18") == 144
    assert channel_parser("resnest50") == 2048
    assert channel_parser("mobilenet_v2") == 1280  # legacy path intact


@pytest.mark.slow
def test_build_model_via_config_zoo():
    cfg = load_config()
    cfg.defrost()
    cfg.DATASET.NAME = "synthetic_optic"
    cfg.MODEL.NAME = "lraspp"
    cfg.MODEL.BACKBONE = "mobilenet_v3_small"
    cfg.freeze()
    model = build_model(cfg)
    x = jnp.zeros((1, 64, 64, 3))
    v = model.init(jax.random.PRNGKey(0), x, train=False)
    logits, pooled = model.apply(v, x, train=False)
    assert logits.shape == (1, 64, 64, 2)
    assert pooled.shape == (1, 96)  # matches channel_parser -> disc in_ch
    assert pooled.shape[-1] == channel_parser("mobilenet_v3_small")


@pytest.mark.slow
def test_build_segmentor_ocrnet_cascade():
    model, feat_ch = build_segmentor("ocrnet", "hrnet_w18", 2)
    x = jnp.zeros((1, 32, 32, 3))
    v = model.init(jax.random.PRNGKey(0), x, train=False)
    logits, pooled = model.apply(v, x, train=False)
    assert logits.shape == (1, 32, 32, 2)
    assert pooled.shape == (1, feat_ch)


def test_zoo_archs_all_have_heads():
    # every advertised arch must construct (tiny backbone to keep it cheap)
    for arch in ZOO_ARCHS:
        if arch in ("ocrnet",):
            continue
        backbone = ("fast_scnn" if arch == "fast_scnn" else
                    "mobilenet_v3_small" if arch == "lraspp" else "cgnet")
        model, _ = build_segmentor(arch, backbone, 2)
        assert model is not None


@pytest.mark.slow
def test_sem_fpn_resnet_forward():
    """FPNHead must handle the zoo's dilated resnet strides (4,8,8,8) —
    the per-stage upsample count is derived from actual shapes."""
    model, feat_ch = build_segmentor("sem_fpn", "resnet50_v1c", 2)
    assert feat_ch == 256  # FPN neck width, not the backbone's 2048
    assert model.feature_dim == 256
    x = jnp.zeros((1, 32, 32, 3))
    v = model.init(jax.random.PRNGKey(0), x, train=False)
    logits, pooled = model.apply(v, x, train=False)
    assert logits.shape == (1, 32, 32, 2)
    assert pooled.shape == (1, 256)


@pytest.mark.slow
def test_pointrend_builder_eval_and_train_paths():
    """pointrend arch: FPN base + FPNHead coarse + PointHead refinement.
    Eval runs iterative subdivision; forward_train_points returns point
    logits at importance-sampled coords for the mmseg-style point loss."""
    model, feat_ch = build_segmentor("pointrend", "resnet50_v1c", 2)
    assert feat_ch == 256
    x = jnp.zeros((1, 32, 32, 3))
    v = model.init(jax.random.PRNGKey(0), x, jax.random.PRNGKey(1),
                   train=True, method=type(model).forward_train_points)
    assert "point_head" in v["params"]
    logits, pooled = model.apply(v, x, train=False)
    assert logits.shape == (1, 32, 32, 2)
    assert pooled.shape == (1, 256)
    assert np.isfinite(np.asarray(logits)).all()
    out = model.apply(v, x, jax.random.PRNGKey(2), train=True,
                      mutable=["batch_stats"], rngs={"dropout": jax.random.PRNGKey(3)},
                      method=type(model).forward_train_points)
    (coarse_up, pooled_t, plogits, pts) = out[0]
    assert coarse_up.shape == (1, 32, 32, 2)
    assert plogits.shape == (1, model.train_num_points, 2)
    assert pts.shape == (1, model.train_num_points, 2)
    assert float(pts.min()) >= 0.0 and float(pts.max()) <= 1.0


@pytest.mark.slow
def test_fcn_hrnet_resize_concat_wiring():
    """With HRNet backbones single-input heads get mmseg's stride-4
    resize_concat of all four branches (fcn_hr18 convention)."""
    model, feat_ch = build_segmentor("fcn", "hrnet_w18", 2)
    assert model.decode_head.input_transform == "resize_concat"
    assert model.decode_head.in_index == (0, 1, 2, 3)
    x = jnp.zeros((1, 32, 32, 3))
    v = model.init(jax.random.PRNGKey(0), x, train=False)
    logits, pooled = model.apply(v, x, train=False)
    assert logits.shape == (1, 32, 32, 2)
    assert pooled.shape == (1, feat_ch)


@pytest.mark.slow  # multi-size FPN builds: 90 s even warm (r5 tiering)
def test_fpn_head_param_structure_is_input_size_independent():
    """FPNHead's conv-chain depth is static (feature_strides), so
    variables init'd at one size must run inference at any other —
    shape-derived depths broke this (init 32^2 vs apply 48x64)."""
    import jax
    import jax.numpy as jnp
    from aadg_tpu.models.zoo.builder import build_segmentor

    model, _ = build_segmentor("sem_fpn", "mobilenet_v3_small", 5)
    v = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)),
                   train=False)
    out, _f = model.apply(v, jnp.zeros((2, 48, 64, 3)), train=False)
    assert out.shape == (2, 48, 64, 5)


def test_fpn_strides_probe_matches_backbones():
    from aadg_tpu.models.zoo.builder import (_backbone_strides,
                                             _fpn_strides, build_backbone)

    bb, _ = build_backbone("resnet50_v1c")
    assert _backbone_strides(bb) == (4, 8, 8, 8)  # OS8 dilated
    bb, _ = build_backbone("mobilenet_v3_small")
    s = _backbone_strides(bb)
    assert len(s) == 3 and s[0] == 4
    assert _fpn_strides(bb, 4) == s + (s[-1] * 2,)
