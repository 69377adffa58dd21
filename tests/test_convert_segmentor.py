"""Full mmseg segmentor-checkpoint conversion oracles.

`tools/convert_torch_weights.py::convert_segmentor` maps an mmseg
checkpoint (``backbone.* + decode_head.*`` torch keys) onto the exact
variables tree `zoo.builder.build_segmentor` initializes. These tests
validate the DECODE-HEAD key mapping numerically by reusing the trusted
torch head oracles from `test_torch_parity_heads{,2}.py`: each oracle's
state_dict is renamed to the reference's mmseg key layout
(`models/mmseg/models/decode_heads/*.py` module attribute names), pushed
through the converter, and the resulting flax forward must match the
torch forward. A final end-to-end test converts a synthesized FULL
pspnet/resnet50 checkpoint and checks numerics against the composed
torch model plus the dropped-prefix report for auxiliary heads.
"""

import re

import numpy as np
import pytest

import jax.numpy as jnp

torch = pytest.importorskip("torch")

from test_torch_parity_heads import TOCRHead  # noqa: E402
from test_torch_parity_heads2 import (CM, DSCM, TASPP, TFCN, TPSP,  # noqa
                                      TSepASPP, TUPer, _nhwc, _randomize,
                                      _x, C_IN)
from tools.convert_torch_weights import (convert_aspp_head,  # noqa: E402
                                         convert_fcn_head,
                                         convert_ocr_head,
                                         convert_psp_head,
                                         convert_segmentor,
                                         convert_uper_head)
from aadg_tpu.models.zoo.heads import (ASPPHead,  # noqa: E402
                                       DepthwiseSeparableASPPHead, FCNHead,
                                       PSPHead, UPerHead)
from aadg_tpu.models.zoo.attention_heads import OCRHead  # noqa: E402


def _rename(sd, rules):
    """Apply the first matching (pattern, repl) regex to every key."""
    out = {}
    for k, v in sd.items():
        for pat, repl in rules:
            k2, n = re.subn(pat, repl, k)
            if n:
                k = k2
                break
        out[k] = v
    return out


def _check(got, want_t, atol=2e-4):
    want = np.transpose(want_t.detach().numpy(), (0, 2, 3, 1))
    np.testing.assert_allclose(np.asarray(got, np.float32), want,
                               rtol=1e-3, atol=atol)


def test_convert_fcn_head_matches_oracle():
    t = TFCN(C_IN, 24, 5)
    _randomize(t, 0)
    t.eval()
    x = _x((2, C_IN, 8, 8))
    with torch.no_grad():
        want = t(torch.from_numpy(x))
    # TFCN's attribute names ARE the mmseg layout already
    params, stats = convert_fcn_head(
        {k: v.numpy() for k, v in t.state_dict().items()})
    out = FCNHead(num_classes=5, channels=24).apply(
        {"params": params, "batch_stats": stats}, [_nhwc(x)], train=False)
    _check(out, want)


def test_convert_psp_head_matches_oracle():
    t = TPSP(C_IN, 16, 4)
    _randomize(t, 1)
    t.eval()
    x = _x((2, C_IN, 12, 12), 1)
    with torch.no_grad():
        want = t(torch.from_numpy(x))
    sd = _rename({k: v.numpy() for k, v in t.state_dict().items()},
                 [(r"^pools\.(\d+)\.", r"psp_modules.\1.1.")])
    params, stats = convert_psp_head(sd)
    out = PSPHead(num_classes=4, channels=16).apply(
        {"params": params, "batch_stats": stats}, [_nhwc(x)], train=False)
    _check(out, want)


def test_convert_aspp_head_matches_oracle():
    t = TASPP(C_IN, 16, 4)
    _randomize(t, 2)
    t.eval()
    x = _x((2, C_IN, 10, 10), 2)
    with torch.no_grad():
        want = t(torch.from_numpy(x))
    sd = _rename({k: v.numpy() for k, v in t.state_dict().items()},
                 [(r"^image_pool\.", "image_pool.1."),
                  (r"^branches\.(\d+)\.", r"aspp_modules.\1.")])
    params, stats = convert_aspp_head(sd)
    out = ASPPHead(num_classes=4, channels=16,
                   dilations=(1, 6, 12, 18)).apply(
        {"params": params, "batch_stats": stats}, [_nhwc(x)], train=False)
    _check(out, want)


def test_convert_sep_aspp_head_matches_oracle():
    c1_in = 16
    t = TSepASPP(C_IN, c1_in, 16, 8, 4)
    _randomize(t, 3)
    t.eval()
    c1 = _x((2, c1_in, 16, 16), 30)
    x = _x((2, C_IN, 8, 8), 31)
    with torch.no_grad():
        want = t((torch.from_numpy(c1), torch.from_numpy(x)))
    sd = _rename(
        {k: v.numpy() for k, v in t.state_dict().items()},
        [(r"^image_pool\.", "image_pool.1."),
         (r"^branches\.(\d+)\.depthwise\.", r"aspp_modules.\1.depthwise_conv."),
         (r"^branches\.(\d+)\.pointwise\.", r"aspp_modules.\1.pointwise_conv."),
         (r"^branches\.(\d+)\.", r"aspp_modules.\1."),
         (r"^sep0\.depthwise\.", "sep_bottleneck.0.depthwise_conv."),
         (r"^sep0\.pointwise\.", "sep_bottleneck.0.pointwise_conv."),
         (r"^sep1\.depthwise\.", "sep_bottleneck.1.depthwise_conv."),
         (r"^sep1\.pointwise\.", "sep_bottleneck.1.pointwise_conv.")])
    params, stats = convert_aspp_head(sd)
    out = DepthwiseSeparableASPPHead(
        num_classes=4, channels=16, c1_channels=8,
        dilations=(1, 6, 12, 18)).apply(
        {"params": params, "batch_stats": stats},
        [_nhwc(c1), _nhwc(x)], train=False)
    _check(out, want)


def test_convert_uper_head_matches_oracle():
    cins = (8, 12, 16, 24)
    t = TUPer(cins, 16, 4)
    _randomize(t, 4)
    t.eval()
    xs = [_x((2, c, 16 >> i, 16 >> i), 40 + i) for i, c in enumerate(cins)]
    with torch.no_grad():
        want = t([torch.from_numpy(a) for a in xs])
    sd = _rename({k: v.numpy() for k, v in t.state_dict().items()},
                 [(r"^pools\.(\d+)\.", r"psp_modules.\1.1."),
                  (r"^psp_bottleneck\.", "bottleneck."),
                  (r"^laterals\.(\d+)\.", r"lateral_convs.\1.")])
    params, stats = convert_uper_head(sd)
    out = UPerHead(num_classes=4, channels=16).apply(
        {"params": params, "batch_stats": stats},
        [_nhwc(a) for a in xs], train=False)
    _check(out, want)


def test_convert_ocr_head_matches_oracle():
    t = TOCRHead(C_IN, channels=16, ocr_channels=8, num_classes=4)
    _randomize(t, 5)
    t.eval()
    rng = np.random.default_rng(6)
    x = rng.normal(0, 1, (2, C_IN, 8, 8)).astype(np.float32)
    prev = rng.normal(0, 1, (2, 4, 8, 8)).astype(np.float32)
    with torch.no_grad():
        want = t(torch.from_numpy(x), torch.from_numpy(prev))
    sd = _rename(
        {k: v.numpy() for k, v in t.state_dict().items()},
        [(r"^(key|query)_project\.(\d+)\.",
          r"object_context_block.\1_project.\2."),
         (r"^value_project\.", "object_context_block.value_project.0."),
         (r"^out_project\.", "object_context_block.out_project.0."),
         (r"^oab_bottleneck\.", "object_context_block.bottleneck.")])
    params, stats = convert_ocr_head(sd)
    got = OCRHead(num_classes=4, channels=16, ocr_channels=8).apply(
        {"params": params, "batch_stats": stats},
        [jnp.asarray(np.transpose(x, (0, 2, 3, 1)))],
        jnp.asarray(np.transpose(prev, (0, 2, 3, 1))), train=False)
    _check(got, want)


@pytest.mark.slow
def test_convert_full_pspnet_checkpoint_e2e():
    """backbone.* + decode_head.* + auxiliary_head.* -> build_segmentor
    variables: numerics match the composed torch model; aux is dropped
    and reported; the converted tree loads into the init structure."""
    import jax
    from test_torch_parity_zoo import TResNet, _randomize_bn
    from aadg_tpu.models.zoo.builder import build_segmentor

    torch.manual_seed(0)
    bb = TResNet().eval()
    _randomize_bn(bb)
    head = TPSP(2048, 512, 7)
    _randomize(head, 9)
    head.eval()

    sd = {f"backbone.{k}": v.numpy() for k, v in bb.state_dict().items()}
    sd.update(_rename(
        {f"decode_head.{k}": v.numpy()
         for k, v in head.state_dict().items()},
        [(r"^decode_head\.pools\.(\d+)\.", r"decode_head.psp_modules.\1.1.")]))
    sd["auxiliary_head.convs.0.conv.weight"] = np.zeros((2, 2, 1, 1),
                                                        np.float32)

    variables, dropped = convert_segmentor(sd, "pspnet", "resnet50_v1c")
    assert dropped == ["auxiliary_head"]

    model, _ = build_segmentor("pspnet", "resnet50_v1c", 7)
    # converted tree must be exactly the init structure (param names+order)
    init = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)),
                      train=False)
    assert (jax.tree_util.tree_structure(init)
            == jax.tree_util.tree_structure(variables))

    x_np = np.random.default_rng(1).uniform(
        -1, 1, (1, 64, 64, 3)).astype(np.float32)
    with torch.no_grad():
        feats = bb(torch.from_numpy(np.transpose(x_np, (0, 3, 1, 2))))
        logits = head(feats[-1])
        want = torch.nn.functional.interpolate(
            logits, size=(64, 64), mode="bilinear", align_corners=False)
    got, _pooled = model.apply(variables, jnp.asarray(x_np), train=False)
    _check(got, want, atol=5e-3)


def test_convert_segformer_head_matches_oracle():
    from test_torch_parity_heads2 import TSegFormerHead
    from tools.convert_torch_weights import convert_segformer_head
    from aadg_tpu.models.segformer import SegFormerHead

    cins = (8, 12, 16, 24)
    t = TSegFormerHead(cins, 16, 4)
    _randomize(t, 13)
    t.eval()
    xs = [_x((2, c, 16 >> i, 16 >> i), 70 + i) for i, c in enumerate(cins)]
    with torch.no_grad():
        want = t([torch.from_numpy(a) for a in xs])
    sd = _rename({k: v.numpy() for k, v in t.state_dict().items()},
                 [(r"^linears\.(\d+)\.", lambda mo:
                   f"linear_c{int(mo.group(1)) + 1}.proj."),
                  (r"^fuse\.", "linear_fuse."),
                  (r"^pred\.", "linear_pred.")])
    params, stats = convert_segformer_head(sd)
    out = SegFormerHead(num_classes=4, embed_dim=16).apply(
        {"params": params, "batch_stats": stats},
        [_nhwc(a) for a in xs], train=False)
    _check(out, want)
