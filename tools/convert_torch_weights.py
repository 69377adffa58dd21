"""Convert a torchvision MobileNetV2 (or smp DeepLabV3Plus) state_dict into
this framework's flax parameter tree.

The reference initializes its encoder from ImageNet
(`/root/reference/models/__init__.py:19` `encoder_weights="imagenet"`).
This image has no torchvision and no network egress, so pretrained weights
are unavailable at build time; when a ``mobilenet_v2-*.pth`` state_dict is
present on disk, this script maps it onto
``aadg_tpu.models.mobilenetv2.MobileNetV2Encoder``.

Usage:
    python tools/convert_torch_weights.py mobilenet_v2.pth out_params.msgpack

Mapping notes (torch -> flax):
- Conv2d.weight (O,I,kH,kW) -> Conv.kernel (kH,kW,I,O); depthwise
  (O,1,kH,kW) -> (kH,kW,1,O).
- BatchNorm2d.{weight,bias,running_mean,running_var} ->
  BatchNorm.{scale,bias} + batch_stats.{mean,var}.
- torchvision's features[0]=ConvBNReLU, features[1..17]=InvertedResidual,
  features[18]=ConvBNReLU(1280) align positionally with this encoder's
  module order.
"""

import sys

import numpy as np


def convert_conv(w):
    w = np.asarray(w)
    if w.shape[1] == 1 and w.shape[0] > 1:  # depthwise
        return np.transpose(w, (2, 3, 1, 0))
    return np.transpose(w, (2, 3, 1, 0))


def convert(state_dict):
    """Returns (params, batch_stats) nested dicts keyed by this encoder's
    flax module names (ConvBNReLU6_0.., InvertedResidual_0..)."""
    import torch  # noqa: F401  (state_dict tensors)

    params = {}
    stats = {}

    def put(tree, path, value):
        node = tree
        for p in path[:-1]:
            node = node.setdefault(p, {})
        node[path[-1]] = np.asarray(value)

    # group torch keys by the features.N prefix
    groups = {}
    for k, v in state_dict.items():
        if not k.startswith("features."):
            continue
        idx = int(k.split(".")[1])
        groups.setdefault(idx, {})[k.split(".", 2)[2]] = v

    # ordering of flax submodules inside MobileNetV2Encoder:
    # ConvBNReLU6_0 (stem), InvertedResidual_0..16, ConvBNReLU6_1 (1280)
    def conv_bn(src, dst_prefix, conv_key="0", bn_key="1"):
        put(params, dst_prefix + ["Conv_0", "kernel"],
            convert_conv(src[f"{conv_key}.weight"]))
        put(params, dst_prefix + ["BatchNorm_0", "scale"],
            src[f"{bn_key}.weight"])
        put(params, dst_prefix + ["BatchNorm_0", "bias"],
            src[f"{bn_key}.bias"])
        put(stats, dst_prefix + ["BatchNorm_0", "mean"],
            src[f"{bn_key}.running_mean"])
        put(stats, dst_prefix + ["BatchNorm_0", "var"],
            src[f"{bn_key}.running_var"])

    conv_bn(groups[0], ["ConvBNReLU6_0"])
    for i in range(1, 18):
        g = groups[i]
        dst = [f"InvertedResidual_{i - 1}"]
        sub = 0
        # expand conv is absent for the first block (t=1). In torchvision
        # both layouts start with a ConvBNReLU at conv.0 (expand 1x1 or
        # the depthwise), so the discriminator is the index of the final
        # BatchNorm: conv.3 with expand, conv.2 without.
        if "conv.3.running_mean" in g:
            conv_bn({k[len("conv.0."):]: v for k, v in g.items()
                     if k.startswith("conv.0.")},
                    dst + [f"ConvBNReLU6_{sub}"])
            sub += 1
            dw_prefix = "conv.1."
            pw_idx = 2
        else:
            dw_prefix = "conv.0."
            pw_idx = 1
        conv_bn({k[len(dw_prefix):]: v for k, v in g.items()
                 if k.startswith(dw_prefix)}, dst + [f"ConvBNReLU6_{sub}"])
        put(params, dst + ["Conv_0", "kernel"],
            convert_conv(g[f"conv.{pw_idx}.weight"]))
        put(params, dst + ["BatchNorm_0", "scale"],
            g[f"conv.{pw_idx + 1}.weight"])
        put(params, dst + ["BatchNorm_0", "bias"],
            g[f"conv.{pw_idx + 1}.bias"])
        put(stats, dst + ["BatchNorm_0", "mean"],
            g[f"conv.{pw_idx + 1}.running_mean"])
        put(stats, dst + ["BatchNorm_0", "var"],
            g[f"conv.{pw_idx + 1}.running_var"])
    conv_bn(groups[18], ["ConvBNReLU6_1"])
    return params, stats


def main():
    import torch
    from flax import serialization

    src, dst = sys.argv[1], sys.argv[2]
    state_dict = torch.load(src, map_location="cpu")
    if hasattr(state_dict, "state_dict"):
        state_dict = state_dict.state_dict()
    params, stats = convert(state_dict)
    with open(dst, "wb") as f:
        f.write(serialization.to_bytes(
            {"params": params, "batch_stats": stats}))
    print(f"wrote {dst}")


if __name__ == "__main__":
    main()
