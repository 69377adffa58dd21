"""Load converted pretrained encoder weights into initialized params.

The reference gets ImageNet encoders at build time
(`/root/reference/models/__init__.py:19`); here the weights arrive as a
msgpack written by ``tools/convert_torch_weights.py`` and are grafted into
the freshly-initialized parameter tree (config key ``TPU.PRETRAINED``,
optionally ``prefix``-qualified as ``path::sub/tree``).

The graft point is located automatically: the unique subtree of the model's
params whose children include every top-level key of the checkpoint (e.g.
the ``encoder`` submodule for DeepLabV3+/MobileNetV2, ``backbone`` for zoo
EncoderDecoders). Shapes are validated leaf-by-leaf — a naming or variant
mismatch fails loudly instead of training from a silent partial init.
"""

from __future__ import annotations

from typing import List, Optional

import numpy as np


def _find_prefix(params, loaded, prefix: Optional[str]) -> List[str]:
    if prefix is not None:
        return [p for p in prefix.split("/") if p]
    want = set(loaded.keys())
    matches: List[List[str]] = []

    def walk(node, path):
        if not isinstance(node, dict) or not hasattr(node, "keys"):
            return
        if want <= set(node.keys()):
            matches.append(path)
            return
        for k in node:
            walk(node[k], path + [k])

    walk(params, [])
    if len(matches) != 1:
        raise ValueError(
            f"pretrained graft point {'ambiguous' if matches else 'not found'}"
            f" for checkpoint keys {sorted(want)[:4]}...: matches={matches}")
    return matches[0]


def _graft(tree, path: List[str], sub, where: str):
    if not path:
        out = dict(tree)
        for k, v in sub.items():
            if isinstance(v, dict):
                if k not in out:
                    raise KeyError(f"{where}/{k}: missing in target tree")
                out[k] = _graft(out[k], [], v, f"{where}/{k}")
            else:
                if k not in out:
                    raise KeyError(f"{where}/{k}: missing in target tree")
                tgt = np.shape(out[k])
                if tuple(tgt) != tuple(np.shape(v)):
                    raise ValueError(
                        f"{where}/{k}: shape {np.shape(v)} != target {tgt}")
                out[k] = np.asarray(v)
        return out
    head, rest = path[0], path[1:]
    out = dict(tree)
    out[head] = _graft(out[head], rest, sub, where + "/" + head)
    return out


def load_pretrained(params, batch_stats, path: str,
                    prefix: Optional[str] = None, logger=None):
    """Returns (params, batch_stats) with the checkpoint grafted in.

    ``path`` may carry an explicit graft prefix as ``file.msgpack::sub/tree``
    (otherwise the graft point is auto-located, see module docstring).
    """
    from flax import serialization

    if "::" in path:
        path, prefix = path.split("::", 1)
    with open(path, "rb") as f:
        tree = serialization.msgpack_restore(f.read())
    loaded_p = tree.get("params", {})
    loaded_s = tree.get("batch_stats", {})
    at = _find_prefix(params, loaded_p, prefix)
    params = _graft(params, at, loaded_p, "params")
    if loaded_s:
        batch_stats = _graft(batch_stats, at, loaded_s, "batch_stats")
    if logger is not None:
        logger.info(f"loaded pretrained weights {path} at "
                    f"params/{'/'.join(at) or '<root>'}")
    return params, batch_stats
