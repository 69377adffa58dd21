"""Checkpoint save/load with real resume.

The reference's checkpointing is broken in two ways we deliberately fix
(SURVEY.md §5.4): `utils.save_checkpoint` (`/root/reference/utils.py:217-224`)
symlinks ``latest.pth`` to a per-epoch file that is never written, and stores
the model *object* rather than its state. Here every checkpoint is actually
written (msgpack via flax.serialization), ``latest`` points at a real file,
and optimizer/epoch state round-trips so ``TRAIN.BEGIN_EPOCH`` / auto-resume
genuinely work.
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional

import numpy as np
from flax import serialization


def save_checkpoint(state: Dict[str, Any], is_best: bool, output_dir: str,
                    filename: str = "checkpoint.msgpack",
                    update_latest: bool = True) -> str:
    """Serialize a pytree-of-arrays state dict.

    ``state`` may contain jax arrays, numpy arrays, python scalars and nested
    dicts/lists. Writes ``<output_dir>/<filename>``, re-points ``latest``
    (a real file copy of the name, not a dangling symlink), and on
    ``is_best`` also writes ``model_best.msgpack``.
    """
    os.makedirs(output_dir, exist_ok=True)
    path = os.path.join(output_dir, filename)
    data = serialization.to_bytes(state)
    with open(path, "wb") as f:
        f.write(data)

    if update_latest:
        latest = os.path.join(output_dir, "latest.msgpack")
        tmp = latest + ".tmp"
        if os.path.islink(latest) or os.path.exists(latest):
            os.remove(latest)
        os.symlink(os.path.basename(path), tmp)
        os.rename(tmp, latest)

    if is_best:
        with open(os.path.join(output_dir, "model_best.msgpack"), "wb") as f:
            f.write(data)
    return path


def load_checkpoint(path: str, target: Optional[Dict[str, Any]] = None
                    ) -> Dict[str, Any]:
    """Load a checkpoint written by :func:`save_checkpoint`.

    With ``target`` (a template pytree) the arrays are restored with the
    template's exact structure; without it, a raw nested dict of numpy
    arrays is returned.
    """
    with open(path, "rb") as f:
        data = f.read()
    if target is not None:
        return serialization.from_bytes(target, data)
    return serialization.msgpack_restore(data)


def latest_checkpoint(output_dir: str) -> Optional[str]:
    latest = os.path.join(output_dir, "latest.msgpack")
    if os.path.exists(latest):
        return os.path.realpath(latest)
    return None


def save_json(obj: Any, path: str) -> None:
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "w") as f:
        f.write(json.dumps(obj, default=_jsonify))


def _jsonify(o):
    if hasattr(o, "item"):
        return o.item()
    if isinstance(o, (np.ndarray,)):
        return o.tolist()
    raise TypeError(f"not jsonifiable: {type(o)}")


def save_array(arr, path: str) -> None:
    """Save a trajectory array like the reference's ``*_trajectory.npy``
    (`search_dg.py:399-400`)."""
    np.save(path, np.asarray(arr))
