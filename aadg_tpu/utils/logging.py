"""Logging & observability.

Mirrors the reference's observability surface (`/root/reference/utils.py:18-37,
181-214`): an ``AverageMeter``, a timestamped output dir with file+console
logging, and TensorBoard scalars (tensorboardX here; the reference used
torch.utils.tensorboard, `search_dg.py:315`).
"""

from __future__ import annotations

import logging
import os
import time
from pathlib import Path


class AverageMeter:
    """Computes and stores the average and current value."""

    def __init__(self):
        self.reset()

    def reset(self):
        self.val = 0.0
        self.avg = 0.0
        self.sum = 0.0
        self.count = 0

    def update(self, val, n=1):
        val = float(val)
        self.val = val
        self.sum += val * n
        self.count += n
        self.avg = self.sum / max(self.count, 1)


def create_logger(cfg, cfg_name: str, phase: str = "train"):
    """Create output dir ``<OUTPUT_DIR>/<dataset>/<cfg>_<timestamp>/`` with a
    ``<phase>.log`` file logger, and a tensorboard log dir.

    Returns (logger, final_output_dir, tb_log_dir) like the reference
    (`utils.py:181-214`).
    """
    root_output_dir = Path(cfg.OUTPUT_DIR)
    root_output_dir.mkdir(parents=True, exist_ok=True)

    dataset = cfg.DATASET.NAME
    model = cfg.MODEL.NAME
    cfg_name = os.path.basename(cfg_name).split(".")[0]
    time_str = time.strftime("%Y-%m-%d-%H-%M")
    cfg_name = f"{cfg_name}_{time_str}"

    final_output_dir = root_output_dir / dataset / cfg_name
    final_output_dir.mkdir(parents=True, exist_ok=True)

    log_file = final_output_dir / f"{phase}.log"
    logger = logging.getLogger(f"aadg_tpu.{cfg_name}.{phase}")
    logger.setLevel(logging.INFO)
    logger.propagate = False
    # Avoid duplicate handlers when called twice in one process (tests).
    if not logger.handlers:
        fmt = logging.Formatter("%(asctime)-15s %(message)s")
        fh = logging.FileHandler(str(log_file))
        fh.setFormatter(fmt)
        logger.addHandler(fh)
        ch = logging.StreamHandler()
        logger.addHandler(ch)

    tb_log_dir = Path(cfg.LOG_DIR) / dataset / model / (cfg_name + "_" + time_str)
    tb_log_dir.mkdir(parents=True, exist_ok=True)

    return logger, str(final_output_dir), str(tb_log_dir)


class ScalarWriter:
    """Scalar logger: tensorboardX when importable, JSONL always.

    The JSONL stream (``scalars.jsonl`` in the log dir) makes runs greppable
    without TensorBoard; TB events match the reference's scalar tags.
    """

    def __init__(self, log_dir: str):
        self.log_dir = log_dir
        os.makedirs(log_dir, exist_ok=True)
        self._jsonl = open(os.path.join(log_dir, "scalars.jsonl"), "a")
        try:
            from tensorboardX import SummaryWriter  # type: ignore
            self._tb = SummaryWriter(log_dir=log_dir)
        except Exception:  # pragma: no cover - tensorboardX is present here
            self._tb = None

    def add_scalar(self, tag: str, value, step: int):
        import json
        self._jsonl.write(json.dumps(
            {"tag": tag, "value": float(value), "step": int(step)}) + "\n")
        self._jsonl.flush()
        if self._tb is not None:
            self._tb.add_scalar(tag, float(value), step)

    def close(self):
        self._jsonl.close()
        if self._tb is not None:
            self._tb.close()
