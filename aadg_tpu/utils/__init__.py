from .logging import AverageMeter, create_logger, ScalarWriter
from .checkpoint import (save_checkpoint, load_checkpoint, latest_checkpoint,
                         find_resume_checkpoint, save_json, save_array,
                         fetch_tree, wait_pending_checkpoints)

__all__ = [
    "AverageMeter", "create_logger", "ScalarWriter",
    "save_checkpoint", "load_checkpoint", "latest_checkpoint",
    "find_resume_checkpoint",
    "save_json", "save_array", "fetch_tree", "wait_pending_checkpoints",
]
