from .logging import AverageMeter, create_logger, ScalarWriter
from .checkpoint import (save_checkpoint, load_checkpoint, latest_checkpoint,
                         load_checkpoint_lenient,
                         find_resume_checkpoint, save_json, save_array,
                         fetch_tree, wait_pending_checkpoints)
from .pretrained import load_pretrained
from .cache import setup_compile_cache, machine_fingerprint

__all__ = [
    "AverageMeter", "create_logger", "ScalarWriter",
    "save_checkpoint", "load_checkpoint", "latest_checkpoint",
    "load_checkpoint_lenient", "find_resume_checkpoint",
    "save_json", "save_array", "fetch_tree", "wait_pending_checkpoints",
    "load_pretrained", "setup_compile_cache", "machine_fingerprint",
]
