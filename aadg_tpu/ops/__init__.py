from . import augment
from . import sinkhorn

__all__ = ["augment", "sinkhorn"]
