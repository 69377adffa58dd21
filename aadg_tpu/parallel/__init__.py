from .mesh import make_mesh, device_count
from .dp import make_dp_search_epoch, make_dp_train_step

__all__ = ["make_mesh", "device_count", "make_dp_search_epoch",
           "make_dp_train_step"]
