from .transforms import (normalize_image, optic_mask_to_multilabel,
                         vessel_mask_to_binary, soft_domain_label,
                         random_scale_crop, make_train_transform)
from .datasets import (FundusDataset, RVSDataset, SyntheticDataset,
                       load_train_arrays, load_test_arrays)
from .stores import TrainStore, TestStore, sample_train_batch

__all__ = [
    "normalize_image", "optic_mask_to_multilabel", "vessel_mask_to_binary",
    "soft_domain_label", "random_scale_crop", "make_train_transform",
    "FundusDataset", "RVSDataset", "SyntheticDataset",
    "load_train_arrays", "load_test_arrays",
    "TrainStore", "TestStore", "sample_train_batch",
]
