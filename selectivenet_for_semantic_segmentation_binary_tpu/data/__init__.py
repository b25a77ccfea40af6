"""Host-side data pipeline: folds, patch dataset, transforms, device feed."""

from .folds import construct_test, construct_train_valid, split_train_valid  # noqa: F401
from .stain import H_RGB, RGB2GH, combine_stains, separate_stains  # noqa: F401
from .transforms import (  # noqa: F401
    Compose,
    Normalization,
    PartialNonTissue,
    RandomFlip,
    ToArray,
)
from .dataset import (  # noqa: F401
    PatchDataset,
    write_hard_synthetic_patch_tree,
    write_synthetic_patch_tree,
)
from .loader import PatchLoader  # noqa: F401
