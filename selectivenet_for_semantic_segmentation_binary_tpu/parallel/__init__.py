"""Device-mesh parallelism: the TPU replacement for torch DataParallel."""

from .mesh import (  # noqa: F401
    batch_sharding,
    make_mesh,
    make_mesh_dp_sp,
    replicate,
    replicated_sharding,
    shard_batch,
)
from .spatial import (  # noqa: F401
    make_mesh_2d,
    spatial_forward,
    spatial_forward_2d,
)
