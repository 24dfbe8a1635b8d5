from change3d_tpu.parallel.mesh import (
    make_mesh,
    batch_sharding,
    replicated_sharding,
    local_device_count,
)
from change3d_tpu.parallel.distributed import initialize, is_primary

__all__ = [
    "make_mesh",
    "batch_sharding",
    "replicated_sharding",
    "local_device_count",
    "initialize",
    "is_primary",
]
