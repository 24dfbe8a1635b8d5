from change3d_tpu.parallel.mesh import (
    make_mesh,
    batch_sharding,
    replicated_sharding,
    local_device_count,
)

__all__ = ["make_mesh", "batch_sharding", "replicated_sharding", "local_device_count"]
