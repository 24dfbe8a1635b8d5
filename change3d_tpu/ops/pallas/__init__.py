from change3d_tpu.ops.pallas.fused_block import fused_bottleneck_block

__all__ = ["fused_bottleneck_block"]
