from change3d_tpu.ops.layers import (
    conv3d,
    pointwise_conv3d,
    depthwise_conv3d,
    conv2d,
    conv_transpose2d,
    linear,
    swish,
    squeeze_excite_3d,
)
from change3d_tpu.ops.norm import BatchNorm, batch_norm_inference, fold_bn_into_conv
from change3d_tpu.ops.attention import multi_head_attention

__all__ = [
    "conv3d",
    "pointwise_conv3d",
    "depthwise_conv3d",
    "conv2d",
    "conv_transpose2d",
    "linear",
    "swish",
    "squeeze_excite_3d",
    "BatchNorm",
    "batch_norm_inference",
    "fold_bn_into_conv",
    "multi_head_attention",
]
