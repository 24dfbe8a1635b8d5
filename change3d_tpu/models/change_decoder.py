"""Dense-prediction decoder: FPN-style top-down upsampling head.

Reimplements ``ChangeDecoder`` (ref: /root/reference/model/change_decoder.py:10-80):
three (1x1 conv -> ConvTranspose2d k4 s2 p1) up-blocks with additive skips,
then a 3x3 conv to ``num_classes`` (1 + sigmoid for binary heads). Because the
stem is stride-1, the cascade returns the mask at full input resolution.

Init parity (ref: /root/reference/model/utils.py:20-82 applied at
/root/reference/model/trainer.py:193-213): Conv2d layers get kaiming-normal
(fan_in, relu); ConvTranspose2d is *not* matched by ``weight_init`` and keeps
torch default init.
"""

from __future__ import annotations

from typing import List, Sequence

import jax
import flax.linen as nn

from change3d_tpu.init import (
    kaiming_normal_relu_init,
    torch_conv_kernel_init,
    torch_conv_bias_init,
)
from change3d_tpu.ops.layers import conv2d, conv_transpose2d


class UpBlock(nn.Module):
    """1x1 channel-reduce conv (bias-free, kaiming-normal) then 2x transposed
    conv (k4 s2 p1, torch-default init, with bias)."""

    c_in: int
    c_out: int

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        reduce_w = self.param("reduce", kaiming_normal_relu_init, (1, 1, self.c_in, self.c_out))
        x = conv2d(x, reduce_w)
        # torch ConvTranspose2d fan_in = C_out * k * k (computed on its
        # (in, out, kh, kw) weight); replicate for init parity.
        fan_in = self.c_out * 16
        up_w = self.param("up", torch_conv_kernel_init, (4, 4, self.c_out, self.c_out))
        up_b = self.param("up_bias", torch_conv_bias_init(fan_in), (self.c_out,))
        return conv_transpose2d(x, up_w, up_b, stride=2, padding=1)


class ChangeDecoder(nn.Module):
    num_classes: int
    has_sigmoid: bool = False
    in_dims: Sequence[int] = (24, 24, 48, 96)

    @nn.compact
    def __call__(self, feats: List[jax.Array]) -> jax.Array:
        """feats: [c1, c2, c3, c4] NHWC with strides {1,2,4,8}. Returns
        [B, H, W, num_classes] logits (or sigmoid probabilities)."""
        c1, c2, c3, c4 = feats
        d1, d2, d3, d4 = self.in_dims
        c3f = c3 + UpBlock(d4, d3, name="up_c4")(c4)
        c2f = c2 + UpBlock(d3, d2, name="up_c3")(c3f)
        c1f = c1 + UpBlock(d2, d1, name="up_c2")(c2f)
        out_c = 1 if self.has_sigmoid else self.num_classes
        final_w = self.param("final", kaiming_normal_relu_init, (3, 3, d1, out_c))
        pred = conv2d(c1f, final_w, padding=(1, 1))
        if self.has_sigmoid:
            pred = jax.nn.sigmoid(pred)
        return pred
