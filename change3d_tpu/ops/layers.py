"""Functional compute primitives, NDHWC / NHWC layouts, TPU-first.

These are the XLA-level building blocks of the X3D backbone and task heads.
Semantics intentionally match the torch ops the reference relies on
(ref: /root/reference/model/x3d.py:70-92,173-232 for the conv configurations,
/root/reference/model/change_decoder.py:30-55 for the transposed convs), but the
implementation is layout- and compiler-driven:

- activations are NDHWC ([B, T, H, W, C]) / NHWC so the channel axis is the
  TPU lane axis (128-wide) and 1x1x1 convs become plain MXU matmuls;
- kernels are stored (..spatial.., in, out) so no transposition happens at
  trace time;
- dots set ``preferred_element_type=f32`` so bf16 inputs accumulate in fp32
  on the MXU; convs rely on the TPU's native f32 conv accumulation instead
  (an explicit f32 conv output breaks lax.conv's vjp under mixed precision).
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
from jax import lax

# Dimension numbers: activations NDHWC, kernels DHWIO.
_DN3D = lax.conv_dimension_numbers((1, 1, 1, 1, 1), (1, 1, 1, 1, 1), ("NDHWC", "DHWIO", "NDHWC"))
_DN2D = lax.conv_dimension_numbers((1, 1, 1, 1), (1, 1, 1, 1), ("NHWC", "HWIO", "NHWC"))


def _pad3(padding) -> Tuple[Tuple[int, int], ...]:
    return tuple((p, p) for p in padding)


def conv3d(
    x: jax.Array,
    kernel: jax.Array,
    *,
    stride: Sequence[int] = (1, 1, 1),
    padding: Sequence[int] = (0, 0, 0),
    groups: int = 1,
) -> jax.Array:
    """3D convolution. x: [B,T,H,W,C_in], kernel: [kt,kh,kw,C_in/groups,C_out]."""
    return lax.conv_general_dilated(
        x,
        kernel.astype(x.dtype),
        window_strides=tuple(stride),
        padding=_pad3(padding),
        dimension_numbers=_DN3D,
        feature_group_count=groups,
    )


def pointwise_conv3d(x: jax.Array, kernel: jax.Array, *, accum_dtype=jnp.float32) -> jax.Array:
    """1x1x1 conv as an MXU matmul. x: [..., C_in], kernel: [C_in, C_out].

    This is where most of the X3D FLOPs live (conv_a / conv_c of every
    bottleneck, ref: /root/reference/model/x3d.py:172-175,213-216); expressing
    it as a single dot keeps XLA free to tile it onto the MXU and fuse the
    surrounding elementwise work.
    """
    y = lax.dot_general(
        x,
        kernel.astype(x.dtype),
        dimension_numbers=(((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=accum_dtype,
    )
    return y.astype(x.dtype)


def depthwise_conv3d(
    x: jax.Array,
    kernel: jax.Array,
    *,
    stride: Sequence[int] = (1, 1, 1),
    padding: Sequence[int] = (1, 1, 1),
) -> jax.Array:
    """Depthwise (channelwise-separable) 3D conv — X3D's signature op.

    x: [B,T,H,W,C], kernel: [kt,kh,kw,1,C]. This op has zero MXU work; it is
    VPU/HBM-bound, which is why the channel-last layout matters: every lane
    holds one channel and the (kt*kh*kw) taps become vector FMAs.
    ref: /root/reference/model/x3d.py:184-193 (groups=dim_inner conv_b).
    """
    c = x.shape[-1]
    return lax.conv_general_dilated(
        x,
        kernel.astype(x.dtype),
        window_strides=tuple(stride),
        padding=_pad3(padding),
        dimension_numbers=_DN3D,
        feature_group_count=c,
    )


def conv2d(
    x: jax.Array,
    kernel: jax.Array,
    *,
    stride: Sequence[int] = (1, 1),
    padding: Sequence[int] = (0, 0),
) -> jax.Array:
    """2D convolution. x: [B,H,W,C_in], kernel: [kh,kw,C_in,C_out]."""
    if kernel.shape[0] == 1 and kernel.shape[1] == 1 and tuple(stride) == (1, 1):
        return pointwise_conv3d(x, kernel[0, 0])
    return lax.conv_general_dilated(
        x,
        kernel.astype(x.dtype),
        window_strides=tuple(stride),
        padding=tuple((p, p) for p in padding),
        dimension_numbers=_DN2D,
    )


def conv_transpose2d(
    x: jax.Array,
    kernel: jax.Array,
    bias: jax.Array | None = None,
    *,
    stride: int = 2,
    padding: int = 1,
) -> jax.Array:
    """PyTorch-semantics ConvTranspose2d (kernel 4, stride 2, padding 1 in the
    decoder, ref: /root/reference/model/change_decoder.py:32).

    x: [B,H,W,C_in], kernel: [kh,kw,C_in,C_out] (torch (Cin,Cout,kh,kw)
    transposed to spatial-major, *not* pre-flipped). Implemented as an
    input-dilated direct conv with a spatially flipped kernel, which is the
    exact algebraic equivalent and lowers to a regular XLA conv the TPU
    backend knows how to tile.
    """
    kh, kw = kernel.shape[0], kernel.shape[1]
    flipped = jnp.flip(kernel, axis=(0, 1))
    y = lax.conv_general_dilated(
        x,
        flipped.astype(x.dtype),
        window_strides=(1, 1),
        padding=((kh - 1 - padding, kh - 1 - padding), (kw - 1 - padding, kw - 1 - padding)),
        lhs_dilation=(stride, stride),
        dimension_numbers=_DN2D,
    )
    if bias is not None:
        y = y + bias.astype(y.dtype)
    return y


def linear(x: jax.Array, w: jax.Array, b: jax.Array | None = None, *, accum_dtype=jnp.float32) -> jax.Array:
    """x: [..., in], w: [in, out]."""
    y = lax.dot_general(
        x,
        w.astype(x.dtype),
        dimension_numbers=(((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=accum_dtype,
    ).astype(x.dtype)
    if b is not None:
        y = y + b.astype(y.dtype)
    return y


def swish(x: jax.Array) -> jax.Array:
    """x * sigmoid(x) (ref: pytorchvideo Swish used at /root/reference/model/x3d.py:124)."""
    return x * jax.nn.sigmoid(x)


def squeeze_excite_3d(
    x: jax.Array,
    w_reduce: jax.Array,
    b_reduce: jax.Array,
    w_expand: jax.Array,
    b_expand: jax.Array,
) -> jax.Array:
    """Squeeze-and-Excitation over (T, H, W).

    Global average pool -> 1x1x1 reduce conv -> ReLU -> 1x1x1 expand conv ->
    sigmoid -> channelwise scale (fvcore SqueezeExcitation(is_3d=True),
    ref: /root/reference/model/x3d.py:194-202). The squeeze is computed in
    fp32 — it is a long reduction and cheap relative to the conv work.

    x: [B,T,H,W,C]; w_reduce: [C, C_r]; w_expand: [C_r, C].
    """
    squeezed = jnp.mean(x.astype(jnp.float32), axis=(1, 2, 3))  # [B, C]
    h = jax.nn.relu(squeezed @ w_reduce + b_reduce)
    gate = jax.nn.sigmoid(h @ w_expand + b_expand)  # [B, C]
    return x * gate[:, None, None, None, :].astype(x.dtype)
