"""Post-training int8 quantization for the eval/serving forward.

TPU MXUs run int8 x int8 -> int32 at twice the bf16 rate, and int8
activations halve the HBM bytes each conv reads — the two resources the
X3D eval forward is bound by (ARCHITECTURE.md profile). This module
implements *dynamic* symmetric quantization:

- weights: per-output-channel int8 scales, computed at trace time from the
  trained fp32 parameters (no separate quantized checkpoint; under serving
  ``embed`` mode they fold to compile-time constants);
- activations, two regimes (X3DConfig.quant_mode):
  * 'dynamic' — per-SAMPLE per-tensor scales computed on the fly (one
    max-abs reduction); no calibration dataset, batch-independent results;
  * 'static' — per-site scales recorded once by a 'calibrate' fp32 pass
    (inference.calibrate_quant_scales) and frozen into the 'quant'
    variable collection: the quantize becomes pure elementwise with a
    constant scale, which XLA fuses into the producer's epilogue — no
    runtime reduction on the hot path (out-of-range activations saturate).

Only MXU-shaped ops are quantized (pointwise 1x1x1 convs and the packed
dense banded convs of ops/packed.py). The depthwise 3x3x3 convs stay bf16:
they are VPU ops where int8 buys no issue-rate and costs accuracy.

The reference has no quantized inference at all (stock fp32 torch ops,
ref: /root/reference/model/x3d.py:109-232); this is a new serving-oriented
capability, enabled via ``X3DConfig(quantized_eval=True)`` /
``cli predict|eval|export --quantized`` and A/B-measured by
``bench.py <batch> <stages> int8``.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
from jax import lax

_DN2D = lax.conv_dimension_numbers((1, 1, 1, 1), (1, 1, 1, 1), ("NHWC", "HWIO", "NHWC"))
# Smallest representable normal keeps 0-valued tensors from dividing by 0.
_EPS = 1e-12


def quantize_weight(w: jax.Array, *, channel_axis: int = -1) -> Tuple[jax.Array, jax.Array]:
    """Symmetric per-output-channel int8 quantization of a kernel.

    Returns (int8 kernel, fp32 scale broadcast-shaped along channel_axis)
    with dequantization ``w ~= q * scale``.
    """
    w = w.astype(jnp.float32)
    axes = tuple(a for a in range(w.ndim) if a != channel_axis % w.ndim)
    amax = jnp.max(jnp.abs(w), axis=axes, keepdims=True)
    scale = jnp.maximum(amax, _EPS) / 127.0
    q = jnp.clip(jnp.round(w / scale), -127, 127).astype(jnp.int8)
    return q, scale


def quantize_act(x: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Symmetric per-sample (axis 0) per-tensor int8 quantization.

    Returns (int8 tensor, fp32 scale of shape [B, 1, ..., 1]). Per-sample
    rather than per-batch so results are batch-composition independent.
    """
    axes = tuple(range(1, x.ndim))
    amax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=axes, keepdims=True)
    scale = jnp.maximum(amax, _EPS) / 127.0
    q = jnp.clip(jnp.round(x.astype(jnp.float32) / scale), -127, 127).astype(jnp.int8)
    return q, scale


def quantize_act_static(x: jax.Array, amax) -> Tuple[jax.Array, jax.Array]:
    """Symmetric per-tensor int8 quantization with a PRE-CALIBRATED range.

    ``amax`` is a scalar recorded by a calibration pass; out-of-range
    activations saturate. Unlike :func:`quantize_act` there is no runtime
    reduction — the quantize is pure elementwise with a constant scale, so
    XLA fuses it into the producer's epilogue (zero extra HBM passes)."""
    scale = jnp.maximum(amax.astype(jnp.float32), _EPS) / 127.0
    q = jnp.clip(jnp.round(x.astype(jnp.float32) / scale), -127, 127).astype(jnp.int8)
    return q, scale


def pointwise_conv3d_int8_static(x: jax.Array, kernel: jax.Array, amax) -> jax.Array:
    """Static-scale variant of :func:`pointwise_conv3d_int8`."""
    wq, ws = quantize_weight(kernel, channel_axis=1)
    xq, xs = quantize_act_static(x, amax)
    y = lax.dot_general(
        xq, wq,
        dimension_numbers=(((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    return (y.astype(jnp.float32) * (xs * ws[0])).astype(x.dtype)


def conv2d_int8_static(
    x: jax.Array,
    kernel: jax.Array,
    amax,
    *,
    stride: int = 1,
    padding: int = 0,
) -> jax.Array:
    """Static-scale variant of :func:`conv2d_int8`."""
    wq, ws = quantize_weight(kernel, channel_axis=3)
    xq, xs = quantize_act_static(x, amax)
    y = lax.conv_general_dilated(
        xq, wq, (stride, stride), ((padding, padding),) * 2,
        dimension_numbers=_DN2D,
        preferred_element_type=jnp.int32,
    )
    return (y.astype(jnp.float32) * (xs * ws[0, 0])).astype(x.dtype)


def batch_amax(x: jax.Array) -> jax.Array:
    """Whole-tensor max-abs (fp32 scalar) — the calibration statistic."""
    return jnp.max(jnp.abs(x.astype(jnp.float32)))


def pointwise_conv3d_int8(x: jax.Array, kernel: jax.Array) -> jax.Array:
    """int8 1x1x1 conv: x [..., C_in] (batch leading), kernel [C_in, C_out].

    Quantizes the activation dynamically, runs the dot on the MXU's int8
    path (int32 accumulation), and rescales back to x.dtype. Drop-in for
    ops.layers.pointwise_conv3d on the eval path.
    """
    wq, ws = quantize_weight(kernel, channel_axis=1)  # ws: [1, C_out]
    xq, xs = quantize_act(x)
    y = lax.dot_general(
        xq, wq,
        dimension_numbers=(((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    return (y.astype(jnp.float32) * (xs * ws[0])).astype(x.dtype)


def conv2d_int8(
    x: jax.Array,
    kernel: jax.Array,
    *,
    stride: int = 1,
    padding: int = 0,
) -> jax.Array:
    """int8 dense 2D conv: x [B,H,W,C_in], kernel [kh,kw,C_in,C_out].

    Drop-in for ops.packed.conv2d_packed — the packed execution path turns
    every stage-1 op (pointwise, banded temporal/depthwise expansions) into
    exactly this dense conv shape, which is where the eval profile's
    largest single cost lives (stage1 72.7 ms of 191.6 at batch 128).
    Zero-padding is exact in int8 (0 maps to 0 symmetrically).
    """
    wq, ws = quantize_weight(kernel, channel_axis=3)  # ws: [1,1,1,C_out]
    xq, xs = quantize_act(x)
    y = lax.conv_general_dilated(
        xq, wq, (stride, stride), ((padding, padding),) * 2,
        dimension_numbers=_DN2D,
        preferred_element_type=jnp.int32,
    )
    return (y.astype(jnp.float32) * (xs * ws[0, 0])).astype(x.dtype)
