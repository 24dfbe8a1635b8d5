"""Pallas TPU kernel: fused X3D bottleneck res-block (inference).

One X3D bottleneck block in XLA is ~6 full-tensor HBM passes
(conv_a, BN+ReLU, depthwise 3x3x3, BN(+SE), swish, conv_c, BN, residual;
see ARCHITECTURE.md "Where the time goes"). For stride-1 blocks whose inner
tensor fits VMEM (stages 3-4: 32^2 x 216ch, 16^2 x 432ch), this kernel runs
the whole block per batch element inside VMEM:

  HBM traffic = read x once + write out once (+ tiny weights)

Math (eval-mode, BN folded to per-channel scale/shift a,b):
  xa = relu(dot(x, Wa) * a_a + b_a)             # MXU [THW,Cin]x[Cin,Ci]
  xd = depthwise3x3x3(xa)                       # 27 shifted VPU FMAs
  xb = xd * a_b + b_b
  g  = sigmoid(relu(mean_thw(xb) @ Wse1 + bse1) @ Wse2 + bse2)   # optional
  xs = swish(xb * g)
  y  = relu(dot(xs, Wc) * a_c + b_c + x)        # residual (Cin == Cout)

Semantics identical to X3DBottleneck/X3DResBlock with use_running_average
(verified in tests against the XLA composition). Inference-only: no VJP —
training keeps the XLA path.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(x_ref, wa_ref, aa_ref, ba_ref, wdw_ref, ab_ref, bb_ref,
            wse1_ref, bse1_ref, wse2_ref, bse2_ref, wc_ref, ac_ref, bc_ref,
            out_ref, *, has_se: bool):
    x = x_ref[0]  # [T, H, W, Cin] bf16
    t, h, w, c_in = x.shape
    c_inner = wa_ref.shape[1]
    thw = t * h * w

    # conv_a (MXU) + BN + ReLU
    xa = jnp.dot(x.reshape(thw, c_in), wa_ref[:], preferred_element_type=jnp.float32)
    xa = jnp.maximum(xa * aa_ref[:] + ba_ref[:], 0.0).astype(x.dtype)
    xa = xa.reshape(t, h, w, c_inner)

    # depthwise 3x3x3: 27 shifted FMAs over a zero-padded copy (VPU)
    xp = jnp.pad(xa, ((1, 1), (1, 1), (1, 1), (0, 0)))
    acc = jnp.zeros((t, h, w, c_inner), jnp.float32)
    for dt in range(3):
        for dy in range(3):
            for dx in range(3):
                tap = wdw_ref[dt, dy, dx]  # [Ci]
                acc += xp[dt : dt + t, dy : dy + h, dx : dx + w].astype(jnp.float32) * tap

    xb = acc * ab_ref[:] + bb_ref[:]  # f32 [T,H,W,Ci]

    if has_se:
        s = jnp.mean(xb, axis=(0, 1, 2))  # [Ci]
        g1 = jnp.maximum(jnp.dot(s, wse1_ref[:], preferred_element_type=jnp.float32) + bse1_ref[:], 0.0)
        gate = jax.nn.sigmoid(jnp.dot(g1, wse2_ref[:], preferred_element_type=jnp.float32) + bse2_ref[:])
        xb = xb * gate

    xs = (xb * jax.nn.sigmoid(xb)).astype(x.dtype)  # swish

    # conv_c (MXU) + BN + residual + ReLU
    xc = jnp.dot(xs.reshape(thw, c_inner), wc_ref[:], preferred_element_type=jnp.float32)
    xc = xc * ac_ref[:] + bc_ref[:]
    y = jnp.maximum(xc.reshape(t, h, w, c_in) + x.astype(jnp.float32), 0.0)
    out_ref[0] = y.astype(x.dtype)


def fused_bottleneck_block(
    x: jax.Array,
    w_a: jax.Array, a_a: jax.Array, b_a: jax.Array,
    w_dw: jax.Array, a_b: jax.Array, b_b: jax.Array,
    w_c: jax.Array, a_c: jax.Array, b_c: jax.Array,
    se: Optional[tuple] = None,
    *,
    interpret: bool = False,
) -> jax.Array:
    """x: [B,T,H,W,C]; w_a: [C,Ci]; w_dw: [3,3,3,Ci]; w_c: [Ci,C];
    a_*/b_* folded BN vectors (f32); se: (w1 [Ci,Cr], b1, w2 [Cr,Ci], b2).

    Stride-1, dim-preserving blocks only (every non-first block of a stage).
    """
    b, t, h, w, c = x.shape
    c_inner = w_a.shape[1]
    has_se = se is not None
    # Mosaic targets TPU; on CPU (tests, virtual meshes) run interpreted.
    interpret = interpret or jax.default_backend() == "cpu"
    if not has_se:
        # dummy SE operands keep one kernel signature
        se = (
            jnp.zeros((c_inner, 8), jnp.float32), jnp.zeros((8,), jnp.float32),
            jnp.zeros((8, c_inner), jnp.float32), jnp.zeros((c_inner,), jnp.float32),
        )
    wse1, bse1, wse2, bse2 = se

    full = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)
    kernel = functools.partial(_kernel, has_se=has_se)
    flops = 2 * b * t * h * w * c_inner * (2 * c + 27)
    return pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, t, h, w, c), lambda i: (i, 0, 0, 0, 0), memory_space=pltpu.VMEM),
            full(), full(), full(), full(), full(), full(),
            full(), full(), full(), full(),
            full(), full(), full(),
        ],
        out_specs=pl.BlockSpec((1, t, h, w, c), lambda i: (i, 0, 0, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=flops, bytes_accessed=2 * x.size * x.dtype.itemsize, transcendentals=x.size
        ),
        interpret=interpret,
    )(
        x,
        w_a.astype(x.dtype), a_a.astype(jnp.float32), b_a.astype(jnp.float32),
        w_dw.astype(jnp.float32), a_b.astype(jnp.float32), b_b.astype(jnp.float32),
        wse1.astype(jnp.float32), bse1.astype(jnp.float32),
        wse2.astype(jnp.float32), bse2.astype(jnp.float32),
        w_c.astype(x.dtype), a_c.astype(jnp.float32), b_c.astype(jnp.float32),
    )
