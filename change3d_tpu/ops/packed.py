"""Time-packed execution for the early X3D stages (eval path).

NDHWC puts C in the TPU lane dim; stage 1 of X3D-L has C in {24, 54}, so
every HBM pass wastes 2.4-5.3x of lane bandwidth on padding. Packing the
T=3 frames into the channel axis c-major — activations [B, H, W, C*T] with
feature index c*T + t — triples lane occupancy, and every op stays a *dense*
XLA conv2d/matmul (grouped convs measured 2x slower; dense banded kernels
with T^2/T-fold extra MACs measured **1.99x faster** end-to-end on the
stem+stage1 segment — see tests/manual_packed_experiment.py and
ARCHITECTURE.md):

- pointwise conv  -> block-diagonal-over-t dense kernel,
- depthwise 3x3x3 -> dense conv2d whose per-c block is the banded temporal
  matrix (zero-pad semantics encoded as zeros outside the band),
- BN scale/shift  -> per-c vectors repeated T times,
- SE              -> HW-mean, fold (C,T) -> per-c mean, gate repeated T times.

All kernel expansions are trace-friendly einsums over static banded masks,
built from the standard (checkpoint-compatible) parameter tensors at trace
time.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

# Default clip length (BCD/CC: [pre, perception, post]). Every function below
# is parameterized over t — SCD packs T=5 and BDA T=4 clips; callers in
# models/x3d.py always pass the actual T read from the activation shape.
T = 3

_DN2D = lax.conv_dimension_numbers((1, 1, 1, 1), (1, 1, 1, 1), ("NHWC", "HWIO", "NHWC"))


def pack(x: jax.Array) -> jax.Array:
    """[B, T, H, W, C] -> [B, H, W, C*T] (c-major, t minor)."""
    b, t, h, w, c = x.shape
    return x.transpose(0, 2, 3, 4, 1).reshape(b, h, w, c * t)


def unpack(x: jax.Array, t: int = T) -> jax.Array:
    """[B, H, W, C*T] -> [B, T, H, W, C]."""
    b, h, w, ct = x.shape
    return x.reshape(b, h, w, ct // t, t).transpose(0, 4, 1, 2, 3)


def conv2d_packed(x, w, *, stride: int = 1, padding: int = 0):
    # No explicit f32 output: the TPU conv units accumulate f32 natively and
    # forcing it breaks lax.conv's vjp under mixed precision (see ops/layers.py).
    return lax.conv_general_dilated(
        x, w.astype(x.dtype), (stride, stride), ((padding, padding),) * 2,
        dimension_numbers=_DN2D,
    )


def expand_pointwise(w: jax.Array, t: int = T) -> jax.Array:
    """[Cin, Cout] -> [1, 1, Cin*T, Cout*T] block-diagonal over t."""
    eye = jnp.eye(t, dtype=w.dtype)
    dense = jnp.einsum("io,tu->itou", w, eye)
    c_in, c_out = w.shape
    return dense.reshape(1, 1, c_in * t, c_out * t)


def expand_conv_spatial(w: jax.Array, t: int = T) -> jax.Array:
    """[kh, kw, Cin, Cout] (per-frame shared spatial conv) ->
    [kh, kw, Cin*T, Cout*T] block-diagonal over t."""
    eye = jnp.eye(t, dtype=w.dtype)
    dense = jnp.einsum("hwio,tu->hwitou", w, eye)
    kh, kw, c_in, c_out = w.shape
    return dense.reshape(kh, kw, c_in * t, c_out * t)


def _band_mask(k: int, t: int = T) -> jnp.ndarray:
    """[k, t_in, t_out] indicator: tap d connects t_in -> t_out when
    t_in - t_out + k//2 == d (zero-padded temporal conv semantics)."""
    m = np.zeros((k, t, t), np.float32)
    for to in range(t):
        for ti in range(t):
            d = ti - to + k // 2
            if 0 <= d < k:
                m[d, ti, to] = 1.0
    return jnp.asarray(m)


def expand_depthwise(w: jax.Array, t: int = T) -> jax.Array:
    """Depthwise 3D kernel [kt, kh, kw, C] -> dense packed 2D kernel
    [kh, kw, C*T, C*T]: block-diagonal over c, banded over t."""
    kt, kh, kw, c = w.shape
    band = _band_mask(kt, t)  # [kt, ti, to]
    per_c = jnp.einsum("dhwc,dtu->hwctu", w, band)  # [kh,kw,C,ti,to]
    eye_c = jnp.eye(c, dtype=w.dtype)
    dense = jnp.einsum("hwctu,ce->hwcteu", per_c, eye_c)  # [kh,kw,C,ti,E,to]
    return dense.reshape(kh, kw, c * t, c * t)


def repeat_per_channel(v: jax.Array, t: int = T) -> jax.Array:
    """Per-c vector [C] -> per-(c,t) vector [C*T] (c-major)."""
    return jnp.repeat(v, t)


def se_packed(x: jax.Array, w_r, b_r, w_e, b_e, t: int = T) -> jax.Array:
    """SE on packed activations: mean over (H, W) then over the t positions
    of each channel; gate broadcast back to all t."""
    b, h, w, ct = x.shape
    c = ct // t
    s = jnp.mean(x.astype(jnp.float32), axis=(1, 2)).reshape(b, c, t).mean(axis=2)
    g = jax.nn.relu(s @ w_r + b_r)
    gate = jax.nn.sigmoid(g @ w_e + b_e)  # [B, C]
    gate = jnp.repeat(gate, t, axis=1)  # [B, C*T]
    return x * gate[:, None, None, :].astype(x.dtype)
