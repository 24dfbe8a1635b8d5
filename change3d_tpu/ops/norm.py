"""Batch normalization with exact torch BatchNorm3d semantics.

The X3D-L checkpoint was trained with torch BN (momentum=0.1, eps=1e-5,
ref: /root/reference/model/x3d.py:555-557), and fine-tune parity requires the
same running-stat update rule, which differs from flax.linen.BatchNorm in two
ways:

- torch's ``momentum`` is the weight of the *new* statistic
  (running = (1 - m) * running + m * batch); flax's is the decay of the old.
- torch updates running_var with the *unbiased* batch variance while it
  normalizes with the biased one.

Statistics are always computed in fp32 regardless of activation dtype.
Normalization is expressed as a fused scale/shift (y = x * a + b with
a = gamma * rsqrt(var + eps)) so XLA folds it into neighboring elementwise
work; for pure inference ``fold_bn_into_conv`` removes it entirely.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import flax.linen as nn


class BatchNorm(nn.Module):
    """Channel-last batch norm over all leading axes (B, T, H, W).

    Collections: 'params' holds scale/bias, 'batch_stats' holds mean/var.
    ``use_running_average=True`` gives eval semantics.
    """

    momentum: float = 0.1
    eps: float = 1e-5

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        *,
        use_running_average: bool,
        return_folded: bool = False,
        packed_t: int = 0,
    ):
        """``return_folded=True`` declares the same variables but returns the
        eval-mode per-channel (a, b) fold vectors instead of normalizing x
        (x supplies only the channel count) — used by fused Pallas blocks.

        ``packed_t=T`` treats x as time-packed [..., C*T] (c-major): batch
        statistics are per-c over (batch, space, t), and the scale/shift
        vectors are repeated T times — numerically identical to normalizing
        the unpacked [B,T,...,C] tensor."""
        c = x.shape[-1] // packed_t if packed_t else x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        ra_mean = self.variable("batch_stats", "mean", lambda: jnp.zeros((c,), jnp.float32))
        ra_var = self.variable("batch_stats", "var", lambda: jnp.ones((c,), jnp.float32))

        if return_folded:
            a = scale * jax.lax.rsqrt(ra_var.value + self.eps)
            return a, bias - ra_mean.value * a

        if use_running_average:
            mean, var = ra_mean.value, ra_var.value
        else:
            x32 = x.astype(jnp.float32)
            if packed_t:
                x32 = x32.reshape(x32.shape[:-1] + (c, packed_t))
                reduce_axes = tuple(range(x32.ndim - 2)) + (x32.ndim - 1,)
            else:
                reduce_axes = tuple(range(x.ndim - 1))
            n = x.size // c
            mean = jnp.mean(x32, axis=reduce_axes)
            # Biased variance for normalization (torch semantics).
            var = jnp.mean(jnp.square(x32), axis=reduce_axes) - jnp.square(mean)
            var = jnp.maximum(var, 0.0)
            if not self.is_initializing():
                unbiased = var * (n / max(n - 1, 1))
                ra_mean.value = (1.0 - self.momentum) * ra_mean.value + self.momentum * mean
                ra_var.value = (1.0 - self.momentum) * ra_var.value + self.momentum * unbiased

        # a/b are tiny [C] vectors computed in fp32, then the scale/shift runs
        # in the activation dtype so XLA fuses it into the neighboring conv
        # instead of emitting full-tensor f32 convert passes (for fp32
        # activations this is numerically identical to the fp32 path).
        a = scale * jax.lax.rsqrt(var + self.eps)
        b = bias - mean * a
        if packed_t:
            a = jnp.repeat(a, packed_t)
            b = jnp.repeat(b, packed_t)
        return x * a.astype(x.dtype) + b.astype(x.dtype)


def batch_norm_inference(x: jax.Array, scale, bias, mean, var, eps: float = 1e-5) -> jax.Array:
    """Stateless eval-mode BN for folded/functional paths."""
    a = scale * jax.lax.rsqrt(var + eps)
    b = bias - mean * a
    return x * a.astype(x.dtype) + b.astype(x.dtype)


def fold_bn_into_conv(kernel: jax.Array, scale, bias, mean, var, eps: float = 1e-5):
    """Fold eval-mode BN into the preceding conv's kernel (+ produce a bias).

    kernel layout (..spatial.., in, out): the BN channel axis is the kernel's
    last axis. Returns (folded_kernel, folded_bias). Available for offline
    weight transforms; the live eval path does NOT need it — with weights
    closed over at jit time (``--embed``) XLA constant-folds the BN
    scale/shift into the conv epilogue, measured at parity (ARCHITECTURE.md).
    """
    a = (scale * jax.lax.rsqrt(var + eps)).astype(kernel.dtype)
    b = (bias - mean * scale * jax.lax.rsqrt(var + eps)).astype(kernel.dtype)
    return kernel * a, b
