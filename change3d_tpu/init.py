"""Parameter initializers matching PyTorch's distributions.

The reference mixes three init regimes (ref: /root/reference/model/utils.py:20-82,
/root/reference/model/trainer.py:51-54):

- torch-default conv/linear init (kaiming_uniform with a=sqrt(5)) for every
  module that is *not* passed through ``weight_init`` — i.e. the whole encoder
  (backbone, enhance fc) and ConvTranspose2d layers inside the decoders.
- ``weight_init`` (kaiming_normal, mode=fan_in, relu) for decoder Conv2d/Linear.
- uniform(-0.1, 0.1) for caption embedding / output projection
  (ref: /root/reference/model/caption_decoder.py:566-572).

These are reimplemented here as flax-style ``init(key, shape, dtype)`` closures.
All kernels in this package use the layout (..spatial.., in, out); fan_in is the
product of every axis except the last (matching torch's fan computed on
(out, in, ..spatial..) weights).
"""

from __future__ import annotations

import math

import jax.numpy as jnp
from jax import random


def _fan_in_out(shape):
    # Our kernels are (..spatial.., in, out): receptive field is every axis
    # except the last two.
    receptive = 1
    for s in shape[:-2]:
        receptive *= s
    fan_in = shape[-2] * receptive
    fan_out = shape[-1] * receptive
    return fan_in, fan_out


def torch_conv_kernel_init(key, shape, dtype=jnp.float32):
    """torch default Conv init: kaiming_uniform(a=sqrt(5)) == U(+-sqrt(1/fan_in))."""
    fan_in, _ = _fan_in_out(shape)
    bound = math.sqrt(1.0 / fan_in) if fan_in > 0 else 0.0
    return random.uniform(key, shape, dtype, -bound, bound)


def torch_conv_bias_init(fan_in):
    bound = math.sqrt(1.0 / fan_in) if fan_in > 0 else 0.0

    def init(key, shape, dtype=jnp.float32):
        return random.uniform(key, shape, dtype, -bound, bound)

    return init


def kaiming_normal_relu_init(key, shape, dtype=jnp.float32):
    """weight_init semantics: kaiming_normal(mode=fan_in, nonlinearity=relu).

    ref: /root/reference/model/utils.py:42-43 — std = sqrt(2 / fan_in).
    """
    fan_in, _ = _fan_in_out(shape)
    std = math.sqrt(2.0 / fan_in) if fan_in > 0 else 0.0
    return std * random.normal(key, shape, dtype)


def uniform_init(scale):
    def init(key, shape, dtype=jnp.float32):
        return random.uniform(key, shape, dtype, -scale, scale)

    return init


def xavier_uniform_init(key, shape, dtype=jnp.float32):
    fan_in, fan_out = _fan_in_out(shape)
    bound = math.sqrt(6.0 / (fan_in + fan_out))
    return random.uniform(key, shape, dtype, -bound, bound)


def zeros_init(key, shape, dtype=jnp.float32):
    del key
    return jnp.zeros(shape, dtype)


def ones_init(key, shape, dtype=jnp.float32):
    del key
    return jnp.ones(shape, dtype)


def normal_init(key, shape, dtype=jnp.float32):
    return random.normal(key, shape, dtype)
