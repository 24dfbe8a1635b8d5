"""Stem micro-breakdown at bench shapes: spatial conv vs temporal dw conv vs
BN+ReLU, serial-chained. Run on TPU."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from change3d_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

from change3d_tpu.ops.layers import conv3d, depthwise_conv3d

B, T, HW, N = 64, 3, 256, 10
x = jax.random.normal(jax.random.PRNGKey(0), (B, T, HW, HW, 3), jnp.bfloat16)
conv_s = jax.random.normal(jax.random.PRNGKey(1), (1, 3, 3, 3, 24), jnp.bfloat16) * 0.1
conv_t = jax.random.normal(jax.random.PRNGKey(2), (5, 1, 1, 1, 24), jnp.bfloat16) * 0.1
a = jnp.ones((24,), jnp.bfloat16)
b = jnp.zeros((24,), jnp.bfloat16)


def timed(name, fn, x0):
    def chained(x0):
        def body(carry, _):
            out = fn(carry)
            bump = (jnp.sum(out.astype(jnp.float32)) * 1e-12).astype(carry.dtype)
            return carry + bump, ()

        final, _ = jax.lax.scan(body, x0, None, length=N)
        return jnp.sum(final)

    run = jax.jit(chained)
    float(run(x0)); float(run(x0))
    t0 = time.perf_counter()
    float(run(x0))
    dt = (time.perf_counter() - t0) / N * 1000
    print(f"{name:28s} {dt:7.2f} ms/iter", flush=True)


s_out = conv3d(x, conv_s, stride=(1, 1, 1), padding=(0, 1, 1))

timed("conv_s (1x3x3, 3->24)", lambda v: conv3d(v, conv_s, stride=(1, 1, 1), padding=(0, 1, 1))[..., :3], x)
timed("conv_t (dw 5x1x1, 24ch)", lambda v: depthwise_conv3d(v, conv_t, stride=(1, 1, 1), padding=(2, 0, 0)), s_out)
timed("bn+relu (24ch)", lambda v: jax.nn.relu(v * a + b), s_out)
timed("full stem chain", lambda v: jax.nn.relu(
    depthwise_conv3d(conv3d(v, conv_s, stride=(1, 1, 1), padding=(0, 1, 1)),
                     conv_t, stride=(1, 1, 1), padding=(2, 0, 0)) * a + b)[..., :3], x)
