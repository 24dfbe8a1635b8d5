"""Truncation ablation: chained-serial time of X3D prefixes (stem..stageK).

Attributes real time to stages; guides optimization. Run on TPU.
"""

import time

import jax
import jax.numpy as jnp

from change3d_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

from change3d_tpu.models.x3d import X3D, x3d_l_config

B = 64
cfg = x3d_l_config()
model = X3D(cfg)
x0 = jax.random.normal(jax.random.PRNGKey(0), (B, 3, 256, 256, 3), jnp.bfloat16)
variables = model.init(jax.random.PRNGKey(1), jnp.zeros((1, 3, 16, 16, 3), jnp.bfloat16))


def prefix_fn(k):
    def f(variables, x):
        def run(mdl, x):
            for i in range(k):
                x = mdl.run_block(i, x, train=False)
            return x

        return model.apply(variables, x, method=run)

    return f


def timed(k, n=10):
    fwd = prefix_fn(k)

    def chained(variables, x):
        def body(carry, _):
            out = fwd(variables, carry)
            bump = (jnp.sum(out) * 1e-12).astype(carry.dtype)
            return carry + bump, ()

        final, _ = jax.lax.scan(body, x, None, length=n)
        return jnp.sum(final)

    run = jax.jit(chained)
    float(run(variables, x0))
    t0 = time.perf_counter()
    float(run(variables, x0))
    dt = (time.perf_counter() - t0) / n
    print(f"blocks 0..{k - 1}: {dt * 1e3:8.2f} ms/iter", flush=True)
    return dt


prev = 0.0
for k in range(1, 6):
    dt = timed(k)
    print(f"  -> marginal block {k - 1}: {(dt - prev) * 1e3:8.2f} ms", flush=True)
    prev = dt
