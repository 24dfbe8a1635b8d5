"""Audit the bench number: XLA cost analysis + iters-scaling + rotating inputs.

If throughput is real: time scales linearly with iters, is insensitive to
which of N distinct pre-generated inputs is used, and implied FLOP/s stays
below hardware peak.
"""

import time

import jax
import jax.numpy as jnp

from change3d_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

from change3d_tpu.models.trainer import Change3D, Task

BATCH = 64


def main():
    model = Change3D(task=Task.BCD, in_height=256, in_width=256)
    pre = jnp.zeros((BATCH, 256, 256, 3), jnp.bfloat16)
    variables = model.init(jax.random.PRNGKey(0), pre, pre)

    @jax.jit
    def forward(variables, pre, post):
        out = model.apply(variables, pre, post, train=False)["change"]
        return (out > 0.5).astype(jnp.int32)

    lowered = forward.lower(variables, pre, pre)
    compiled = lowered.compile()
    try:
        ca = compiled.cost_analysis()
        ca = ca[0] if isinstance(ca, list) else ca
        flops = ca.get("flops", float("nan"))
        print(f"XLA cost analysis: {flops / 1e9:.2f} GFLOP / batch{BATCH} "
              f"= {flops / BATCH / 1e9:.3f} GFLOP/sample", flush=True)
    except Exception as e:
        print("cost_analysis unavailable:", e)
        flops = float("nan")

    # Distinct inputs, rotated.
    keys = jax.random.split(jax.random.PRNGKey(1), 8)
    inputs = [
        (jax.random.normal(k, (BATCH, 256, 256, 3), jnp.bfloat16),
         jax.random.normal(jax.random.fold_in(k, 7), (BATCH, 256, 256, 3), jnp.bfloat16))
        for k in keys
    ]
    for x, y in inputs:
        jax.block_until_ready(forward(variables, x, y))

    for iters in (20, 100):
        t0 = time.perf_counter()
        outs = []
        for i in range(iters):
            x, y = inputs[i % len(inputs)]
            outs.append(forward(variables, x, y))
        jax.block_until_ready(outs)
        dt = time.perf_counter() - t0
        rate = BATCH * iters / dt
        print(
            f"iters={iters:4d}: {dt * 1e3:8.1f} ms total, {dt / iters * 1e3:7.3f} ms/iter, "
            f"{rate:9.1f} pairs/s, implied {rate * flops / BATCH / 1e12:6.1f} TFLOP/s",
            flush=True,
        )


if __name__ == "__main__":
    main()
