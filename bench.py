"""Benchmark: BCD eval throughput (256x256 pairs/sec) on the attached chip.

Baseline: the reference reports 0.015 s/sample BCD inference (BASELINE.md)
== ~66.7 pairs/s. Prints exactly one JSON line:
  {"metric": ..., "value": N, "unit": "pairs/sec", "vs_baseline": N}
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

BASELINE_PAIRS_PER_SEC = 1.0 / 0.015


def main():
    import jax
    import jax.numpy as jnp

    from change3d_tpu.utils.cache import enable_compilation_cache
    from change3d_tpu.models.trainer import Change3D, Task

    enable_compilation_cache()

    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    model = Change3D(task=Task.BCD, in_height=256, in_width=256)
    rng = jax.random.PRNGKey(0)
    pre = jnp.zeros((batch, 256, 256, 3), jnp.bfloat16)
    post = jnp.zeros((batch, 256, 256, 3), jnp.bfloat16)
    variables = model.init(rng, pre, post)

    @jax.jit
    def forward(variables, pre, post, salt):
        # `salt` chains iterations: inputs differ every call and the next
        # call depends on the previous output, so no dispatch-level caching
        # or deduplication can elide work.
        out = model.apply(variables, pre + salt, post, train=False)["change"]
        return (out > 0.5).astype(jnp.int32), jnp.sum(out) * 0.0

    x = jax.random.normal(jax.random.PRNGKey(1), (batch, 256, 256, 3), jnp.bfloat16)
    y = jax.random.normal(jax.random.PRNGKey(2), (batch, 256, 256, 3), jnp.bfloat16)

    salt = jnp.bfloat16(0.0)
    for _ in range(3):  # warmup / compile
        out, salt = forward(variables, x, y, salt)
    jax.block_until_ready(out)

    iters = 20
    t0 = time.perf_counter()
    for i in range(iters):
        out, salt = forward(variables, x, y, salt + i)
    jax.block_until_ready((out, salt))
    dt = time.perf_counter() - t0
    pairs_per_sec = batch * iters / dt

    print(
        json.dumps(
            {
                "metric": "bcd_eval_pairs_per_sec_256",
                "value": round(pairs_per_sec, 2),
                "unit": "pairs/sec",
                "vs_baseline": round(pairs_per_sec / BASELINE_PAIRS_PER_SEC, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
