"""Per-segment eval latency: time cumulative prefixes of the BCD forward
(batch 64, 256², bf16, packed stage 1) with the serial-chain method; segment
cost = difference of consecutive prefix times.

Run on TPU: python tests/manual_prefix_timing.py
"""

import dataclasses
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from change3d_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

from change3d_tpu.models.trainer import Change3D, Task
from change3d_tpu.models.x3d import block_runs_packed, x3d_l_config

BATCH = int(sys.argv[1]) if len(sys.argv) > 1 else 64
N = 10
backbone = dataclasses.replace(x3d_l_config(), packed_eval_stages=(0,))
model = Change3D(task=Task.BCD, in_height=256, in_width=256, backbone_cfg=backbone)
pre = jax.random.normal(jax.random.PRNGKey(1), (BATCH, 256, 256, 3), jnp.bfloat16)
post = jax.random.normal(jax.random.PRNGKey(2), (BATCH, 256, 256, 3), jnp.bfloat16)
variables = model.init(jax.random.PRNGKey(0), pre, post)


def prefix_fn(k):
    """Forward through blocks 0..k-1 (with enhance+taps); k=5 -> full model."""

    def fwd(variables, x, post):
        def run(mdl):
            if k == 5:
                return mdl(x, post, train=False)["change"]
            enc = mdl.encoder
            cfg = enc.cfg or x3d_l_config()
            h = enc._stack_frames(x, post)
            packed_now = 0
            for i in range(k):
                runs = block_runs_packed(cfg, i, False)
                h = enc.x3d.run_block(i, h, train=False, packed_in=packed_now, keep_packed=runs)
                packed_now = h.shape[1] if not runs else (x.shape[1] if False else 3)
                packed_now = 3 if runs else 0
                h = enc._enhance(h, i, packed_now)
            return h

        return nn_apply(variables, run)

    import flax.linen as nn

    def nn_apply(variables, fn):
        return nn.apply(fn, model)(variables)

    def chained(variables, x, post):
        def body(carry, _):
            out = fwd(variables, carry, post)
            bump = (jnp.sum(out.astype(jnp.float32)) * 1e-12).astype(carry.dtype)
            return carry + bump, ()

        final, _ = jax.lax.scan(body, x, None, length=N)
        return jnp.sum(final)

    return jax.jit(chained)


names = ["stack only->stem", "+stage1(packed)", "+stage2", "+stage3", "full(+decoder)"]
prev = 0.0
for k, name in zip((1, 2, 3, 4, 5), names):
    run = prefix_fn(k)
    float(run(variables, pre, post))
    float(run(variables, pre, post))
    t0 = time.perf_counter()
    float(run(variables, pre, post))
    dt = (time.perf_counter() - t0) / N * 1000
    print(f"{name:20s} cumulative {dt:7.2f} ms/iter  segment {dt - prev:7.2f} ms", flush=True)
    prev = dt
