"""Train-throughput benchmark: BCD train step (256^2) on the attached chip.

Prints exactly one JSON line:
  {"metric": "bcd_train_samples_per_sec_256", "value": N,
   "unit": "samples/sec", "train_ms_per_step": M, "config": {...}}

Measurement: the train step chains through its own state (step N+1 consumes
step N's params/opt_state), so the relay cannot parallelize or dedup the
dispatches — same serial-dependency principle as bench.py.

Usage: python bench_train.py [batch] [fp32|bf16] [packed|nopacked]
Defaults (production training config, measured round 3): batch 16,
bf16 activations, packed stage 1 — see BENCH_TRAIN.json for the recorded
ladder and ARCHITECTURE.md for the defaults decision.
"""

from __future__ import annotations

import dataclasses
import json
import sys
import time

import numpy as np

STEPS = 20


def main():
    import jax
    import jax.numpy as jnp

    from change3d_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    from change3d_tpu.models.trainer import Change3D, Task
    from change3d_tpu.models.x3d import x3d_l_config
    from change3d_tpu.train.engine import create_train_state, make_train_step
    from change3d_tpu.train.lr import poly_warmup_schedule
    from change3d_tpu.train.optim import torch_adam

    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    dtype = sys.argv[2] if len(sys.argv) > 2 else "bf16"
    packed = (sys.argv[3] if len(sys.argv) > 3 else "packed") == "packed"
    compute_dtype = jnp.bfloat16 if dtype == "bf16" else None

    backbone = dataclasses.replace(
        x3d_l_config(),
        remat=True,
        packed_eval_stages=(0,) if packed else (),
        packed_train=packed,
    )
    model = Change3D(task=Task.BCD, in_height=256, in_width=256, backbone_cfg=backbone)
    rng = np.random.RandomState(0)
    batch_data = {
        "pre": jnp.asarray(rng.randn(batch, 256, 256, 3), jnp.float32),
        "post": jnp.asarray(rng.randn(batch, 256, 256, 3), jnp.float32),
        "label": jnp.asarray(rng.rand(batch, 256, 256, 1) > 0.7, jnp.int32),
    }
    tx = torch_adam(poly_warmup_schedule(2e-4, 80_000, 500), weight_decay=1e-4)
    state = create_train_state(model, tx, jax.random.PRNGKey(0), batch_data)
    step = make_train_step(model, tx, compute_dtype=compute_dtype)
    key = jax.random.PRNGKey(1)

    for _ in range(3):  # compile + warm
        state, m = step(state, batch_data, key)
    float(m["loss"])
    t0 = time.perf_counter()
    for _ in range(STEPS):
        state, m = step(state, batch_data, key)
    float(m["loss"])  # drains the serially-dependent chain
    dt = (time.perf_counter() - t0) / STEPS

    print(
        json.dumps(
            {
                "metric": "bcd_train_samples_per_sec_256",
                "value": round(batch / dt, 2),
                "unit": "samples/sec",
                "train_ms_per_step": round(dt * 1e3, 2),
                "config": {"batch": batch, "dtype": dtype, "packed": packed, "remat": True},
            }
        )
    )


if __name__ == "__main__":
    main()
