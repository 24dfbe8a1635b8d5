"""Train-throughput benchmark: BCD train step (256^2) on the attached chip.

Prints exactly one JSON line:
  {"metric": "bcd_train_samples_per_sec_256", "value": N,
   "unit": "samples/sec", "train_ms_per_step": M, "config": {...}}

Measurement: STEPS train steps run inside ONE jitted lax.scan whose carry is
the train state (step N+1 consumes step N's params/opt_state — serial by
data dependency), timed as a single dispatch + one value fetch, best of 3
windows. One dispatch per window matters on this relay: a Python loop of
per-step dispatches stalls for minutes when the relay is congested, which
is fleet noise, not chip time (same principle as bench.py).

Usage: python bench_train.py [batch] [fp32|bf16] [packed|nopacked] [remat|noremat] [bcd|cc]
Defaults (production training config, measured round 3): batch 16,
bf16 activations, packed stage 1, remat on — see BENCH_TRAIN.json for the
recorded ladder and ARCHITECTURE.md for the defaults decision. remat trades
backward-pass recompute FLOPs for activation memory; `noremat` A/Bs whether
that trade pays at batches that fit HBM without it.

The `cc` task benches the caption train step at the reference CC protocol
(ref: /root/reference/scripts/train_CC.py — batch 32, 256² pairs, 52-token
captions, 3-layer/192-dim decoder over the X3D encoder); pass batch 32 and
`fp32` to match the CC production defaults (CC keeps the reference-tuned
fp32 schedule — BENCH_TRAIN.json `defaults_decision`).
"""

from __future__ import annotations

import dataclasses
import json
import sys
import time

import numpy as np

STEPS = 20


def main():
    from bench import probe_backend

    err = probe_backend()
    if err:
        print(json.dumps({
            "metric": "bcd_train_samples_per_sec_256",
            "value": 0.0,
            "unit": "samples/sec",
            "error": err + " — committed floor is 90 samples/s "
                     "(tests/manual_bench_floor.py); re-run when the TPU "
                     "link is healthy",
        }))
        return
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
    remat = (sys.argv[4] if len(sys.argv) > 4 else "remat") == "remat"
    task = sys.argv[5] if len(sys.argv) > 5 else "bcd"
    compute_dtype = jnp.bfloat16 if dtype == "bf16" else None

    backbone = dataclasses.replace(
        x3d_l_config(),
        remat=remat,
        packed_eval_stages=(0,) if packed else (),
        packed_train=packed,
    )
    rng = np.random.RandomState(0)
    if task == "cc":
        from change3d_tpu.models.caption_decoder import MAX_CAPTION_LEN

        # LEVIR-CC protocol: vocab ~500 ids, 52-token padded captions with
        # realistic lengths (mean ~10 words), 192-dim 3-layer decoder.
        model = Change3D(
            task=Task.CC, in_height=256, in_width=256, backbone_cfg=backbone,
            vocab_size=500, embed_dim=192, num_heads=8, num_layers=3,
        )
        lengths = rng.randint(6, 16, size=(batch,)).astype(np.int32)
        captions = np.zeros((batch, MAX_CAPTION_LEN), np.int32)
        for b, n in enumerate(lengths):
            captions[b, :n] = rng.randint(4, 500, size=(n,))
        batch_data = {
            "pre": jnp.asarray(rng.randn(batch, 256, 256, 3), jnp.float32),
            "post": jnp.asarray(rng.randn(batch, 256, 256, 3), jnp.float32),
            "caption": jnp.asarray(captions),
            "length": jnp.asarray(lengths),
        }
    else:
        model = Change3D(
            task=Task.BCD, in_height=256, in_width=256, backbone_cfg=backbone
        )
        batch_data = {
            "pre": jnp.asarray(rng.randn(batch, 256, 256, 3), jnp.float32),
            "post": jnp.asarray(rng.randn(batch, 256, 256, 3), jnp.float32),
            "label": jnp.asarray(rng.rand(batch, 256, 256, 1) > 0.7, jnp.int32),
        }
    tx = torch_adam(poly_warmup_schedule(2e-4, 80_000, 500), weight_decay=1e-4)
    state = create_train_state(model, tx, jax.random.PRNGKey(0), batch_data)
    step = make_train_step(model, tx, donate=False, compute_dtype=compute_dtype)
    key = jax.random.PRNGKey(1)

    def chained(state, batch, key, n):
        def body(carry, _):
            new_state, _metrics = step(carry, batch, key)
            return new_state, ()

        final, _ = jax.lax.scan(body, state, None, length=n)
        # The fetched value MUST depend on the full update chain: fetching
        # final.step alone (a counter that depends only on n) lets XLA
        # dead-code-eliminate every gradient/optimizer op — observed as a
        # fantasy 13,608 samples/s (1.18 ms/step) on 2026-08-18. Summing a
        # param leaf forces the whole serial chain to execute.
        leaf = jax.tree_util.tree_leaves(final.params)[0]
        return final.step + jnp.sum(leaf.astype(jnp.float32))

    run = jax.jit(chained, static_argnums=3)
    float(run(state, batch_data, key, 2))  # compile (short chain)
    float(run(state, batch_data, key, STEPS))  # second warmup at full length
    # Best of 3 timed windows; each window is one dispatch + one fetch.
    dt = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        float(run(state, batch_data, key, STEPS))
        dt = min(dt, (time.perf_counter() - t0) / STEPS)

    print(
        json.dumps(
            {
                "metric": f"{task}_train_samples_per_sec_256",
                "value": round(batch / dt, 2),
                "unit": "samples/sec",
                "train_ms_per_step": round(dt * 1e3, 2),
                "config": {"batch": batch, "dtype": dtype, "packed": packed, "remat": remat, "task": task},
            }
        )
    )


if __name__ == "__main__":
    main()
