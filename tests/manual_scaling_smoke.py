"""DP weak-scaling smoke on a virtual CPU mesh: 1 vs 2 devices.

Measures the sharded BCD train step (the production engine path: batch
sharded over the data axis, params/optimizer replicated, gradient psum)
at a FIXED per-device batch, so perfect data parallelism doubles global
samples/s from 1 -> 2 devices. On virtual CPU devices both "chips" share
the same host cores (this image has ONE), so 2x the work runs on the same
silicon and the honest ceiling for global samples/s is ~1x, not 2x. The
smoke therefore asserts the MECHANISM (shards, collectives, replicated
optimizer) works and throughput does not collapse (2dev >= 0.7 * 1dev);
real scaling needs real chips (none in this environment; see
BENCH_TRAIN.json scaling_smoke).

Run: python tests/manual_scaling_smoke.py [per_device_batch] [hw]
Prints one JSON line with samples/s at n=1 and n=2 and the efficiency.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

_INNER = "_CHANGE3D_SCALING_INNER"


def _inner(n: int, per_device_batch: int, hw: int) -> None:
    import jax

    # The image pins JAX_PLATFORMS=axon and the plugin re-asserts it during
    # init, so the env var alone is not enough (same note as tests/conftest).
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from change3d_tpu.models.trainer import Change3D, Task
    from change3d_tpu.parallel.mesh import (
        make_mesh,
        batch_sharding,
        replicated_sharding,
    )
    from change3d_tpu.train.engine import create_train_state, make_train_step
    from change3d_tpu.train.lr import poly_warmup_schedule
    from change3d_tpu.train.optim import torch_adam

    assert len(jax.devices()) == n, (n, jax.devices())
    mesh = make_mesh()
    bsh = batch_sharding(mesh)
    rsh = replicated_sharding(mesh)

    batch = per_device_batch * n
    model = Change3D(task=Task.BCD, in_height=hw, in_width=hw)
    rng = np.random.RandomState(0)
    batch_data = {
        "pre": jax.device_put(
            jnp.asarray(rng.randn(batch, hw, hw, 3), jnp.float32), bsh
        ),
        "post": jax.device_put(
            jnp.asarray(rng.randn(batch, hw, hw, 3), jnp.float32), bsh
        ),
        "label": jax.device_put(
            jnp.asarray(rng.rand(batch, hw, hw, 1) > 0.7, jnp.int32), bsh
        ),
    }
    tx = torch_adam(poly_warmup_schedule(2e-4, 80_000, 500), weight_decay=1e-4)
    state = create_train_state(model, tx, jax.random.PRNGKey(0), batch_data)
    state = jax.device_put(state, rsh)
    step = make_train_step(model, tx, donate=False)
    rng = jax.device_put(jax.random.PRNGKey(1), rsh)

    for _ in range(2):  # warmup: compile + stabilize
        state, metrics = step(state, batch_data, rng)
    jax.block_until_ready(state.variables)

    # The full X3D-L train step runs ~0.1 samples/s on this 1-core host —
    # keep the timed window small; this asserts the sharded mechanism, not
    # a rate.
    iters = 4
    t0 = time.perf_counter()
    for _ in range(iters):
        state, metrics = step(state, batch_data, rng)
    jax.block_until_ready(state.variables)
    dt = time.perf_counter() - t0
    print(json.dumps({"n": n, "samples_per_sec": round(batch * iters / dt, 2)}))


def main() -> int:
    if os.environ.get(_INNER):
        _inner(
            int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3])
        )
        return 0

    per_device_batch = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    hw = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    rates = {}
    for n in (1, 2):
        env = dict(os.environ)
        env[_INNER] = "1"
        env["JAX_PLATFORMS"] = "cpu"
        flags = [
            f
            for f in env.get("XLA_FLAGS", "").split()
            if "xla_force_host_platform_device_count" not in f
        ]
        flags.append(f"--xla_force_host_platform_device_count={n}")
        env["XLA_FLAGS"] = " ".join(flags)
        r = subprocess.run(
            [sys.executable, os.path.abspath(__file__), str(n), str(per_device_batch), str(hw)],
            env=env,
            capture_output=True,
            text=True,
            cwd=REPO,
            timeout=1200,
        )
        lines = [l for l in r.stdout.splitlines() if l.startswith("{")]
        if r.returncode != 0 or not lines:
            print(f"FAIL n={n}: rc={r.returncode}\n{r.stdout[-500:]}{r.stderr[-800:]}")
            return 1
        rates[n] = json.loads(lines[-1])["samples_per_sec"]

    eff = rates[2] / (2 * rates[1])
    rec = {
        "metric": "bcd_train_dp_weak_scaling_cpu_mesh",
        "per_device_batch": per_device_batch,
        "hw": hw,
        "samples_per_sec_1dev": rates[1],
        "samples_per_sec_2dev": rates[2],
        "weak_scaling_efficiency": round(eff, 3),
        "note": "virtual CPU devices share host cores (1 here); "
                "pass = 2dev >= 0.7 * 1dev (mechanism, not scaling)",
    }
    print(json.dumps(rec))
    return 0 if rates[2] >= 0.7 * rates[1] else 1


if __name__ == "__main__":
    raise SystemExit(main())
