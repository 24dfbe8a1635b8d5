"""Training-step throughput at the reference config (BCD, batch 16, 256^2).

The scan carries the full TrainState, so steps are inherently serial — no
relay inflation possible. Run on TPU.
"""

import time

import numpy as np
import jax
import jax.numpy as jnp

from change3d_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

from change3d_tpu.models.trainer import Change3D, Task
from change3d_tpu.train.engine import TrainState, create_train_state
from change3d_tpu.train.losses import bce_dice_loss
from change3d_tpu.train.lr import poly_warmup_schedule
from change3d_tpu.train.optim import torch_adam
from change3d_tpu.metrics.confusion import confusion_matrix

import optax

BATCH, HW, N = 16, 256, 8

model = Change3D(task=Task.BCD, in_height=HW, in_width=HW)
rng = np.random.RandomState(0)
batch = {
    "pre": jnp.asarray(rng.randn(BATCH, HW, HW, 3), jnp.bfloat16),
    "post": jnp.asarray(rng.randn(BATCH, HW, HW, 3), jnp.bfloat16),
    "label": jnp.asarray((rng.rand(BATCH, HW, HW, 1) > 0.7), jnp.int32),
}
tx = torch_adam(poly_warmup_schedule(2e-4, 80000, 500), weight_decay=1e-4)
state = create_train_state(model, tx, jax.random.PRNGKey(0), batch)


def train_n(state, batch, n):
    def body(state, _):
        def loss_fn(params):
            out, upd = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                batch["pre"], batch["post"], train=True, mutable=["batch_stats"],
            )
            return bce_dice_loss(out["change"], batch["label"].astype(jnp.float32)), upd["batch_stats"]

        (loss, stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return (
            TrainState(state.step + 1, params, stats, opt_state),
            loss,
        )

    state, losses = jax.lax.scan(body, state, None, length=n)
    return state, losses


run = jax.jit(train_n, static_argnums=2, donate_argnums=0)
state2, losses = run(state, batch, N)
jax.block_until_ready(losses)
state = state2
t0 = time.perf_counter()
state2, losses = run(state, batch, N)
jax.block_until_ready(losses)
dt = (time.perf_counter() - t0) / N
print(
    f"train step (b{BATCH}, {HW}^2, fp32 params/bf16 acts): {dt * 1e3:.1f} ms/step "
    f"= {BATCH / dt:.1f} samples/s; losses[{float(losses[0]):.4f}..{float(losses[-1]):.4f}]"
)
