"""Learning-rate schedules (ref: /root/reference/model/utils.py:84-152).

- poly: lr * (1 - iter/max_iter)^0.9 with a 200-iteration linear warmup from
  0.1*lr to lr applied only during epoch 0;
- step: lr * 0.1^(epoch // step_size);
- shrink: multiply by a factor every N epochs (CC uses x0.5 every 10,
  ref: /root/reference/scripts/train_CC.py:489-491).

Implemented as pure (step -> lr) functions usable inside the jitted update
(optax inject_hyperparams style) — the schedule is traced, not a host loop.
"""

from __future__ import annotations

import jax.numpy as jnp


def poly_warmup_schedule(base_lr: float, max_iter: int, steps_per_epoch: int, power: float = 0.9, warmup_iters: int = 200):
    """Returns f(step) -> lr replicating adjust_learning_rate('poly')."""

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        lr = base_lr * jnp.power(jnp.maximum(1.0 - step / max_iter, 0.0), power)
        epoch0 = step < steps_per_epoch
        in_warmup = epoch0 & (step < warmup_iters)
        warm = base_lr * 0.9 * (step + 1.0) / warmup_iters + 0.1 * base_lr
        return jnp.where(in_warmup, warm, lr)

    return schedule


def step_schedule(base_lr: float, steps_per_epoch: int, step_epochs: int):
    def schedule(step):
        epoch = jnp.asarray(step, jnp.int32) // steps_per_epoch
        return base_lr * jnp.power(0.1, (epoch // step_epochs).astype(jnp.float32))

    return schedule


def shrink_schedule(base_lr: float, steps_per_epoch: int, shrink_every_epochs: int = 10, factor: float = 0.5):
    """CC schedule: multiply lr by ``factor`` every ``shrink_every_epochs``."""

    def schedule(step):
        epoch = jnp.asarray(step, jnp.int32) // steps_per_epoch
        k = (epoch // shrink_every_epochs).astype(jnp.float32)
        return base_lr * jnp.power(factor, k)

    return schedule


def constant_schedule(base_lr: float):
    def schedule(step):
        del step
        return jnp.asarray(base_lr, jnp.float32)

    return schedule
