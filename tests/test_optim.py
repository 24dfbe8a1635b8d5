"""Optimizer semantics: torch-Adam parity + encoder freezing + LR schedules."""

import numpy as np
import torch

import jax
import jax.numpy as jnp
import optax

from change3d_tpu.train.optim import torch_adam, freeze_subtree
from change3d_tpu.train.lr import poly_warmup_schedule, shrink_schedule, step_schedule


def test_torch_adam_matches_torch():
    rng = np.random.RandomState(0)
    w0 = rng.randn(4, 3).astype(np.float32)
    grads_seq = [rng.randn(4, 3).astype(np.float32) for _ in range(5)]

    wt = torch.nn.Parameter(torch.from_numpy(w0.copy()))
    opt = torch.optim.Adam([wt], lr=2e-4, betas=(0.9, 0.99), eps=1e-8, weight_decay=1e-4)
    for g in grads_seq:
        opt.zero_grad()
        wt.grad = torch.from_numpy(g.copy())
        opt.step()

    tx = torch_adam(lambda step: 2e-4, weight_decay=1e-4)
    params = {"w": jnp.asarray(w0)}
    state = tx.init(params)
    for g in grads_seq:
        updates, state = tx.update({"w": jnp.asarray(g)}, state, params)
        params = optax.apply_updates(params, updates)
    np.testing.assert_allclose(np.asarray(params["w"]), wt.detach().numpy(), rtol=1e-5, atol=1e-7)


def test_torch_adam_value_clip():
    # torch clip_gradient clamps grads elementwise to +-5 before Adam
    # (ref: /root/reference/model/utils.py:481-491).
    wt = torch.nn.Parameter(torch.zeros(3))
    opt = torch.optim.Adam([wt], lr=1e-2, betas=(0.9, 0.99), eps=1e-8, weight_decay=1e-5)
    g = np.array([10.0, -7.0, 1.0], np.float32)
    wt.grad = torch.from_numpy(np.clip(g, -5, 5))
    opt.step()

    tx = torch_adam(lambda s: 1e-2, weight_decay=1e-5, grad_clip_value=5.0)
    params = {"w": jnp.zeros(3)}
    state = tx.init(params)
    updates, state = tx.update({"w": jnp.asarray(g)}, state, params)
    params = optax.apply_updates(params, updates)
    np.testing.assert_allclose(np.asarray(params["w"]), wt.detach().numpy(), rtol=1e-5, atol=1e-7)


def test_freeze_subtree():
    tx = freeze_subtree(torch_adam(lambda s: 1e-2), "encoder")
    params = {"encoder": {"w": jnp.ones(3)}, "decoder": {"w": jnp.ones(3)}}
    state = tx.init(params)
    grads = jax.tree_util.tree_map(jnp.ones_like, params)
    updates, state = tx.update(grads, state, params)
    new = optax.apply_updates(params, updates)
    np.testing.assert_array_equal(np.asarray(new["encoder"]["w"]), 1.0)
    assert not np.allclose(np.asarray(new["decoder"]["w"]), 1.0)


def test_per_subtree_lr():
    # Encoder and decoder get independent optimizers (ref train_CC.py:439-455):
    # with lr_enc = 10x lr_dec and identical unit grads through plain SGD-like
    # scaling, the encoder update must be 10x the decoder's.
    from change3d_tpu.train.optim import per_subtree_lr

    tx = per_subtree_lr(
        optax.sgd(1e-1), optax.sgd(1e-2)
    )
    params = {"encoder": {"w": jnp.ones(3)}, "decoder": {"w": jnp.ones(3)}}
    state = tx.init(params)
    grads = jax.tree_util.tree_map(jnp.ones_like, params)
    updates, state = tx.update(grads, state, params)
    new = optax.apply_updates(params, updates)
    np.testing.assert_allclose(np.asarray(new["encoder"]["w"]), 0.9, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(new["decoder"]["w"]), 0.99, rtol=1e-6)


def test_poly_warmup_schedule_matches_reference_formula():
    # ref: /root/reference/model/utils.py:130-143
    lr, max_iter, spe = 2e-4, 1000, 400
    sched = poly_warmup_schedule(lr, max_iter, spe)
    # warmup region (epoch 0, iter < 200)
    for it in (0, 100, 199):
        expected = lr * 0.9 * (it + 1) / 200 + 0.1 * lr
        np.testing.assert_allclose(float(sched(it)), expected, rtol=1e-6)
    # poly region (fp32 pow on device -> ~1e-5 rel tolerance)
    for it in (200, 399, 500, 999):
        expected = lr * (1 - it / max_iter) ** 0.9
        np.testing.assert_allclose(float(sched(it)), expected, rtol=1e-4)


def test_step_and_shrink_schedules():
    s = step_schedule(1e-3, steps_per_epoch=10, step_epochs=2)
    np.testing.assert_allclose(float(s(0)), 1e-3)
    np.testing.assert_allclose(float(s(25)), 1e-4, rtol=1e-6)
    sh = shrink_schedule(1e-4, steps_per_epoch=10, shrink_every_epochs=10, factor=0.5)
    np.testing.assert_allclose(float(sh(99)), 1e-4)
    np.testing.assert_allclose(float(sh(100)), 5e-5, rtol=1e-6)
