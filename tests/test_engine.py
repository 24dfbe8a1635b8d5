"""End-to-end engine smoke tests: every task trains + evaluates on a sharded
8-virtual-device CPU mesh (the fake-backend analog, SURVEY.md §4)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from change3d_tpu.models.trainer import Change3D, Task
from change3d_tpu.models.x3d import X3DConfig
from change3d_tpu.parallel.mesh import make_mesh, batch_sharding, replicated_sharding
from change3d_tpu.train.engine import create_train_state, make_train_step, make_eval_step
from change3d_tpu.train.lr import poly_warmup_schedule
from change3d_tpu.train.optim import torch_adam
from change3d_tpu.data.pipeline import shard_batch

H = W = 16
B = 8


def _batch(task: str, rng: np.random.RandomState):
    batch = {
        "pre": rng.randn(B, H, W, 3).astype(np.float32),
        "post": rng.randn(B, H, W, 3).astype(np.float32),
    }
    if task == "bcd":
        batch["label"] = (rng.rand(B, H, W, 1) > 0.7).astype(np.int32)
    elif task == "scd":
        l1 = rng.randint(0, 6, (B, H, W))
        l2 = rng.randint(0, 6, (B, H, W))
        ch = (rng.rand(B, H, W) > 0.6).astype(np.int64)
        batch["label"] = np.stack([l1, l2, ch], -1).astype(np.int32)
    elif task == "bda":
        loc = (rng.rand(B, H, W) > 0.6).astype(np.int64)
        cls = rng.randint(0, 5, (B, H, W))
        batch["label"] = np.stack([loc, cls], -1).astype(np.int32)
    elif task == "cc":
        batch["caption"] = np.concatenate(
            [np.full((B, 1), 2), rng.randint(4, 20, (B, 11))], axis=1
        ).astype(np.int32)
        batch["length"] = rng.randint(5, 12, (B,)).astype(np.int32)
    return batch


TINY_CFG = X3DConfig(
    stem_dim_out=8,
    stage_dims=(8, 16, 24, 32),
    stage_inner_dims=(18, 36, 54, 72),
    stage_depths=(1, 1, 2, 1),
    head_dim_out=64,
    num_classes=10,
)


def _model(task: str) -> Change3D:
    kwargs = dict(task=Task(task), in_height=H, in_width=W, backbone_cfg=TINY_CFG)
    if task == "scd":
        kwargs["num_classes"] = 6
    elif task == "bda":
        kwargs["num_classes"] = 5
    elif task == "cc":
        kwargs.update(vocab_size=30, embed_dim=32, num_heads=4, num_layers=2)
    return Change3D(**kwargs)


@pytest.mark.parametrize("task", ["bcd", "scd", "bda", "cc"])
def test_train_and_eval_step_sharded(task):
    rng = np.random.RandomState(0)
    mesh = make_mesh()
    assert mesh.shape["data"] == 8
    bsh = batch_sharding(mesh)
    rsh = replicated_sharding(mesh)

    model = _model(task)
    tx = torch_adam(poly_warmup_schedule(2e-4, 100, 10), weight_decay=1e-4,
                    grad_clip_value=5.0 if task == "cc" else None)
    batch = _batch(task, rng)
    state = create_train_state(model, tx, jax.random.PRNGKey(0), batch)
    state = jax.device_put(state, rsh)
    sharded = shard_batch(batch, bsh)

    train_step = make_train_step(model, tx)
    key = jax.random.PRNGKey(1)
    losses = []
    for i in range(3):
        state, metrics = train_step(state, sharded, key)
        losses.append(float(metrics["loss"]))
    assert np.all(np.isfinite(losses)), losses
    # Optimizing on a fixed batch must reduce the loss.
    assert losses[-1] < losses[0], losses

    eval_step = make_eval_step(model)
    metrics = jax.device_get(eval_step(state, sharded))
    assert np.isfinite(metrics["loss"])
    if task == "bcd":
        assert metrics["cm"].shape == (2, 2)
        assert metrics["cm"].sum() == B * H * W
    elif task == "scd":
        assert metrics["cm"].shape == (6, 6)
        assert metrics["cm"].sum() == 2 * B * H * W
    elif task == "bda":
        assert metrics["loc_cm"].sum() == B * H * W
        # cls cm counts only loc>0 pixels
        label = jax.device_get(sharded["label"])
        assert metrics["cls_cm"].sum() == (label[..., 0] > 0).sum()
    elif task == "cc":
        assert 0.0 <= float(metrics["top1"]) <= 100.0


def test_bf16_training_step():
    # Regression: lax.conv's vjp rejects mixed dtypes when convs force f32
    # outputs; the bf16 compute path must train end-to-end.
    import jax.numpy as jnp

    rng = np.random.RandomState(3)
    model = _model("bcd")
    tx = torch_adam(poly_warmup_schedule(1e-3, 100, 10), weight_decay=1e-4)
    batch = _batch("bcd", rng)
    state = create_train_state(model, tx, jax.random.PRNGKey(0), batch)
    step = make_train_step(model, tx, donate=False, compute_dtype=jnp.bfloat16)
    losses = []
    for _ in range(3):
        state, metrics = step(state, batch, jax.random.PRNGKey(1))
        losses.append(float(metrics["loss"]))
    assert np.all(np.isfinite(losses))
    assert losses[-1] < losses[0]


def test_bn_stats_update_during_training():
    rng = np.random.RandomState(1)
    model = _model("bcd")
    tx = torch_adam(poly_warmup_schedule(1e-4, 100, 10))
    batch = _batch("bcd", rng)
    state = create_train_state(model, tx, jax.random.PRNGKey(0), batch)
    before = state.batch_stats["encoder"]["x3d"]["stem"]["bn"]["mean"]
    train_step = make_train_step(model, tx, donate=False)
    new_state, _ = train_step(state, batch, jax.random.PRNGKey(1))
    after = new_state.batch_stats["encoder"]["x3d"]["stem"]["bn"]["mean"]
    assert not np.allclose(np.asarray(before), np.asarray(after))
