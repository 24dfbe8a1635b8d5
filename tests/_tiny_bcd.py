"""Shared tiny-BCD helpers for the multi-process distributed test.

Both the (single-process) parent pytest process and the two spawned
jax.distributed worker processes import this module and call
``first_batch_loss`` on the same on-disk dataset: the parent computes the
reference loss over the global batch on its local mesh, the workers compute
it over a 2-process mesh with process-sharded loaders — the losses must
match, proving the multi-host data path feeds the identical global batch.
"""

import os

import numpy as np

TINY_KW = dict(
    stem_dim_out=8,
    stage_dims=(8, 16, 24, 32),
    stage_inner_dims=(18, 36, 54, 72),
    stage_depths=(1, 1, 2, 1),
    head_dim_out=64,
    num_classes=10,
)


def write_dataset(root: str, n: int = 8, hw: int = 16) -> None:
    import cv2

    rng = np.random.RandomState(0)
    for split in ("train", "test"):
        for d in ("t1", "t2", "label"):
            os.makedirs(os.path.join(root, split, d), exist_ok=True)
        for i in range(n):
            cv2.imwrite(os.path.join(root, split, "t1", f"{i}.png"),
                        rng.randint(0, 255, (hw, hw, 3), np.uint8))
            cv2.imwrite(os.path.join(root, split, "t2", f"{i}.png"),
                        rng.randint(0, 255, (hw, hw, 3), np.uint8))
            cv2.imwrite(os.path.join(root, split, "label", f"{i}.png"),
                        rng.randint(0, 2, (hw, hw), np.uint8) * 255)


def first_batch_loss(root: str, global_batch: int = 8) -> float:
    """One real BCD train step on the first (seeded) global train batch over
    the current process's mesh; returns the (replicated) loss."""
    import jax

    from change3d_tpu.data.datasets import BCDDataset
    from change3d_tpu.data.pipeline import make_data_loader, pair_collate, shard_batch
    from change3d_tpu.data.transforms import make_transform_pipelines
    from change3d_tpu.models.trainer import Change3D, Task
    from change3d_tpu.models.x3d import X3DConfig
    from change3d_tpu.parallel.mesh import make_mesh, batch_sharding, replicated_sharding
    from change3d_tpu.train.engine import create_train_state, make_train_step
    from change3d_tpu.train.optim import torch_adam

    mesh = make_mesh()
    bsh = batch_sharding(mesh)
    rsh = replicated_sharding(mesh)
    train_tf, _ = make_transform_pipelines("bcd", 16, 16)
    ds = BCDDataset(root, "train", train_tf)
    # make_data_loader auto-shards by process under jax.process_count() > 1.
    loader = make_data_loader(
        "threaded", ds, global_batch, shuffle=True, seed=7, num_workers=1,
        collate=pair_collate, drop_last=True,
    )
    local = next(iter(loader))
    batch = shard_batch(local, bsh)

    model = Change3D(task=Task.BCD, in_height=16, in_width=16,
                     backbone_cfg=X3DConfig(**TINY_KW))
    tx = torch_adam(lambda i: 1e-3, weight_decay=1e-4)
    state = create_train_state(model, tx, jax.random.PRNGKey(0), local)
    # Replicate params across the (possibly multi-host) mesh; shard_batch's
    # non-addressable branch handles the multi-process case.
    state = shard_batch(jax.tree_util.tree_map(np.asarray, state), rsh)
    step = make_train_step(model, tx, donate=False)
    _, metrics = step(state, batch, jax.random.PRNGKey(1))
    return float(jax.device_get(metrics["loss"]))
