"""Multi-host input sharding (single-process emulation) + loader parity.

The threaded DataLoader's contract under ``num_shards``/``shard_index``: every
process computes the same global index order but decodes only its contiguous
slice of each batch, and concatenating the per-shard batches in shard order
reproduces the single-process global batch sample-for-sample (augmentation
rng is seeded by GLOBAL slot). tests/test_distributed.py drives the same
contract through a real two-process jax.distributed train step.
"""

import numpy as np
import pytest

from change3d_tpu.data.datasets import BCDDataset
from change3d_tpu.data.pipeline import DataLoader, make_data_loader, pair_collate
from change3d_tpu.data.transforms import make_transform_pipelines

from tests.test_data import bcd_root  # noqa: F401  (fixture)


def _loaders(ds, num_shards, **kw):
    return [
        DataLoader(ds, 4, num_shards=num_shards, shard_index=i, **kw)
        for i in range(num_shards)
    ]


def test_sharded_train_batches_reassemble_global(bcd_root):  # noqa: F811
    train_tf, _ = make_transform_pipelines("bcd", 16, 16)
    ds = BCDDataset(bcd_root, "train", train_tf)
    kw = dict(shuffle=True, seed=7, num_workers=1, collate=pair_collate, drop_last=True)
    full = list(DataLoader(ds, 4, **kw))
    s0, s1 = (list(l) for l in _loaders(ds, 2, **kw))
    assert len(full) == len(s0) == len(s1) == 1
    for g, a, b in zip(full, s0, s1):
        for k in ("pre", "post", "label"):
            np.testing.assert_array_equal(g[k], np.concatenate([a[k], b[k]]))


def test_sharded_eval_valid_mask_slices_global_positions(bcd_root):  # noqa: F811
    _, eval_tf = make_transform_pipelines("bcd", 16, 16)
    ds = BCDDataset(bcd_root, "test", eval_tf)  # 5 samples
    kw = dict(num_workers=1, collate=pair_collate, pad_final=True)
    full = list(DataLoader(ds, 4, **kw))
    s0, s1 = (list(l) for l in _loaders(ds, 2, **kw))
    assert len(full) == len(s0) == len(s1) == 2
    for g, a, b in zip(full, s0, s1):
        np.testing.assert_array_equal(g["valid"], np.concatenate([a["valid"], b["valid"]]))
        np.testing.assert_array_equal(g["pre"], np.concatenate([a["pre"], b["pre"]]))
    # Final global batch: 1 real sample + 3 padded.
    np.testing.assert_array_equal(s0[1]["valid"], [True, False])
    np.testing.assert_array_equal(s1[1]["valid"], [False, False])


def test_sharded_loader_rejects_indivisible_batch(bcd_root):  # noqa: F811
    _, eval_tf = make_transform_pipelines("bcd", 16, 16)
    ds = BCDDataset(bcd_root, "test", eval_tf)
    with pytest.raises(ValueError, match="divide"):
        DataLoader(ds, 3, num_shards=2, collate=pair_collate)


def test_sharded_loader_rejects_ragged_final_batch_mode(bcd_root):  # noqa: F811
    # drop_last=False + pad_final=False would slice the short final batch
    # ragged across processes (empty/unequal local rows) — refused upfront.
    _, eval_tf = make_transform_pipelines("bcd", 16, 16)
    ds = BCDDataset(bcd_root, "test", eval_tf)
    with pytest.raises(ValueError, match="ragged"):
        DataLoader(ds, 4, num_shards=2, shard_index=0, drop_last=False,
                   collate=pair_collate)


def test_grain_sharded_loader_partitions_records(bcd_root):  # noqa: F811
    pytest.importorskip("grain")
    from change3d_tpu.data.grain_pipeline import GrainDataLoader

    _, eval_tf = make_transform_pipelines("bcd", 16, 16)
    ds = BCDDataset(bcd_root, "test", eval_tf)  # 5 samples

    loaders = [
        GrainDataLoader(
            ds, 4, shuffle=False, num_workers=0, collate=pair_collate,
            drop_last=True, num_shards=2, shard_index=i,
        )
        for i in range(2)
    ]
    batches = [list(l) for l in loaders]
    # Each shard draws from its disjoint half (drop_remainder): 2 records
    # each -> one local batch of 2, and no sample appears on both shards.
    seen = []
    for bs in batches:
        assert len(bs) == 1 and bs[0]["pre"].shape[0] == 2
        seen.append(bs[0]["pre"])
    flat = np.concatenate(seen).reshape(4, -1)
    assert len({tuple(r) for r in flat}) == 4

    # pad_final + sharding (multi-host padded eval) is supported since the
    # _sharded_padded_batches path landed; full semantics are covered by
    # test_grain_pipeline.test_grain_loader_sharded_pad_final_matches_threaded.
    padded = GrainDataLoader(ds, 4, pad_final=True, num_shards=2, shard_index=0,
                             num_workers=0, collate=pair_collate)
    assert sum(1 for _ in padded) == 2  # ceil(5/4) global batches


def test_threaded_and_grain_loaders_agree_without_augmentation(bcd_root):  # noqa: F811
    # Eval mode (no shuffle, rng-independent transforms): the two loader
    # backends must yield identical batch streams.
    pytest.importorskip("grain")
    _, eval_tf = make_transform_pipelines("bcd", 16, 16)
    ds = BCDDataset(bcd_root, "test", eval_tf)
    a = list(make_data_loader("threaded", ds, 2, num_workers=1, collate=pair_collate,
                              pad_final=True))
    b = list(make_data_loader("grain", ds, 2, num_workers=0, collate=pair_collate,
                              pad_final=True))
    assert len(a) == len(b)
    for x, y in zip(a, b):
        for k in ("pre", "post", "label", "valid"):
            np.testing.assert_array_equal(x[k], y[k])


def test_make_data_loader_rejects_unknown_kind(bcd_root):  # noqa: F811
    _, eval_tf = make_transform_pipelines("bcd", 16, 16)
    ds = BCDDataset(bcd_root, "test", eval_tf)
    with pytest.raises(ValueError, match="unknown loader kind"):
        make_data_loader("torch", ds, 2)


def test_grain_epoch_seed_mixing(bcd_root):  # noqa: F811
    # seed s epoch 1 must NOT replay seed s+1 epoch 0 (SeedSequence mixing).
    pytest.importorskip("grain")
    from change3d_tpu.data.grain_pipeline import GrainDataLoader

    train_tf, _ = make_transform_pipelines("bcd", 16, 16)
    ds = BCDDataset(bcd_root, "train", train_tf)

    l_a = GrainDataLoader(ds, 2, shuffle=True, seed=7, num_workers=0, collate=pair_collate)
    l_a.set_epoch(1)
    l_b = GrainDataLoader(ds, 2, shuffle=True, seed=8, num_workers=0, collate=pair_collate)
    l_b.set_epoch(0)
    a = [b["pre"].copy() for b in l_a]
    b = [b["pre"].copy() for b in l_b]
    assert any(not np.array_equal(x, y) for x, y in zip(a, b))
