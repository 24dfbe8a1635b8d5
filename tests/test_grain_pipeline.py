"""GrainDataLoader: interface parity with the threaded DataLoader."""

import numpy as np
import pytest

pytest.importorskip("grain")

from change3d_tpu.data.grain_pipeline import GrainDataLoader
from change3d_tpu.data.pipeline import pair_collate
from change3d_tpu.data.datasets import BCDDataset
from change3d_tpu.data.transforms import make_transform_pipelines

from tests.test_data import bcd_root  # noqa: F401  (fixture)


def test_grain_loader_shapes_and_determinism(bcd_root):  # noqa: F811
    train_tf, _ = make_transform_pipelines("bcd", 16, 16)
    ds = BCDDataset(bcd_root, "train", train_tf)
    loader = GrainDataLoader(ds, 2, shuffle=True, seed=7, num_workers=0, collate=pair_collate)
    assert len(loader) == 2
    a = [b["pre"].copy() for b in loader]
    b = [b["pre"].copy() for b in loader]
    assert len(a) == 2 and a[0].shape == (2, 16, 16, 3)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(x, y)  # same epoch -> same batches
    loader.set_epoch(1)
    c = [b["pre"].copy() for b in loader]
    assert any(not np.array_equal(x, y) for x, y in zip(a, c))


def test_grain_loader_pad_final(bcd_root):  # noqa: F811
    _, eval_tf = make_transform_pipelines("bcd", 16, 16)
    ds = BCDDataset(bcd_root, "test", eval_tf)
    loader = GrainDataLoader(ds, 4, num_workers=0, collate=pair_collate, pad_final=True)
    batches = list(loader)
    assert len(batches) == 2
    assert batches[1]["pre"].shape[0] == 4
    # 'valid' is present on EVERY batch (stable pytree structure for jit).
    np.testing.assert_array_equal(batches[0]["valid"], [True] * 4)
    np.testing.assert_array_equal(batches[1]["valid"], [True, False, False, False])


def test_grain_loader_sharded_pad_final_matches_threaded(bcd_root):  # noqa: F811
    # Multi-host padded eval: the two shards' rows, concatenated per batch,
    # must reassemble exactly the single-process global batches — same
    # samples, same global-position 'valid' masks — and match the threaded
    # DataLoader's sharded-eval contract row for row (eval transforms are
    # deterministic, so cross-loader equality holds).
    from change3d_tpu.data.pipeline import DataLoader

    _, eval_tf = make_transform_pipelines("bcd", 16, 16)
    ds = BCDDataset(bcd_root, "test", eval_tf)
    global_loader = GrainDataLoader(ds, 4, num_workers=0, collate=pair_collate, pad_final=True)
    shards = [
        list(GrainDataLoader(ds, 4, num_workers=0, collate=pair_collate,
                             pad_final=True, num_shards=2, shard_index=s))
        for s in (0, 1)
    ]
    globals_ = list(global_loader)
    assert len(shards[0]) == len(shards[1]) == len(globals_) == len(global_loader)
    for b0, b1, g in zip(shards[0], shards[1], globals_):
        assert b0["pre"].shape[0] == 2 and b1["pre"].shape[0] == 2
        np.testing.assert_array_equal(np.concatenate([b0["pre"], b1["pre"]]), g["pre"])
        np.testing.assert_array_equal(np.concatenate([b0["valid"], b1["valid"]]), g["valid"])
    threaded = [
        list(DataLoader(ds, 4, num_workers=1, collate=pair_collate,
                        pad_final=True, num_shards=2, shard_index=s))
        for s in (0, 1)
    ]
    for kind in (0, 1):
        for gb, tb in zip(shards[kind], threaded[kind]):
            np.testing.assert_array_equal(gb["pre"], tb["pre"])
            np.testing.assert_array_equal(gb["valid"], tb["valid"])


def test_grain_loader_covers_all_samples(bcd_root):  # noqa: F811
    _, eval_tf = make_transform_pipelines("bcd", 16, 16)
    ds = BCDDataset(bcd_root, "test", eval_tf)
    loader = GrainDataLoader(ds, 2, num_workers=0, collate=pair_collate)
    total = sum(b["pre"].shape[0] for b in loader)
    assert total == len(ds)
