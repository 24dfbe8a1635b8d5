"""Data pipeline semantics: transforms, datasets, loader determinism."""

import os

import cv2
import numpy as np
import pytest

from change3d_tpu.data.transforms import TransformPipeline, make_transform_pipelines
from change3d_tpu.data.datasets import BCDDataset, SCDDataset
from change3d_tpu.data.pipeline import DataLoader, pair_collate


def test_eval_transform_normalization_and_binarize():
    tf = TransformPipeline(16, 16, "bcd", train=False)
    img = np.full((16, 16, 6), 255, np.uint8)
    label = np.zeros((16, 16), np.uint8)
    label[4:8, 4:8] = 255
    out_img, out_label = tf(img, label)
    # (x/255 - 0.5) / 0.5: 255 -> 1.0 (ref: /root/reference/data/transforms.py:127-137)
    np.testing.assert_allclose(out_img, 1.0)
    assert out_img.dtype == np.float32
    # ceil(label/255) binarization
    assert set(np.unique(out_label)) == {0, 1}
    assert out_label[5, 5, 0] == 1 and out_label[0, 0, 0] == 0


def test_eval_transform_resizes():
    tf = TransformPipeline(16, 16, "bcd", train=False)
    img = np.random.RandomState(0).randint(0, 255, (32, 32, 6), np.uint8)
    label = np.zeros((32, 32), np.uint8)
    out_img, out_label = tf(img, label)
    assert out_img.shape == (16, 16, 6)
    assert out_label.shape == (16, 16, 1)


def test_train_transform_deterministic_given_rng():
    tf = TransformPipeline(16, 16, "bcd", train=True)
    rng_img = np.random.RandomState(1)
    img = rng_img.randint(0, 255, (16, 16, 6), np.uint8)
    label = rng_img.randint(0, 2, (16, 16), np.uint8) * 255
    a = tf(img, label, np.random.default_rng(42))
    b = tf(img, label, np.random.default_rng(42))
    np.testing.assert_array_equal(a[0], b[0])
    np.testing.assert_array_equal(a[1], b[1])


def test_scd_exchange_swaps_semantic_labels():
    tf = TransformPipeline(8, 8, "scd", train=True)
    img = np.zeros((8, 8, 6), np.uint8)
    img[..., 0:3] = 10  # pre
    img[..., 3:6] = 200  # post
    label = np.stack(
        [np.full((8, 8), 1), np.full((8, 8), 2), np.ones((8, 8))], -1
    ).astype(np.uint8)
    # find an rng seed that triggers the exchange branch but no crop/flip
    for seed in range(200):
        rng = np.random.default_rng(seed)
        draws = np.random.default_rng(seed).random(4)
        if draws[0] >= 0.5 and draws[1] >= 0.5 and draws[2] >= 0.5 and draws[3] < 0.5:
            out_img, out_label = tf(img, label, rng)
            # images swapped: pre slot now holds the post values
            assert out_img[0, 0, 0] > out_img[0, 0, 3]
            # label1/label2 swapped, change intact (ref: transforms.py:323-326)
            assert out_label[0, 0, 0] == 2 and out_label[0, 0, 1] == 1 and out_label[0, 0, 2] == 1
            return
    pytest.skip("no seed hit the exchange-only branch")


@pytest.fixture()
def bcd_root(tmp_path):
    rng = np.random.RandomState(0)
    for split in ("train", "test"):
        for d in ("t1", "t2", "label"):
            os.makedirs(tmp_path / split / d, exist_ok=True)
        for i in range(5):
            cv2.imwrite(str(tmp_path / split / "t1" / f"{i}.png"), rng.randint(0, 255, (16, 16, 3), np.uint8))
            cv2.imwrite(str(tmp_path / split / "t2" / f"{i}.png"), rng.randint(0, 255, (16, 16, 3), np.uint8))
            cv2.imwrite(str(tmp_path / split / "label" / f"{i}.png"), rng.randint(0, 2, (16, 16), np.uint8) * 255)
    return str(tmp_path)


def test_bcd_dataset_and_loader(bcd_root):
    train_tf, eval_tf = make_transform_pipelines("bcd", 16, 16)
    ds = BCDDataset(bcd_root, "train", train_tf)
    assert len(ds) == 5
    loader = DataLoader(ds, 2, shuffle=True, seed=7, num_workers=1, collate=pair_collate, drop_last=True)
    assert len(loader) == 2
    epoch0 = [b["pre"].copy() for b in loader]
    epoch0_again = [b["pre"].copy() for b in loader]
    for a, b in zip(epoch0, epoch0_again):
        np.testing.assert_array_equal(a, b)  # same epoch -> same batches
    loader.set_epoch(1)
    epoch1 = [b["pre"].copy() for b in loader]
    assert any(not np.array_equal(a, b) for a, b in zip(epoch0, epoch1))


def test_loader_deterministic_across_worker_counts(bcd_root):
    # Per-sample seeded rngs: augmented batches are identical no matter how
    # the decode work is scheduled over the thread pool.
    train_tf, _ = make_transform_pipelines("bcd", 16, 16)
    ds = BCDDataset(bcd_root, "train", train_tf)

    def run(workers):
        loader = DataLoader(ds, 2, shuffle=True, seed=7, num_workers=workers,
                            collate=pair_collate, drop_last=True)
        return [(b["pre"].copy(), b["label"].copy()) for b in loader]

    for (a_p, a_l), (b_p, b_l) in zip(run(1), run(4)):
        np.testing.assert_array_equal(a_p, b_p)
        np.testing.assert_array_equal(a_l, b_l)


def test_loader_abandoned_iterator_does_not_deadlock(bcd_root):
    # Breaking out of iteration must release the producer (timeout-aware
    # puts); a second pass over the loader must still work and be complete.
    import threading

    _, eval_tf = make_transform_pipelines("bcd", 16, 16)
    ds = BCDDataset(bcd_root, "test", eval_tf)
    loader = DataLoader(ds, 1, num_workers=2, collate=pair_collate, prefetch=1)
    before = threading.active_count()
    it = iter(loader)
    next(it)
    del it  # abandon mid-epoch with a full queue
    import gc, time

    gc.collect()
    assert len(list(loader)) == len(loader)
    deadline = time.time() + 5.0
    while threading.active_count() > before and time.time() < deadline:
        time.sleep(0.05)
    assert threading.active_count() <= before


def test_padded_final_batch(bcd_root):
    _, eval_tf = make_transform_pipelines("bcd", 16, 16)
    ds = BCDDataset(bcd_root, "test", eval_tf)
    loader = DataLoader(ds, 4, num_workers=1, collate=pair_collate, pad_final=True)
    batches = list(loader)
    assert len(batches) == 2
    assert batches[1]["pre"].shape[0] == 4
    np.testing.assert_array_equal(batches[1]["valid"], [True, False, False, False])


def test_channel_order_per_task(tmp_path):
    """BCD/SCD load RGB (reference uses skimage, /root/reference/data/dataset.py:77-78,
    185-186); BDA loads BGR (reference uses cv2 there, :295-296). A pure-red
    PNG must land in channel 0 for BCD/SCD and channel 2 for BDA."""
    from change3d_tpu.data.datasets import BDADataset

    red_bgr = np.zeros((8, 8, 3), np.uint8)
    red_bgr[..., 2] = 255  # cv2 writes BGR, so this file is pure red
    zeros = np.zeros((8, 8), np.uint8)

    for d in ("t1", "t2", "label"):
        os.makedirs(tmp_path / "bcd" / "train" / d)
    cv2.imwrite(str(tmp_path / "bcd" / "train" / "t1" / "a.png"), red_bgr)
    cv2.imwrite(str(tmp_path / "bcd" / "train" / "t2" / "a.png"), red_bgr)
    cv2.imwrite(str(tmp_path / "bcd" / "train" / "label" / "a.png"), zeros)
    img, _ = BCDDataset(str(tmp_path / "bcd"), "train")[0]
    assert img[0, 0, 0] == 255 and img[0, 0, 2] == 0  # pre: RGB
    assert img[0, 0, 3] == 255 and img[0, 0, 5] == 0  # post: RGB

    for d in ("t1", "t2", "label1", "label2", "change"):
        os.makedirs(tmp_path / "scd" / "train" / d)
    for d in ("t1", "t2"):
        cv2.imwrite(str(tmp_path / "scd" / "train" / d / "a.png"), red_bgr)
    for d in ("label1", "label2", "change"):
        cv2.imwrite(str(tmp_path / "scd" / "train" / d / "a.png"), zeros)
    img, _ = SCDDataset(str(tmp_path / "scd"), "train")[0]
    assert img[0, 0, 0] == 255 and img[0, 0, 2] == 0

    for d in ("t1", "t2", "label1", "label2"):
        os.makedirs(tmp_path / "bda" / "train" / d)
    for d in ("t1", "t2"):
        cv2.imwrite(str(tmp_path / "bda" / "train" / d / "x_disaster.png"), red_bgr)
    for d in ("label1", "label2"):
        cv2.imwrite(str(tmp_path / "bda" / "train" / d / "x_disaster_target.png"), zeros)
    img, _ = BDADataset(str(tmp_path / "bda"), "train")[0]
    assert img[0, 0, 2] == 255 and img[0, 0, 0] == 0  # BGR preserved
    assert img[0, 0, 5] == 255 and img[0, 0, 3] == 0


def test_missing_file_raises(tmp_path):
    for d in ("t1", "t2", "label"):
        os.makedirs(tmp_path / "train" / d, exist_ok=True)
    cv2.imwrite(str(tmp_path / "train" / "label" / "a.png"), np.zeros((4, 4), np.uint8))
    with pytest.raises(FileNotFoundError):
        BCDDataset(str(tmp_path), "train")
