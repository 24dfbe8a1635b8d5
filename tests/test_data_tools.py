"""Dataset preparation tools: CC HDF5 builder + scene patch cropper.

The reference delegates both steps to the user / an external repo
(ref: /root/reference/README.md:76-129); these tests prove our tools emit
exactly what the framework's own datasets consume.
"""

import json
import os

import numpy as np
import pytest

from tools.crop_patches import crop_scene, main as crop_main, window_starts
from tools.prepare_cc_data import build_word_map, encode, prepare, select_captions

cv2 = pytest.importorskip("cv2")


# ---------------------------------------------------------------------------
# prepare_cc_data
# ---------------------------------------------------------------------------

SENTS = [
    ["a", "road", "appears"],
    ["the", "road", "is", "new"],
    ["buildings", "appear", "near", "the", "road"],
    ["a", "zorp", "materialized"],  # 'zorp'/'materialized' are rare -> <unk>
]


def _raw_corpus(tmp_path, n_train=3, n_val=2, hw=24):
    rng = np.random.RandomState(0)
    images = []
    for split, n in (("train", n_train), ("val", n_val), ("test", n_val)):
        for sub in ("A", "B"):
            os.makedirs(tmp_path / "images" / split / sub, exist_ok=True)
        for i in range(n):
            name = f"{split}_{i}.png"
            for sub in ("A", "B"):
                cv2.imwrite(
                    str(tmp_path / "images" / split / sub / name),
                    rng.randint(0, 255, (hw, hw, 3), np.uint8),
                )
            images.append({
                "split": split,
                "filename": name,
                "sentences": [
                    {"tokens": SENTS[(i + j) % len(SENTS)]} for j in range(3 + i % 3)
                ],
            })
    cap_path = tmp_path / "caps.json"
    with open(cap_path, "w") as f:
        json.dump({"images": images}, f)
    return str(tmp_path / "images"), str(cap_path)


def test_word_map_structure():
    corpus = [
        {"split": "train", "sentences": [{"tokens": ["road", "road", "rare"]}]},
        {"split": "val", "sentences": [{"tokens": ["valonly", "valonly", "valonly"]}]},
    ]
    wm = build_word_map(corpus, min_word_freq=1)
    assert wm["<pad>"] == 0
    assert "road" in wm and wm["road"] >= 1
    assert "rare" not in wm  # freq 1 is not > 1
    assert "valonly" not in wm  # non-train splits never contribute
    assert sorted(wm[s] for s in ("<unk>", "<start>", "<end>")) == [
        len(wm) - 3, len(wm) - 2, len(wm) - 1,
    ]


def test_encode_pads_to_fixed_len():
    wm = {"<pad>": 0, "a": 1, "b": 2, "<unk>": 3, "<start>": 4, "<end>": 5}
    ids, length = encode(["a", "zzz", "b"], wm, max_len=6)
    assert ids == [4, 1, 3, 2, 5, 0, 0, 0]  # start a <unk> b end pad*3
    assert length == 5
    assert len(ids) == 6 + 2


def test_select_captions_exact_count():
    rng = np.random.default_rng(0)
    three = [{"tokens": [str(i)]} for i in range(3)]
    seven = [{"tokens": [str(i)]} for i in range(7)]
    assert len(select_captions(three, 5, rng)) == 5
    assert len(select_captions(seven, 5, rng)) == 5
    assert select_captions(three, 3, rng) == three


def test_prepare_output_consumed_by_caption_dataset(tmp_path):
    from change3d_tpu.data.datasets import CaptionDataset

    images_root, cap_path = _raw_corpus(tmp_path)
    out = tmp_path / "prepared"
    base = prepare(images_root, cap_path, str(out), name="SYNTH_CC", cpi=5,
                   min_word_freq=0, max_len=10, seed=1)
    assert base == "SYNTH_CC_5_cap_per_img_0_min_word_freq"

    with open(out / f"WORDMAP_{base}.json") as f:
        wm = json.load(f)

    for split, n_img in (("TRAIN", 3), ("VAL", 2), ("TEST", 2)):
        ds = CaptionDataset(str(out), base, split)
        assert len(ds) == n_img * 5
        assert ds.cpi == 5
        item = ds.__getitem__(0, np.random.default_rng(0))
        assert item["pre"].shape == (24, 24, 3)
        assert item["post"].shape == (24, 24, 3)
        assert item["caption"].shape == (12,)  # max_len 10 + start/end
        assert item["caption"][0] == wm["<start>"]
        L = item["length"]
        assert item["caption"][L - 1] == wm["<end>"]
        assert (item["caption"][L:] == wm["<pad>"]).all()
        if split != "TRAIN":
            assert item["all_captions"].shape == (5, 12)
        ds.close()

    # Images round-trip: HDF5 row 0 of TRAIN equals the file on disk (RGB).
    import h5py

    with h5py.File(out / f"TRAIN_IMAGES_{base}.hdf5", "r") as h5:
        got = np.asarray(h5["images"][0])  # [2, 3, H, W]
    a = cv2.imread(os.path.join(images_root, "train", "A", "train_0.png"))[:, :, ::-1]
    np.testing.assert_array_equal(got[0], a.transpose(2, 0, 1))

    # Decoded tokens match the source sentence (all words kept at freq>0).
    rev = {v: k for k, v in wm.items()}
    ds = CaptionDataset(str(out), base, "TRAIN")
    item = ds.__getitem__(0, np.random.default_rng(0))
    words = [rev[int(t)] for t in item["caption"][1 : item["length"] - 1]]
    assert words in [[w.lower() for w in s] for s in SENTS]
    ds.close()


# ---------------------------------------------------------------------------
# crop_patches
# ---------------------------------------------------------------------------

def test_window_starts_edge_anchor():
    assert window_starts(70, 32, 32) == [0, 32, 38]
    assert window_starts(64, 32, 32) == [0, 32]
    assert window_starts(32, 32, 32) == [0]
    assert window_starts(20, 32, 32) == []
    assert window_starts(70, 32, 16) == [0, 16, 32, 38]


def test_crop_scene_slices_align():
    img = np.arange(70 * 96 * 3, dtype=np.uint8).reshape(70, 96, 3)
    patches = list(crop_scene(img, 32, 32))
    assert len(patches) == 3 * 3
    for y, x, p in patches:
        np.testing.assert_array_equal(p, img[y : y + 32, x : x + 32])


def _scene_dataset(tmp_path, hw=(70, 96)):
    rng = np.random.RandomState(1)
    root = tmp_path / "scenes"
    for split in ("train", "test"):
        for sub in ("t1", "t2", "label"):
            os.makedirs(root / split / sub, exist_ok=True)
        for i in range(2):
            name = f"scene{i}.png"
            cv2.imwrite(str(root / split / "t1" / name), rng.randint(0, 255, hw + (3,), np.uint8))
            cv2.imwrite(str(root / split / "t2" / name), rng.randint(0, 255, hw + (3,), np.uint8))
            cv2.imwrite(str(root / split / "label" / name), rng.randint(0, 2, hw, np.uint8) * 255)
    return root


def test_crop_cli_end_to_end_feeds_bcd_dataset(tmp_path):
    from change3d_tpu.data.datasets import BCDDataset

    root = _scene_dataset(tmp_path)
    out = tmp_path / "patches"
    rc = crop_main([
        "--in_root", str(root), "--out_root", str(out), "--size", "32",
    ])
    assert rc == 0

    # 2 scenes x 9 windows per modality, aligned names across modalities.
    names = sorted(os.listdir(out / "train" / "t1"))
    assert len(names) == 18
    assert names == sorted(os.listdir(out / "train" / "label"))

    # Patch content is the exact slice of the source scene (labels binary).
    lbl = cv2.imread(str(out / "train" / "label" / "scene0_38_64.png"), cv2.IMREAD_UNCHANGED)
    src = cv2.imread(str(root / "train" / "label" / "scene0.png"), cv2.IMREAD_UNCHANGED)
    np.testing.assert_array_equal(lbl, src[38:70, 64:96])

    ds = BCDDataset(str(out), "train", None)
    img, label = ds[0]
    assert img.shape == (32, 32, 6)  # concat(t1, t2)
    assert label.shape == (32, 32)


def test_crop_bda_layout_with_target_suffix(tmp_path):
    """xBD-style label names (disaster -> disaster_target) crop into patches
    BDADataset can load: scenes match across modality dirs by sorted
    position, and each patch keeps its own dir's stem so the dataset-side
    name rewrite still resolves."""
    from change3d_tpu.data.datasets import BDADataset

    rng = np.random.RandomState(2)
    root = tmp_path / "xbd"
    hw = (64, 64)
    for sub in ("t1", "t2", "label1", "label2"):
        os.makedirs(root / "train" / sub, exist_ok=True)
    # Scene ids 1 and 10: '.'<'0'<'_' makes plain-vs-'_target' names sort in
    # DIFFERENT orders across dirs — positional matching would misalign them.
    labels = {}
    for i in (1, 10):
        img = f"hurricane_{i}_pre_disaster.png"
        tgt = f"hurricane_{i}_pre_disaster_target.png"
        cv2.imwrite(str(root / "train" / "t1" / img), rng.randint(0, 255, hw + (3,), np.uint8))
        cv2.imwrite(str(root / "train" / "t2" / img), rng.randint(0, 255, hw + (3,), np.uint8))
        labels[i] = np.full(hw, i, np.uint8)  # content identifies the scene
        cv2.imwrite(str(root / "train" / "label1" / tgt), labels[i])
        cv2.imwrite(str(root / "train" / "label2" / tgt), rng.randint(0, 5, hw, np.uint8))
    out = tmp_path / "xbd_patches"
    rc = crop_main(["--in_root", str(root), "--out_root", str(out), "--size", "32"])
    assert rc == 0
    # Patch names keep each dir's own stem -> the rewrite lambda resolves.
    assert "hurricane_1_pre_disaster_0_0.png" in os.listdir(out / "train" / "t1")
    assert "hurricane_1_pre_disaster_target_0_0.png" in os.listdir(out / "train" / "label1")
    # Key-based matching: each cropped label carries ITS scene's content.
    for i in (1, 10):
        got = cv2.imread(
            str(out / "train" / "label1" / f"hurricane_{i}_pre_disaster_target_0_0.png"),
            cv2.IMREAD_UNCHANGED,
        )
        np.testing.assert_array_equal(got, labels[i][:32, :32])
    ds = BDADataset(str(out), "train", None)
    img, label = ds[0]
    assert img.shape == (32, 32, 6)
    assert label.shape == (32, 32, 2)


def test_crop_rejects_count_and_size_mismatches(tmp_path):
    root = tmp_path / "bad"
    for sub in ("t1", "t2"):
        os.makedirs(root / "train" / sub, exist_ok=True)
    cv2.imwrite(str(root / "train" / "t1" / "a.png"), np.zeros((40, 40, 3), np.uint8))
    with pytest.raises(ValueError, match="disagree on scenes"):
        crop_main(["--in_root", str(root), "--out_root", str(tmp_path / "o1"), "--size", "32"])
    cv2.imwrite(str(root / "train" / "t2" / "a.png"), np.zeros((40, 64, 3), np.uint8))
    with pytest.raises(ValueError, match="misalign"):
        crop_main(["--in_root", str(root), "--out_root", str(tmp_path / "o2"), "--size", "32"])


def test_prepare_rejects_empty_sentence_list(tmp_path):
    images_root, cap_path = _raw_corpus(tmp_path)
    with open(cap_path) as f:
        corpus = json.load(f)
    corpus["images"][0]["sentences"] = []
    with open(cap_path, "w") as f:
        json.dump(corpus, f)
    with pytest.raises(ValueError, match="no sentences"):
        prepare(images_root, cap_path, str(tmp_path / "p"), name="X", cpi=5,
                min_word_freq=0, max_len=10)


def test_crop_skips_small_scene(tmp_path, capsys):
    root = tmp_path / "s"
    for sub in ("t1", "t2", "label"):
        os.makedirs(root / "train" / sub, exist_ok=True)
        cv2.imwrite(str(root / "train" / sub / "tiny.png"), np.zeros((8, 8), np.uint8))
    crop_main(["--in_root", str(root), "--out_root", str(tmp_path / "o"), "--size", "32"])
    assert "skipped" in capsys.readouterr().out
