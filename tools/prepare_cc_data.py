#!/usr/bin/env python
"""Build change-captioning training files from a raw LEVIR-CC / DUBAI-CC
style corpus — the preprocessing the reference delegates to an external
repository ("follow the practice introduced in RSICCformer",
ref: /root/reference/README.md:129).

Input layout (raw LEVIR-CC distribution):

    {images_root}/{train,val,test}/A/*.png      pre-change images
    {images_root}/{train,val,test}/B/*.png      post-change images (same names)
    captions.json                               Karpathy-style split file:
        {"images": [{"split": "train", "filename": "x.png",
                     "sentences": [{"tokens": ["a", "road", ...]}, ...]}, ...]}

Output (exactly what ``change3d_tpu.data.datasets.CaptionDataset`` and the
reference's loaders consume):

    WORDMAP_{base}.json            word -> id; words by train-corpus frequency
                                   (> min_word_freq), then <unk>, <start>,
                                   <end>; <pad> = 0
    {SPLIT}_IMAGES_{base}.hdf5     'images' [N, 2, 3, H, W] uint8,
                                   attrs['captions_per_image']
    {SPLIT}_CAPTIONS_{base}.json   flat list (N * cpi) of fixed-length id
                                   sequences: <start> tokens <end> <pad>*
    {SPLIT}_CAPLENS_{base}.json    true lengths incl. <start>/<end>

with base = "{name}_{cpi}_cap_per_img_{min_word_freq}_min_word_freq"
(the reference CLI's default dataset string, LEVIR_CC_5_cap_per_img_5_min_word_freq).

Usage:
    python tools/prepare_cc_data.py --images_root /data/LEVIR-CC/images \
        --captions /data/LEVIR-CC/LevirCCcaptions.json --out /data/LEVIR-CC \
        --name LEVIR_CC
"""

from __future__ import annotations

import argparse
import json
import os
from collections import Counter

import numpy as np


def build_word_map(samples: list, min_word_freq: int) -> dict:
    """Frequency map over TRAIN tokens only; ids 1..V for kept words, then
    <unk>/<start>/<end>; <pad> is 0."""
    freq = Counter()
    for s in samples:
        if s["split"] != "train":
            continue
        for sent in s["sentences"]:
            freq.update(w.lower() for w in sent["tokens"])
    words = sorted(w for w, c in freq.items() if c > min_word_freq)
    word_map = {w: i + 1 for i, w in enumerate(words)}
    for special in ("<unk>", "<start>", "<end>"):
        word_map[special] = len(word_map) + 1
    word_map["<pad>"] = 0
    return word_map


def encode(tokens: list, word_map: dict, max_len: int) -> tuple[list, int]:
    unk = word_map["<unk>"]
    ids = [word_map["<start>"]]
    ids += [word_map.get(w.lower(), unk) for w in tokens[:max_len]]
    ids.append(word_map["<end>"])
    length = len(ids)
    ids += [word_map["<pad>"]] * (max_len + 2 - length)
    return ids, length


def select_captions(sentences: list, cpi: int, rng: np.random.Generator) -> list:
    """Exactly cpi captions per image: sample with replacement when short,
    subsample without replacement when long."""
    if len(sentences) == cpi:
        return list(sentences)
    if len(sentences) < cpi:
        extra = [sentences[int(i)] for i in rng.integers(0, len(sentences), cpi - len(sentences))]
        return list(sentences) + extra
    keep = rng.choice(len(sentences), size=cpi, replace=False)
    return [sentences[int(i)] for i in sorted(keep)]


def _read_pair(images_root: str, split: str, filename: str) -> np.ndarray:
    import cv2

    pair = []
    for sub in ("A", "B"):
        path = os.path.join(images_root, split, sub, filename)
        img = cv2.imread(path, cv2.IMREAD_COLOR)
        if img is None:
            raise FileNotFoundError(path)
        pair.append(img[:, :, ::-1])  # BGR -> RGB (CaptionDataset normalizes RGB)
    return np.stack(pair).transpose(0, 3, 1, 2)  # [2, 3, H, W]


def prepare(images_root: str, captions_path: str, out_dir: str, *, name: str = "LEVIR_CC",
            cpi: int = 5, min_word_freq: int = 5, max_len: int = 50, seed: int = 0) -> str:
    import h5py

    with open(captions_path) as f:
        corpus = json.load(f)["images"]
    os.makedirs(out_dir, exist_ok=True)

    word_map = build_word_map(corpus, min_word_freq)
    base = f"{name}_{cpi}_cap_per_img_{min_word_freq}_min_word_freq"
    with open(os.path.join(out_dir, f"WORDMAP_{base}.json"), "w") as f:
        json.dump(word_map, f)

    rng = np.random.default_rng(seed)
    for split in ("train", "val", "test"):
        samples = [s for s in corpus if s["split"] == split]
        if not samples:
            continue
        enc_captions, caplens = [], []
        h5_path = os.path.join(out_dir, f"{split.upper()}_IMAGES_{base}.hdf5")
        with h5py.File(h5_path, "w") as h5:
            h5.attrs["captions_per_image"] = cpi
            first = _read_pair(images_root, split, samples[0]["filename"])
            images = h5.create_dataset(
                "images", (len(samples),) + first.shape, dtype="uint8"
            )
            for i, s in enumerate(samples):
                if not s["sentences"]:
                    raise ValueError(
                        f"{split}/{s['filename']}: image has no sentences in "
                        "the captions file"
                    )
                images[i] = first if i == 0 else _read_pair(images_root, split, s["filename"])
                for sent in select_captions(s["sentences"], cpi, rng):
                    ids, length = encode(sent["tokens"], word_map, max_len)
                    enc_captions.append(ids)
                    caplens.append(length)
        with open(os.path.join(out_dir, f"{split.upper()}_CAPTIONS_{base}.json"), "w") as f:
            json.dump(enc_captions, f)
        with open(os.path.join(out_dir, f"{split.upper()}_CAPLENS_{base}.json"), "w") as f:
            json.dump(caplens, f)
        print(f"{split}: {len(samples)} pairs, {len(enc_captions)} captions -> {h5_path}")
    print(f"vocab size {len(word_map)} (dataset string: {base})")
    return base


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--images_root", required=True)
    ap.add_argument("--captions", required=True, help="Karpathy-style split JSON")
    ap.add_argument("--out", required=True)
    ap.add_argument("--name", default="LEVIR_CC")
    ap.add_argument("--cpi", type=int, default=5, help="captions per image")
    ap.add_argument("--min_word_freq", type=int, default=5)
    ap.add_argument("--max_len", type=int, default=50,
                    help="max tokens per caption, excl. <start>/<end> "
                    "(50 -> the model's 52-slot captions)")
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args(argv)
    prepare(args.images_root, args.captions, args.out, name=args.name, cpi=args.cpi,
            min_word_freq=args.min_word_freq, max_len=args.max_len, seed=args.seed)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
