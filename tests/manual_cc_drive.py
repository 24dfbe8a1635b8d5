"""Drive the real CC CLI end-to-end: synthetic caption corpus -> train ->
beam-search eval -> best re-eval -> caption predict subcommand.

Usage: python tests/manual_cc_drive.py [--root /tmp/synth_cc] [--epochs 2]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import h5py
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

WORDS = ["a", "building", "appeared", "on", "the", "road", "scene", "is", "same", "as", "before"]


def make_corpus(root: str, n_imgs: int = 8, cpi: int = 5, cap_len: int = 14, hw: int = 32):
    os.makedirs(root, exist_ok=True)
    vocab = {"<pad>": 0, "<unk>": 1, "<start>": 2, "<end>": 3}
    for w in WORDS:
        vocab[w] = len(vocab)
    rng = np.random.RandomState(0)
    for split in ("TRAIN", "VAL", "TEST"):
        with h5py.File(os.path.join(root, f"{split}_IMAGES_DS.hdf5"), "w") as f:
            f.attrs["captions_per_image"] = cpi
            f.create_dataset(
                "images", data=rng.randint(0, 255, (n_imgs, 2, 3, hw, hw), np.uint8)
            )
        caps, lens = [], []
        for _ in range(n_imgs * cpi):
            n_words = rng.randint(3, 8)
            body = rng.randint(4, len(vocab), n_words).tolist()
            cap = [2] + body + [3]
            lens.append(len(cap))
            caps.append(cap + [0] * (cap_len - len(cap)))
        with open(os.path.join(root, f"{split}_CAPTIONS_DS.json"), "w") as f:
            json.dump(caps, f)
        with open(os.path.join(root, f"{split}_CAPLENS_DS.json"), "w") as f:
            json.dump(lens, f)
    with open(os.path.join(root, "WORDMAP_DS.json"), "w") as f:
        json.dump(vocab, f)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", default="/tmp/synth_cc")
    ap.add_argument("--save_dir", default="/tmp/exp_cc_drive")
    ap.add_argument("--epochs", type=int, default=2)
    args = ap.parse_args()

    if not os.path.exists(os.path.join(args.root, "WORDMAP_DS.json")):
        make_corpus(args.root)
        print(f"built synthetic caption corpus at {args.root}")

    from change3d_tpu.cli import main as cli_main

    results = cli_main([
        "cc", "--dataset", "DS", "--file_root", args.root,
        "--epochs", str(args.epochs), "--batch_size", "8", "--beam_size", "2",
        "--save_dir", args.save_dir, "--num_workers", "2",
    ])
    print("train+eval results:", json.dumps(results, default=float))

    ckpt_dir = os.path.join(args.save_dir, "DS_cc_lr_0.0001")
    out_dir = os.path.join(args.save_dir, "pred")
    cli_main([
        "predict", "--model_task", "cc", "--checkpoint", ckpt_dir,
        "--file_root", args.root, "--dataset", "DS", "--split", "TEST",
        "--out", out_dir, "--batch_size", "8", "--beam_size", "2",
    ])
    with open(os.path.join(out_dir, "captions.json")) as f:
        captions = json.load(f)
    print(f"predict wrote {len(captions)} captions; first: {captions[0]}")
    assert len(captions) == 8
    print("CC DRIVE PASS")


if __name__ == "__main__":
    main()
