"""Drive the real CC CLI end-to-end: synthetic caption corpus -> train ->
beam-search eval -> best re-eval -> caption predict subcommand.

Usage: python tests/manual_cc_drive.py [--root /tmp/synth_cc] [--epochs 2]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import cv2
import h5py
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

WORDS = ["a", "building", "appeared", "on", "the", "road", "scene", "is", "same", "as", "before"]


def make_corpus(
    root: str, n_imgs: int = 8, cpi: int = 5, cap_len: int = 14, hw: int = 32,
    overfit: bool = False,
):
    """overfit=True: one fixed, image-determined caption (x cpi) per image and
    identical images across splits — a memorization task whose BLEU-4 must go
    to ~1 if the caption train/decode loop actually learns."""
    os.makedirs(root, exist_ok=True)
    vocab = {"<pad>": 0, "<unk>": 1, "<start>": 2, "<end>": 3}
    for w in WORDS:
        vocab[w] = len(vocab)
    rng = np.random.RandomState(0)
    # Structured, discriminable pairs: raw-noise images collapse to
    # near-identical features through an untrained X3D (BN + depthwise chains
    # smooth noise), so memorization needs geometric structure — image i's
    # post frame adds a bright rectangle at a grid position and color keyed
    # to i.
    images = np.zeros((n_imgs, 2, 3, hw, hw), np.uint8)
    colors = rng.randint(120, 255, (n_imgs, 3))
    for i in range(n_imgs):
        base = rng.randint(40, 100, (3, hw // 4, hw // 4), np.uint8)
        base = np.stack([cv2.resize(c, (hw, hw)) for c in base])
        images[i, 0] = base
        post = base.copy()
        gx, gy = (i % 4) * (hw // 4), (i // 4) * (hw // 4)
        post[:, gy : gy + hw // 3, gx : gx + hw // 3] = colors[i][:, None, None]
        images[i, 1] = post
    fixed = [
        [2] + rng.randint(4, len(vocab), int(rng.randint(4, 7))).tolist() + [3]
        for _ in range(n_imgs)
    ]
    for split in ("TRAIN", "VAL", "TEST"):
        with h5py.File(os.path.join(root, f"{split}_IMAGES_DS.hdf5"), "w") as f:
            f.attrs["captions_per_image"] = cpi
            f.create_dataset(
                "images",
                data=images if overfit else rng.randint(0, 255, (n_imgs, 2, 3, hw, hw), np.uint8),
            )
        caps, lens = [], []
        for i in range(n_imgs * cpi):
            cap = fixed[i // cpi] if overfit else (
                [2] + rng.randint(4, len(vocab), int(rng.randint(3, 8))).tolist() + [3]
            )
            lens.append(len(cap))
            caps.append(cap + [0] * (cap_len - len(cap)))
        with open(os.path.join(root, f"{split}_CAPTIONS_DS.json"), "w") as f:
            json.dump(caps, f)
        with open(os.path.join(root, f"{split}_CAPLENS_DS.json"), "w") as f:
            json.dump(lens, f)
    with open(os.path.join(root, "WORDMAP_DS.json"), "w") as f:
        json.dump(vocab, f)


def run_overfit(args):
    """Memorization learning proof at the engine level.

    Two deliberate deviations from the CLI protocol, both forced by
    memorization scale and verified empirically:

    - CONSTANT learning rate: the reference's x0.5-every-10-epochs shrink is
      tuned for LEVIR-CC (~2.5k steps/epoch) and decays past usefulness
      within ~300 steps on a 5-step/epoch corpus (CLI path plateaus at loss
      ~1.7; constant lr reaches ~0.1).
    - SHALLOW backbone: the caption memory is solely the stage-4 feature of
      the video encoder; 55 random-init BN+swish blocks wash out image
      identity by stage 4, so full X3D-L from scratch cannot distinguish the
      images (the reference never trains CC from random init either — it
      always loads the Kinetics X3D_L.pyth, ref:
      /root/reference/model/trainer.py:44-45). A 5-block backbone keeps the
      proof end-to-end (images -> encoder -> memory -> decoder -> beam ->
      BLEU) while staying in the trainable-from-scratch regime.
    """
    import jax

    from change3d_tpu.data.datasets import CaptionDataset
    from change3d_tpu.data.pipeline import DataLoader, caption_collate
    from change3d_tpu.models.trainer import Change3D, Task
    from change3d_tpu.models.x3d import X3DConfig
    from change3d_tpu.train.caption_loop import (
        CaptionRunConfig,
        _EveryFifth,
        evaluate_captions,
        load_word_map,
    )
    from change3d_tpu.train.engine import create_train_state, make_train_step
    from change3d_tpu.train.optim import torch_adam

    cfg = CaptionRunConfig(file_root=args.root, dataset="DS")
    word_map = load_word_map(cfg)
    backbone = X3DConfig(
        stem_dim_out=8, stage_dims=(8, 16, 24, 32), stage_inner_dims=(18, 36, 54, 72),
        stage_depths=(1, 1, 2, 1), head_dim_out=64, num_classes=10,
    )
    model = Change3D(
        task=Task.CC, vocab_size=len(word_map), embed_dim=32, num_heads=4,
        num_layers=2, backbone_cfg=backbone, in_height=32, in_width=32,
    )
    train_data = CaptionDataset(args.root, "DS", "TRAIN")
    loader = DataLoader(train_data, 8, shuffle=True, num_workers=2,
                        collate=caption_collate, drop_last=True)
    lr = args.lr or 1e-3
    tx = torch_adam(lambda s: lr, weight_decay=1e-5, grad_clip_value=5.0)
    first = next(iter(loader))
    state = create_train_state(model, tx, jax.random.PRNGKey(0), first)
    step = make_train_step(model, tx, donate=False)
    rng = jax.random.PRNGKey(1)
    import time

    t0 = time.time()
    for epoch in range(args.epochs):
        loader.set_epoch(epoch)
        for batch in loader:
            state, m = step(state, batch, rng)
        if epoch % 25 == 0:
            print(f"[epoch {epoch}] loss {float(m['loss']):.4f} top1 "
                  f"{float(m['top1']):.1f} ({time.time() - t0:.0f}s)", flush=True)

    eval_data = _EveryFifth(CaptionDataset(args.root, "DS", "TEST"))
    eval_loader = DataLoader(eval_data, 8, num_workers=2, collate=caption_collate, pad_final=True)
    scores = evaluate_captions(model, state.variables, eval_loader, word_map, beam_size=2)
    print("eval:", json.dumps(scores, default=float))
    b4 = float(scores.get("Bleu_4", 0.0))
    print(f"CC OVERFIT {'PASS' if b4 >= 0.8 else 'FAIL'}: BLEU-4={b4:.4f} (target >= 0.8)")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", default="/tmp/synth_cc")
    ap.add_argument("--save_dir", default="/tmp/exp_cc_drive")
    ap.add_argument("--epochs", type=int, default=2)
    ap.add_argument(
        "--overfit", action="store_true",
        help="memorization corpus; PASS requires BLEU-4 >= 0.8 at the end",
    )
    ap.add_argument(
        "--lr", type=float, default=None,
        help="override lr (the reference schedule halves every 10 epochs — "
        "too fast for a 5-step/epoch memorization corpus)",
    )
    ap.add_argument(
        "extra", nargs="*", default=[],
        help="extra cli.py cc flags, e.g. --compute_dtype bfloat16",
    )
    args = ap.parse_args()

    if not os.path.exists(os.path.join(args.root, "WORDMAP_DS.json")):
        make_corpus(args.root, overfit=args.overfit)
        print(f"built synthetic caption corpus at {args.root}")

    if args.overfit:
        return run_overfit(args)

    from change3d_tpu.cli import main as cli_main

    argv = [
        "cc", "--dataset", "DS", "--file_root", args.root,
        "--epochs", str(args.epochs), "--batch_size", "8", "--beam_size", "2",
        "--save_dir", args.save_dir, "--num_workers", "2",
    ]
    if args.lr is not None:
        argv += ["--lr", str(args.lr)]
    argv += list(args.extra)
    results = cli_main(argv)
    print("train+eval results:", json.dumps(results, default=float))

    ckpt_dir = os.path.join(args.save_dir, f"DS_cc_lr_{args.lr if args.lr is not None else 0.0001}")
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
