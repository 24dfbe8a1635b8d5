"""End-to-end learning proof: overfit BCD on a synthetic LEVIR-format dataset.

Builds a small dataset with *geometric* inserted changes (bright building-like
rectangles added to the post image; the label is exactly the inserted-rectangle
mask), then trains through the REAL ``change3d_tpu.cli bcd`` path and reports
the validation F1 curve. Done-criterion (VERDICT.md round 1, item 5): F1 >= 0.95,
demonstrating the full pipeline (data -> augment -> X3D -> decoder -> BCEDice ->
Adam -> on-device confusion matrix) actually learns, not just that loss falls.

Usage:
    python tests/manual_overfit_bcd.py [--root /tmp/synth_levir] [--epochs 30]
        [--size 64] [--n_train 64] [--device tpu|cpu]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import cv2
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _texture(rng: np.random.RandomState, size: int) -> np.ndarray:
    """Smooth mid-gray background texture (blurred noise), [H,W,3] uint8."""
    base = rng.randint(40, 120, (size // 4, size // 4, 3), np.uint8)
    img = cv2.resize(base, (size, size), interpolation=cv2.INTER_LINEAR)
    return cv2.GaussianBlur(img, (5, 5), 0)


def make_dataset(root: str, n_train: int, n_test: int, size: int, seed: int = 0) -> None:
    rng = np.random.RandomState(seed)
    for split, n in (("train", n_train), ("test", n_test)):
        for d in ("t1", "t2", "label"):
            os.makedirs(os.path.join(root, split, d), exist_ok=True)
        for i in range(n):
            pre = _texture(rng, size)
            post = pre.copy()
            label = np.zeros((size, size), np.uint8)
            for _ in range(rng.randint(1, 4)):  # 1-3 inserted "buildings"
                w, h = rng.randint(size // 4, size // 2, 2)
                x, y = rng.randint(0, size - w), rng.randint(0, size - h)
                color = rng.randint(180, 255, 3).tolist()
                post[y : y + h, x : x + w] = color
                label[y : y + h, x : x + w] = 255
            cv2.imwrite(os.path.join(root, split, "t1", f"{i:04d}.png"), pre)
            cv2.imwrite(os.path.join(root, split, "t2", f"{i:04d}.png"), post)
            cv2.imwrite(os.path.join(root, split, "label", f"{i:04d}.png"), label)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", default="/tmp/synth_levir")
    ap.add_argument("--save_dir", default="/tmp/exp_overfit")
    ap.add_argument("--epochs", type=int, default=30)
    ap.add_argument("--size", type=int, default=64)
    ap.add_argument("--n_train", type=int, default=64)
    ap.add_argument("--n_test", type=int, default=16)
    ap.add_argument("--batch_size", type=int, default=8)
    ap.add_argument("--device", default=None, choices=[None, "tpu", "cpu"])
    ap.add_argument(
        "extra", nargs="*", default=[],
        help="extra cli.py flags, e.g. --packed --compute_dtype bfloat16",
    )
    args = ap.parse_args()

    if args.device == "cpu":
        os.environ["JAX_PLATFORMS"] = "cpu"
        import jax

        jax.config.update("jax_platforms", "cpu")

    if not os.path.exists(os.path.join(args.root, "train", "label")):
        make_dataset(args.root, args.n_train, args.n_test, args.size)
        print(f"built synthetic LEVIR-format dataset at {args.root}")

    from change3d_tpu.cli import main as cli_main

    steps = args.epochs * (args.n_train // args.batch_size)
    results = cli_main([
        "bcd",
        "--dataset", "SYNTH-OVERFIT",
        "--file_root", args.root,
        "--in_height", str(args.size),
        "--in_width", str(args.size),
        "--batch_size", str(args.batch_size),
        "--max_steps", str(steps),
        "--save_dir", args.save_dir,
        "--num_workers", "2",
    ] + list(args.extra))
    final = results.get("test_best") or results.get("last") or {}
    print(json.dumps({"final_F1": final.get("F1"), "scores": final}, default=float))
    f1 = float(final.get("F1", 0.0))
    print(f"OVERFIT {'PASS' if f1 >= 0.95 else 'FAIL'}: F1={f1:.4f} (target >= 0.95)")


if __name__ == "__main__":
    main()
