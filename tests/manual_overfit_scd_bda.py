"""End-to-end learning proofs for SCD and BDA through the real CLI.

Synthetic datasets with geometric, class-colored inserted changes so the
task is fully learnable:

- SCD ({split}/{t1,t2,label1,label2,change}): each change region shows a
  class-c1-colored patch in t1 and a class-c2 patch in t2; label1/label2 are
  the class ids inside the region (0 outside), change is 0/1.
- BDA ({split}/{t1,t2,label1,label2}, xBD 'disaster'->'disaster_target'
  naming): t1 has gray "buildings", t2 tints each by its damage class;
  label1 = building mask (0/1), label2 = damage class 1..4.

Usage:
    python tests/manual_overfit_scd_bda.py --task scd [--epochs 150]
    python tests/manual_overfit_scd_bda.py --task bda [--epochs 150]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import cv2
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Distinct, learnable class colors (BGR writes; loaders handle order per task).
PALETTE = np.array(
    [[0, 0, 0], [60, 200, 60], [200, 60, 60], [60, 60, 200], [200, 200, 60], [160, 60, 200]],
    np.uint8,
)


def _texture(rng, size):
    base = rng.randint(40, 120, (size // 4, size // 4, 3), np.uint8)
    return cv2.GaussianBlur(cv2.resize(base, (size, size)), (5, 5), 0)


def _rects(rng, size, n_lo=1, n_hi=4):
    for _ in range(rng.randint(n_lo, n_hi)):
        w, h = rng.randint(size // 4, size // 2, 2)
        x, y = rng.randint(0, size - w), rng.randint(0, size - h)
        yield x, y, w, h


def make_scd(root, n_train, n_test, size, n_classes, seed=0):
    rng = np.random.RandomState(seed)
    for split, n in (("train", n_train), ("test", n_test)):
        for d in ("t1", "t2", "label1", "label2", "change"):
            os.makedirs(os.path.join(root, split, d), exist_ok=True)
        for i in range(n):
            t1 = _texture(rng, size)
            t2 = t1.copy()
            l1 = np.zeros((size, size), np.uint8)
            l2 = np.zeros((size, size), np.uint8)
            ch = np.zeros((size, size), np.uint8)
            for x, y, w, h in _rects(rng, size):
                c1, c2 = rng.randint(1, n_classes, 2)
                t1[y : y + h, x : x + w] = PALETTE[c1]
                t2[y : y + h, x : x + w] = PALETTE[c2]
                l1[y : y + h, x : x + w] = c1
                l2[y : y + h, x : x + w] = c2
                ch[y : y + h, x : x + w] = 1
            for d, img in (("t1", t1), ("t2", t2), ("label1", l1), ("label2", l2), ("change", ch)):
                cv2.imwrite(os.path.join(root, split, d, f"{i:04d}.png"), img)


def make_bda(root, n_train, n_test, size, n_classes, seed=0):
    rng = np.random.RandomState(seed)
    for split, n in (("train", n_train), ("test", n_test)):
        for d in ("t1", "t2", "label1", "label2"):
            os.makedirs(os.path.join(root, split, d), exist_ok=True)
        for i in range(n):
            t1 = _texture(rng, size)
            t2 = t1.copy()
            loc = np.zeros((size, size), np.uint8)
            cls = np.zeros((size, size), np.uint8)
            for x, y, w, h in _rects(rng, size):
                dmg = rng.randint(1, n_classes)
                t1[y : y + h, x : x + w] = (150, 150, 150)  # pre: intact building
                t2[y : y + h, x : x + w] = PALETTE[dmg]  # post: damage-class color
                loc[y : y + h, x : x + w] = 1
                cls[y : y + h, x : x + w] = dmg
            name = f"{i:04d}_disaster.png"
            tname = f"{i:04d}_disaster_target.png"
            cv2.imwrite(os.path.join(root, split, "t1", name), t1)
            cv2.imwrite(os.path.join(root, split, "t2", name), t2)
            cv2.imwrite(os.path.join(root, split, "label1", tname), loc)
            cv2.imwrite(os.path.join(root, split, "label2", tname), cls)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--task", required=True, choices=["scd", "bda"])
    ap.add_argument("--root", default=None)
    ap.add_argument("--save_dir", default=None)
    ap.add_argument("--epochs", type=int, default=150)
    ap.add_argument("--size", type=int, default=64)
    ap.add_argument("--n_train", type=int, default=64)
    ap.add_argument("--n_test", type=int, default=16)
    ap.add_argument("--batch_size", type=int, default=8)
    ap.add_argument("--num_class", type=int, default=None)
    ap.add_argument(
        "extra", nargs="*", default=[],
        help="extra cli.py flags, e.g. --packed --compute_dtype bfloat16",
    )
    args = ap.parse_args()

    root = args.root or f"/tmp/synth_{args.task}"
    save_dir = args.save_dir or f"/tmp/exp_overfit_{args.task}"
    num_class = args.num_class or (6 if args.task == "scd" else 5)
    if not os.path.exists(os.path.join(root, "train", "t1")):
        (make_scd if args.task == "scd" else make_bda)(
            root, args.n_train, args.n_test, args.size, num_class
        )
        print(f"built synthetic {args.task} dataset at {root}")

    from change3d_tpu.cli import main as cli_main

    steps = args.epochs * (args.n_train // args.batch_size)
    results = cli_main([
        args.task, "--dataset", f"SYNTH-{args.task.upper()}",
        "--file_root", root,
        "--in_height", str(args.size), "--in_width", str(args.size),
        "--batch_size", str(args.batch_size), "--max_steps", str(steps),
        "--num_class", str(num_class),
        "--save_dir", save_dir, "--num_workers", "2",
    ] + list(args.extra))
    final = results.get("test_best") or results.get("last") or {}
    metric = "IoU_mean" if args.task == "scd" else "overall_f1"
    val = float(final.get(metric, 0.0))
    print(json.dumps({f"final_{metric}": val, "scores": final}, default=float))
    print(f"OVERFIT {'PASS' if val >= 0.85 else 'FAIL'}: {metric}={val:.4f} (target >= 0.85)")


if __name__ == "__main__":
    main()
