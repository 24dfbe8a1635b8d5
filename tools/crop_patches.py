#!/usr/bin/env python
"""Crop large scene rasters into fixed-size training patches.

The reference instructs users to "crop each image into 256x256 patches"
by hand for every detection dataset (ref: /root/reference/README.md:76-121);
this tool does it, preserving whatever split/modality folder layout the
datasets use:

    BCD  {root}/{train,val,test}/{t1,t2,label}/scene.png
    SCD  {root}/{train,val,test}/{t1,t2,label1,label2,change}/scene.png
    BDA  {root}/{train,val,test}/{t1,t2,label1,label2}/scene.png

Every image directory under a split is cropped identically; scenes are
matched across modality dirs by sorted position (filenames may carry
per-directory suffixes, e.g. xBD's `..._disaster_target.png` labels), so
patch k of t1 aligns with patch k of t2 and of every label.
Label folders (any directory whose name starts with "label" or equals
"change") are written with nearest-neighbor semantics — no interpolation is
performed anywhere; crops are pure slices.

Scenes smaller than the patch in either dimension are skipped with a
warning. The trailing window is anchored to the image edge when the size is
not a multiple of the stride, so full coverage without padding.

Usage:
    python tools/crop_patches.py --in_root /data/LEVIR-CD-raw \
        --out_root /data/LEVIR-CD --size 256 [--stride 256] [--splits train,val,test]
"""

from __future__ import annotations

import argparse
import os

# Same coverage grid as TiledPredictor's inference-time windows — patches
# cropped with the defaults are exactly what tiled prediction will see.
from change3d_tpu.utils.tiling import window_starts


def crop_scene(img, size: int, stride: int):
    h, w = img.shape[:2]
    for y in window_starts(h, size, stride):
        for x in window_starts(w, size, stride):
            yield y, x, img[y : y + size, x : x + size]


def crop_split(in_split: str, out_split: str, size: int, stride: int) -> int:
    """Scenes are matched ACROSS modality subdirs by sorted position, not by
    identical filename — xBD-style labels carry a name suffix
    ('..._disaster_target.png' next to t1's '..._disaster.png', the rewrite
    BDADataset applies); a constant per-directory suffix preserves sorted
    order, so position i is the same scene in every subdir. Each patch keeps
    its own subdir's stem, so the dataset-side name rewrites keep working on
    the cropped output."""
    import cv2

    subdirs = sorted(
        d for d in os.listdir(in_split) if os.path.isdir(os.path.join(in_split, d))
    )
    n_patches = 0
    for sub in subdirs:
        os.makedirs(os.path.join(out_split, sub), exist_ok=True)
    listings = {sub: sorted(os.listdir(os.path.join(in_split, sub))) for sub in subdirs}
    counts = {sub: len(v) for sub, v in listings.items()}
    if len(set(counts.values())) != 1:
        raise ValueError(f"{in_split}: modality dirs disagree on scene count: {counts}")
    for i in range(counts[subdirs[0]]):
        hw = None
        for sub in subdirs:
            name = listings[sub][i]
            stem, ext = os.path.splitext(name)
            path = os.path.join(in_split, sub, name)
            img = cv2.imread(path, cv2.IMREAD_UNCHANGED)
            if img is None:
                raise FileNotFoundError(f"{path} is not a readable image")
            if hw is None:
                hw = img.shape[:2]
            elif img.shape[:2] != hw:
                raise ValueError(
                    f"{path}: {img.shape[:2]} != {hw} of its scene's first "
                    "modality — crops would misalign"
                )
            wrote = 0
            for y, x, patch in crop_scene(img, size, stride):
                cv2.imwrite(os.path.join(out_split, sub, f"{stem}_{y}_{x}{ext}"), patch)
                wrote += 1
            if wrote == 0:
                print(f"warning: {path} smaller than {size}, skipped")
            if sub == subdirs[0]:
                n_patches += wrote
    return n_patches


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--in_root", required=True, help="scene-level dataset root")
    ap.add_argument("--out_root", required=True)
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--stride", type=int, default=None,
                    help="window stride (default: --size, i.e. non-overlapping)")
    ap.add_argument("--splits", default=None,
                    help="comma list (default: every subdir of in_root)")
    args = ap.parse_args(argv)
    stride = args.stride or args.size
    splits = (
        args.splits.split(",")
        if args.splits
        else sorted(
            d for d in os.listdir(args.in_root)
            if os.path.isdir(os.path.join(args.in_root, d))
        )
    )
    for split in splits:
        n = crop_split(
            os.path.join(args.in_root, split), os.path.join(args.out_root, split),
            args.size, stride,
        )
        print(f"{split}: {n} patches per modality")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
