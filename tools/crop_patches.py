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
matched across modality dirs by canonical scene key (stem with an
xBD-style `_target` label suffix stripped), so patch k of t1 aligns with
patch k of t2 and of every label even when label filenames differ.
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


def scene_key(name: str) -> str:
    """Canonical scene id of a filename: the stem with an xBD-style
    '_target' label suffix stripped ('x_pre_disaster_target.png' and
    'x_pre_disaster.png' are the same scene — the rewrite BDADataset
    applies); BCD/SCD names are their own key."""
    stem = os.path.splitext(name)[0]
    return stem[: -len("_target")] if stem.endswith("_target") else stem


def crop_split(in_split: str, out_split: str, size: int, stride: int) -> int:
    """Scenes are matched ACROSS modality subdirs by canonical scene key
    (see scene_key) — NOT by sorted position, which per-directory suffixes
    break (e.g. 'storm_1' sorts before 'storm_10' in t1 but after it with
    '_target' appended). Missing/extra scenes in any dir are a hard error.
    Each patch keeps its own subdir's stem, so the dataset-side name
    rewrites keep working on the cropped output."""
    import cv2

    subdirs = sorted(
        d for d in os.listdir(in_split) if os.path.isdir(os.path.join(in_split, d))
    )
    n_patches = 0
    for sub in subdirs:
        os.makedirs(os.path.join(out_split, sub), exist_ok=True)
    by_key = {}
    for sub in subdirs:
        names = {}
        for name in os.listdir(os.path.join(in_split, sub)):
            key = scene_key(name)
            if key in names:
                raise ValueError(f"{in_split}/{sub}: duplicate scene key {key!r}")
            names[key] = name
        by_key[sub] = names
    keys = set(by_key[subdirs[0]])
    for sub in subdirs[1:]:
        if set(by_key[sub]) != keys:
            diff = keys.symmetric_difference(by_key[sub])
            raise ValueError(
                f"{in_split}: {subdirs[0]} and {sub} disagree on scenes: "
                f"{sorted(diff)[:5]}"
            )
    for key in sorted(keys):
        hw = None
        for sub in subdirs:
            name = by_key[sub][key]
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
