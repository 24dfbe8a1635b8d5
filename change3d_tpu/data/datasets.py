"""Dataset readers for the four Change3D task families.

Directory layouts match the reference exactly so existing prepared datasets
drop in (ref: /root/reference/data/dataset.py):

  BCD  {root}/{split}/{t1,t2,label}/<name>                      (:37-42)
  SCD  {root}/{split}/{t1,t2,label1,label2,change}/<name>       (:138-144)
  BDA  {root}/{split}/{t1,t2,label1,label2}; label filenames use the xBD
       'disaster' -> 'disaster_target' rewrite                  (:252-258)
  CC   {root}/{SPLIT}_IMAGES_{ds}.hdf5 + {SPLIT}_CAPTIONS_{ds}.json +
       {SPLIT}_CAPLENS_{ds}.json, 5 captions/image              (:365-393)

All readers return numpy; device placement is the pipeline's job. Files are
validated up front (reference behavior, :50-58).
"""

from __future__ import annotations

import json
import os
from os.path import join as osp
from typing import Optional

import cv2
import numpy as np

from change3d_tpu.data.transforms import TransformPipeline


def _imread_color(path: str, rgb: bool = True) -> np.ndarray:
    """Load a color image.

    ``rgb=True`` matches the reference's skimage.io.imread channel order used
    for BCD/SCD (ref: /root/reference/data/dataset.py:77-78,185-186) — the
    order the Kinetics-pretrained X3D features expect. BDA passes ``rgb=False``
    because the reference itself reads xBD with cv2 and therefore trains on
    BGR (ref: /root/reference/data/dataset.py:295-296).
    """
    img = cv2.imread(path, cv2.IMREAD_COLOR)
    if img is None:
        raise IOError(f"Failed to load image: {path}")
    return cv2.cvtColor(img, cv2.COLOR_BGR2RGB) if rgb else img


def _imread_gray(path: str) -> np.ndarray:
    img = cv2.imread(path, cv2.IMREAD_GRAYSCALE)
    if img is None:
        raise IOError(f"Failed to load mask: {path}")
    return img


class _PairDataset:
    def __init__(self, paths_lists, transform: Optional[TransformPipeline]):
        self.transform = transform
        for plist in paths_lists:
            for p in plist:
                if not os.path.exists(p):
                    raise FileNotFoundError(p)

    def __len__(self):
        return len(self.pre_images)  # type: ignore[attr-defined]


class BCDDataset(_PairDataset):
    """Binary change detection (LEVIR-CD / WHU-CD / CLCD layouts)."""

    def __init__(self, file_root: str, split: str, transform: Optional[TransformPipeline] = None):
        if not os.path.exists(file_root):
            raise FileNotFoundError(file_root)
        files = sorted(os.listdir(osp(file_root, split, "label")))
        self.pre_images = [osp(file_root, split, "t1", f) for f in files]
        self.post_images = [osp(file_root, split, "t2", f) for f in files]
        self.labels = [osp(file_root, split, "label", f) for f in files]
        super().__init__([self.pre_images, self.post_images, self.labels], transform)

    def __getitem__(self, idx: int, rng: Optional[np.random.Generator] = None):
        img = np.concatenate([_imread_color(self.pre_images[idx]), _imread_color(self.post_images[idx])], axis=2)
        label = _imread_gray(self.labels[idx])
        if self.transform is not None:
            return self.transform(img, label, rng)
        return img, label


class SCDDataset(_PairDataset):
    """Semantic change detection (SECOND / HRSCD layouts). Label channels:
    [label1, label2, change] (ref: /root/reference/data/dataset.py:185-211)."""

    def __init__(self, file_root: str, split: str, transform: Optional[TransformPipeline] = None):
        if not os.path.exists(file_root):
            raise FileNotFoundError(file_root)
        files = sorted(os.listdir(osp(file_root, split, "label1")))
        self.pre_images = [osp(file_root, split, "t1", f) for f in files]
        self.post_images = [osp(file_root, split, "t2", f) for f in files]
        self.pre_labels = [osp(file_root, split, "label1", f) for f in files]
        self.post_labels = [osp(file_root, split, "label2", f) for f in files]
        self.change_labels = [osp(file_root, split, "change", f) for f in files]
        super().__init__(
            [self.pre_images, self.post_images, self.pre_labels, self.post_labels, self.change_labels],
            transform,
        )

    def __getitem__(self, idx: int, rng: Optional[np.random.Generator] = None):
        img = np.concatenate([_imread_color(self.pre_images[idx]), _imread_color(self.post_images[idx])], axis=2)
        label = np.stack(
            [
                _imread_gray(self.pre_labels[idx]),
                _imread_gray(self.post_labels[idx]),
                _imread_gray(self.change_labels[idx]),
            ],
            axis=-1,
        ).astype(np.uint8)
        if self.transform is not None:
            return self.transform(img, label, rng)
        return img, label


class BDADataset(_PairDataset):
    """Building damage assessment (xBD layout). Label channels: [loc, cls]."""

    def __init__(self, file_root: str, split: str, transform: Optional[TransformPipeline] = None):
        if not os.path.exists(file_root):
            raise FileNotFoundError(file_root)
        files = sorted(os.listdir(osp(file_root, split, "t1")))
        self.pre_images = [osp(file_root, split, "t1", f) for f in files]
        self.post_images = [osp(file_root, split, "t2", f) for f in files]
        rewrite = lambda f: f.replace("disaster", "disaster_target")
        self.loc_labels = [osp(file_root, split, "label1", rewrite(f)) for f in files]
        self.cls_labels = [osp(file_root, split, "label2", rewrite(f)) for f in files]
        super().__init__(
            [self.pre_images, self.post_images, self.loc_labels, self.cls_labels], transform
        )

    def __getitem__(self, idx: int, rng: Optional[np.random.Generator] = None):
        img = np.concatenate(
            [
                _imread_color(self.pre_images[idx], rgb=False),
                _imread_color(self.post_images[idx], rgb=False),
            ],
            axis=2,
        )
        label = np.stack(
            [_imread_gray(self.loc_labels[idx]), _imread_gray(self.cls_labels[idx])], axis=-1
        ).astype(np.uint8)
        if self.transform is not None:
            return self.transform(img, label, rng)
        return img, label


class CaptionDataset:
    """LEVIR-CC / DUBAI-CC HDF5 + JSON caption data.

    Images stored as [N, 2, 3, H, W] uint8; 5 captions per image; ImageNet
    normalization (ref: /root/reference/scripts/train_CC.py:466-469); training
    randomly swaps the pair with p=0.3 (ref: /root/reference/data/dataset.py:426-427).
    """

    MEAN = np.array([0.485, 0.456, 0.406], np.float32)
    STD = np.array([0.229, 0.224, 0.225], np.float32)

    def __init__(self, file_root: str, dataset: str, split: str):
        import h5py

        self.split = split.upper()
        self.h5 = h5py.File(osp(file_root, f"{self.split}_IMAGES_{dataset}.hdf5"), "r")
        self.images = self.h5["images"]
        with open(osp(file_root, f"{self.split}_CAPTIONS_{dataset}.json")) as f:
            self.captions = json.load(f)
        with open(osp(file_root, f"{self.split}_CAPLENS_{dataset}.json")) as f:
            self.caplens = json.load(f)
        self.cpi = self.h5.attrs.get("captions_per_image", 5)

    def __len__(self):
        return len(self.captions)

    def __getitem__(self, idx: int, rng: Optional[np.random.Generator] = None):
        rng = rng or np.random.default_rng()
        img_idx = idx // self.cpi
        img = np.asarray(self.images[img_idx], np.float32) / 255.0  # [2, 3, H, W]
        img = img.transpose(0, 2, 3, 1)  # [2, H, W, 3]
        img = (img - self.MEAN) / self.STD
        if self.split == "TRAIN" and rng.random() < 0.3:
            img = img[::-1].copy()
        caption = np.asarray(self.captions[idx], np.int32)
        caplen = int(np.asarray(self.caplens[idx]).reshape(-1)[0])
        out = {"pre": img[0], "post": img[1], "caption": caption, "length": caplen}
        if self.split != "TRAIN":
            start = img_idx * self.cpi
            out["all_captions"] = np.asarray(self.captions[start : start + self.cpi], np.int32)
        return out

    def close(self):
        self.h5.close()
