"""Host-side augmentation pipeline (numpy/cv2), channel-last output.

Replicates the reference pipelines (ref: /root/reference/data/transforms.py:
BCD :165-205, SCD :369-401, BDA :567-599): normalize(/255, mean .5, std .5)
-> scale(W, H) -> random_crop_resize(crop_area=int(7/224*W), p=.5) ->
random_flip(h & v, p=.5 each) -> random_exchange(p=.5) — with the per-task
label differences:

- BCD binarizes the mask with ceil(label/255) (ref: transforms.py:134);
- SCD swaps label1/label2 when the temporal order is exchanged
  (ref: transforms.py:323-326);
- BDA leaves its (loc, cls) labels alone on exchange (ref: transforms.py:552-554
  region — image-only swap).

Output is kept HWC float32 (images) / HW[C] integer (labels); the device-side
stacking happens in the train step. Each sample draw takes an explicit
``np.random.Generator`` so the pipeline is seedable and multi-worker safe.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Tuple

import cv2
import numpy as np


@dataclass
class TransformPipeline:
    """Configurable bi-temporal augmentation pipeline.

    ``task`` in {'bcd', 'scd', 'bda'} controls label handling.
    """

    width: int = 256
    height: int = 256
    task: str = "bcd"
    train: bool = True
    mean: float = 0.5
    std: float = 0.5

    def __post_init__(self):
        self.crop_area = int(7.0 / 224.0 * self.width)

    def __call__(self, image: np.ndarray, label: np.ndarray, rng: Optional[np.random.Generator] = None):
        """image: [H, W, 6] uint8 (pre|post); label: [H, W] or [H, W, C] int.

        Returns (image float32 [H, W, 6], label int32 [H, W, C'])."""
        rng = rng or np.random.default_rng()
        image = image.astype(np.float32) / 255.0
        if self.task == "bcd":
            label = np.ceil(label.astype(np.float32) / 255.0)
        image = (image - self.mean) / self.std
        label = label.astype(np.float32)

        if image.shape[0] != self.height or image.shape[1] != self.width:
            image = cv2.resize(image, (self.width, self.height))
            label = cv2.resize(label, (self.width, self.height), interpolation=cv2.INTER_NEAREST)

        if self.train:
            if rng.random() < 0.5 and self.crop_area > 0:
                h, w = image.shape[:2]
                x1 = int(rng.integers(0, self.crop_area + 1))
                y1 = int(rng.integers(0, self.crop_area + 1))
                image = cv2.resize(image[y1 : h - y1, x1 : w - x1], (w, h))
                label = cv2.resize(
                    label[y1 : h - y1, x1 : w - x1], (w, h), interpolation=cv2.INTER_NEAREST
                )
            if rng.random() < 0.5:
                image = image[::-1].copy()
                label = label[::-1].copy()
            if rng.random() < 0.5:
                image = image[:, ::-1].copy()
                label = label[:, ::-1].copy()
            if rng.random() < 0.5:
                image = np.concatenate([image[:, :, 3:6], image[:, :, 0:3]], axis=2)
                if self.task == "scd":
                    # swap label1/label2, keep change (ref: transforms.py:323-326)
                    label = np.stack([label[..., 1], label[..., 0], label[..., 2]], axis=-1)

        if label.ndim == 2:
            label = label[..., None]
        return image.astype(np.float32), label.astype(np.int32)


def eval_normalize(img: np.ndarray) -> np.ndarray:
    """The detection eval normalization (/255, mean .5, std .5) WITHOUT the
    resize — the single definition tiled prediction and serving share with
    TransformPipeline (ref: /root/reference/data/transforms.py:190-197)."""
    return (img.astype(np.float32) / 255.0 - 0.5) / 0.5


def make_transform_pipelines(task: str, width: int = 256, height: int = 256) -> Tuple[TransformPipeline, TransformPipeline]:
    """(train, eval) pipelines, mirroring get_transform_pipelines
    (ref: /root/reference/data/transforms.py:165-205)."""
    return (
        TransformPipeline(width, height, task, train=True),
        TransformPipeline(width, height, task, train=False),
    )
