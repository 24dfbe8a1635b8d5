"""Optimizers with torch semantics.

The reference uses torch Adam with *coupled* L2 weight decay (decay added to
the gradient before the moment updates, ref:
/root/reference/scripts/train_BCD.py:284-290: Adam(lr, (0.9, 0.99), eps=1e-8,
weight_decay=1e-4)) and, for CC, elementwise gradient value clipping at +-5
(ref: /root/reference/model/utils.py:481-491).

optax.adamw is *decoupled* (AdamW) and optax.adam has no decay, so torch-Adam
is built explicitly: clip -> add_decayed_weights -> scale_by_adam -> lr.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import optax


def torch_adam(
    schedule: Callable,
    *,
    b1: float = 0.9,
    b2: float = 0.99,
    eps: float = 1e-8,
    weight_decay: float = 0.0,
    grad_clip_value: Optional[float] = None,
) -> optax.GradientTransformation:
    parts = []
    if grad_clip_value is not None:
        parts.append(optax.clip(grad_clip_value))
    if weight_decay:
        parts.append(optax.add_decayed_weights(weight_decay))
    parts.append(optax.scale_by_adam(b1=b1, b2=b2, eps=eps))
    parts.append(optax.scale_by_learning_rate(schedule))
    return optax.chain(*parts)


def per_subtree_lr(
    encoder_tx: optax.GradientTransformation,
    decoder_tx: optax.GradientTransformation,
    encoder_prefix: str = "encoder",
) -> optax.GradientTransformation:
    """Two optimizers keyed by top-level param subtree — the reference's
    separate encoder/decoder Adams with independent learning rates
    (ref: /root/reference/scripts/train_CC.py:439-455)."""

    def label(params):
        return jax.tree_util.tree_map_with_path(
            lambda path, _: "encoder" if str(path[0].key) == encoder_prefix else "decoder",
            params,
        )

    return optax.multi_transform({"encoder": encoder_tx, "decoder": decoder_tx}, label)


def freeze_subtree(tx: optax.GradientTransformation, frozen_prefix: str) -> optax.GradientTransformation:
    """Zero all updates under a top-level param subtree (the reference's
    ``fine_tune_encoder=False`` mode, ref: /root/reference/scripts/train_CC.py:439-448:
    the encoder optimizer simply isn't created)."""

    def label(params):
        return jax.tree_util.tree_map_with_path(
            lambda path, _: "frozen" if str(path[0].key) == frozen_prefix else "train", params
        )

    return optax.multi_transform(
        {"train": tx, "frozen": optax.set_to_zero()}, label
    )
