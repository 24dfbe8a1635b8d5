"""Task losses, exactly matching the reference formulations, jit-friendly.

ref: /root/reference/model/utils.py:154-203 (BCEDice, CrossEntropyLoss2d,
ChangeSimilarity) and /root/reference/scripts/train_CC.py:128-132 (packed
caption cross-entropy, replaced here by masked CE — identical mean because
the pack keeps exactly the first ``length-1`` positions of every sequence).

All reductions are computed in fp32.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_EPS = 1e-5


def bce_dice_loss(probs: jax.Array, targets: jax.Array) -> jax.Array:
    """BCE + (1 - Dice) on sigmoid outputs (ref: /root/reference/model/utils.py:154-169).

    probs: [B,H,W,1] in (0,1); targets: same shape {0,1}.
    """
    p = jnp.clip(probs.astype(jnp.float32), 1e-7, 1.0 - 1e-7)
    t = targets.astype(jnp.float32)
    bce = -jnp.mean(t * jnp.log(p) + (1.0 - t) * jnp.log(1.0 - p))
    inter = jnp.sum(p * t)
    dice = (2.0 * inter + _EPS) / (jnp.sum(p) + jnp.sum(t) + _EPS)
    return bce + 1.0 - dice


def cross_entropy_2d(logits: jax.Array, targets: jax.Array, *, ignore_index: int = -1) -> jax.Array:
    """NLL(log_softmax) with ignore_index, mean over valid pixels
    (ref: /root/reference/model/utils.py:171-178; SCD/BDA use ignore_index=0).

    logits: [B,H,W,C]; targets: [B,H,W] int.
    """
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    t = targets.astype(jnp.int32)
    valid = t != ignore_index
    t_safe = jnp.where(valid, t, 0)
    picked = jnp.take_along_axis(logp, t_safe[..., None], axis=-1)[..., 0]
    loss_sum = -jnp.sum(jnp.where(valid, picked, 0.0))
    count = jnp.maximum(jnp.sum(valid), 1)
    return loss_sum / count


def change_similarity_loss(logits1: jax.Array, logits2: jax.Array, label_change: jax.Array) -> jax.Array:
    """CosineEmbeddingLoss(margin=0) between softmaxed class maps
    (ref: /root/reference/model/utils.py:180-203): unchanged pixels pull the
    two distributions together (1 - cos), changed pixels push them apart
    (max(0, cos)).

    logits1/2: [B,H,W,C]; label_change: [B,H,W] (or [...,1]) in {0,1}.
    """
    p1 = jax.nn.softmax(logits1.astype(jnp.float32), axis=-1)
    p2 = jax.nn.softmax(logits2.astype(jnp.float32), axis=-1)
    num = jnp.sum(p1 * p2, axis=-1)
    cos = num / jnp.maximum(
        jnp.linalg.norm(p1, axis=-1) * jnp.linalg.norm(p2, axis=-1), 1e-8
    )
    change = jnp.squeeze(label_change, -1) if label_change.ndim == cos.ndim + 1 else label_change
    changed = change.astype(bool)
    per_pixel = jnp.where(changed, jnp.maximum(cos, 0.0), 1.0 - cos)
    return jnp.mean(per_pixel)


def caption_cross_entropy(
    logits: jax.Array, captions: jax.Array, lengths: jax.Array, *, ignore_index: int = 0
) -> jax.Array:
    """Teacher-forced caption CE over the first ``length-1`` target positions.

    logits: [B, L, V] = scores for predicting captions[:, 1:] from position
    t-1; captions: [B, L]; lengths: [B] true caption lengths (incl. <start>
    and <end>). Matches pack_padded_sequence + CrossEntropyLoss(ignore 0)
    (ref: /root/reference/scripts/train_CC.py:124-132).
    """
    targets = captions[:, 1:]
    logp = jax.nn.log_softmax(logits[:, :-1].astype(jnp.float32), axis=-1)
    picked = jnp.take_along_axis(logp, targets[..., None].astype(jnp.int32), axis=-1)[..., 0]
    pos = jnp.arange(targets.shape[1])[None, :]
    valid = (pos < (lengths[:, None] - 1)) & (targets != ignore_index)
    loss_sum = -jnp.sum(jnp.where(valid, picked, 0.0))
    return loss_sum / jnp.maximum(jnp.sum(valid), 1)


def caption_top_k_accuracy(logits, captions, lengths, k: int = 1):
    """top-k token accuracy over valid positions
    (ref: /root/reference/model/utils.py:493-507, called with k=1)."""
    targets = captions[:, 1:]
    pos = jnp.arange(targets.shape[1])[None, :]
    valid = pos < (lengths[:, None] - 1)
    topk = jax.lax.top_k(logits[:, :-1], k)[1]
    hit = jnp.any(topk == targets[..., None], axis=-1)
    return 100.0 * jnp.sum(jnp.where(valid, hit, False)) / jnp.maximum(jnp.sum(valid), 1)
