"""Multi-head attention with torch ``nn.MultiheadAttention`` weight semantics.

Used by the caption decoder (ref: /root/reference/model/caption_decoder.py:344-350).
Batch-first [B, L, E] layout (the reference is seq-first; batch-first keeps the
batch axis leading for data-parallel sharding and gives XLA [B*H, L, S] batched
matmuls that tile cleanly onto the MXU).

Parameter layout (matching a converted torch state_dict):
  in_proj_w: [E, 3E]   (torch in_proj_weight [3E, E], transposed)
  in_proj_b: [3E]
  out_w:     [E, E]    (torch out_proj.weight [E, E], transposed)
  out_b:     [E]
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp

from change3d_tpu.ops.layers import linear


def project_q(x: jax.Array, params: dict) -> jax.Array:
    e = x.shape[-1]
    return linear(x, params["in_proj_w"][:, :e], params["in_proj_b"][:e])


def project_kv(x: jax.Array, params: dict, e: Optional[int] = None):
    """Project keys/values: [B, L, E] -> ([B, L, E], [B, L, E])."""
    e = e or x.shape[-1]
    w, bias = params["in_proj_w"], params["in_proj_b"]
    k = linear(x, w[:, e : 2 * e], bias[e : 2 * e])
    v = linear(x, w[:, 2 * e :], bias[2 * e :])
    return k, v


def attend_projected(
    qp: jax.Array,
    kp: jax.Array,
    vp: jax.Array,
    num_heads: int,
    out_w: jax.Array,
    out_b: jax.Array,
    *,
    attn_mask: Optional[jax.Array] = None,
    dropout_rate: float = 0.0,
    dropout_rng: Optional[jax.Array] = None,
) -> jax.Array:
    """Attention over already-projected q/k/v [B, L, E]; attn_mask additive,
    broadcastable to [Lq, Lkv]. Shared core of the full-sequence and
    KV-cached incremental paths."""
    b, lq, e = qp.shape
    lkv = kp.shape[1]
    head_dim = e // num_heads
    assert head_dim * num_heads == e

    # [B, H, L, D]
    qh = qp.reshape(b, lq, num_heads, head_dim).transpose(0, 2, 1, 3)
    kh = kp.reshape(b, lkv, num_heads, head_dim).transpose(0, 2, 1, 3)
    vh = vp.reshape(b, lkv, num_heads, head_dim).transpose(0, 2, 1, 3)

    scale = 1.0 / math.sqrt(head_dim)
    logits = jnp.einsum("bhqd,bhkd->bhqk", qh * scale, kh, preferred_element_type=jnp.float32)
    if attn_mask is not None:
        logits = logits + attn_mask.astype(jnp.float32)
    weights = jax.nn.softmax(logits, axis=-1).astype(qp.dtype)
    if dropout_rate > 0.0 and dropout_rng is not None:
        keep = jax.random.bernoulli(dropout_rng, 1.0 - dropout_rate, weights.shape)
        weights = jnp.where(keep, weights / (1.0 - dropout_rate), 0.0)

    out = jnp.einsum("bhqk,bhkd->bhqd", weights, vh, preferred_element_type=jnp.float32).astype(qp.dtype)
    out = out.transpose(0, 2, 1, 3).reshape(b, lq, e)
    return linear(out, out_w, out_b)


def multi_head_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    params: dict,
    num_heads: int,
    *,
    attn_mask: Optional[jax.Array] = None,
    dropout_rate: float = 0.0,
    dropout_rng: Optional[jax.Array] = None,
) -> jax.Array:
    """q: [B, Lq, E], k/v: [B, Lkv, E]; attn_mask additive [Lq, Lkv] or None."""
    e = q.shape[-1]
    qp = project_q(q, params)
    kp, vp = project_kv(k, params, e)
    return attend_projected(
        qp, kp, vp, num_heads, params["out_w"], params["out_b"],
        attn_mask=attn_mask, dropout_rate=dropout_rate, dropout_rng=dropout_rng,
    )


def causal_mask(length: int, dtype=jnp.float32) -> jax.Array:
    """Additive causal mask: 0 on/below diagonal, -inf above
    (ref: /root/reference/model/caption_decoder.py:590-593)."""
    mask = jnp.triu(jnp.full((length, length), -jnp.inf, dtype=dtype), k=1)
    return mask
