"""Autoregressive caption decoder (transformer) + jittable beam search.

Reimplements the *effective* compute of the reference caption head
(ref: /root/reference/model/caption_decoder.py:272-613). Notes:

- The reference's ``Mesh_TransformerDecoderLayer`` constructs five attention
  modules, an FFN and three alpha-blend projections but its forward only uses
  ``self_attn`` -> norm1 -> ``multihead_attn2`` -> norm2
  (ref: /root/reference/model/caption_decoder.py:410-423). Only that live path
  is built here; dead submodules are intentionally dropped.
- Sinusoidal positional encoding with dropout 0.1
  (ref: /root/reference/model/caption_decoder.py:286-313).
- Embedding and output projection init uniform(-0.1, 0.1)
  (ref: /root/reference/model/caption_decoder.py:566-572).
- The reference sorts the batch by caption length and packs sequences; on TPU
  that is replaced by a static-shape padding mask in the loss (the idiomatic
  XLA form) — identical gradients, no dynamic shapes.
- Decoding (ref: /root/reference/scripts/train_CC.py:228-321) re-decodes the
  full 52-token prefix each step; here it is a fixed-52-step ``lax.scan``
  with per-beam completion bookkeeping, fully batched and jittable.

Layout: batch-first [B, L, E] (the reference is seq-first).
"""

from __future__ import annotations

import math
import jax
import jax.numpy as jnp
import flax.linen as nn

from change3d_tpu.init import (
    kaiming_normal_relu_init,
    uniform_init,
    xavier_uniform_init,
)
from change3d_tpu.ops.attention import (
    attend_projected,
    causal_mask,
    multi_head_attention,
    project_kv,
    project_q,
)
from change3d_tpu.ops.layers import linear

MAX_CAPTION_LEN = 52  # ref: /root/reference/model/caption_decoder.py:299


def sinusoidal_position_encoding(max_len: int, d_model: int) -> jnp.ndarray:
    position = jnp.arange(max_len, dtype=jnp.float32)[:, None]
    div_term = jnp.exp(jnp.arange(0, d_model, 2, dtype=jnp.float32) * (-math.log(10000.0) / d_model))
    pe = jnp.zeros((max_len, d_model), jnp.float32)
    pe = pe.at[:, 0::2].set(jnp.sin(position * div_term))
    pe = pe.at[:, 1::2].set(jnp.cos(position * div_term))
    return pe


class MHAParams(nn.Module):
    """Parameter container matching a converted torch nn.MultiheadAttention.

    Init parity: in_proj xavier-uniform / zero bias (torch _reset_parameters);
    out_proj kaiming-normal / zero bias (the reference's recursive
    ``weight_init`` reaches out_proj, ref: /root/reference/model/caption_decoder.py:380
    + /root/reference/model/utils.py:54-57).

    Besides the full-sequence ``__call__``, exposes the projection pieces the
    KV-cached incremental decode path needs (same parameters, same math).
    """

    embed_dim: int
    num_heads: int
    dropout: float = 0.1

    def setup(self):
        e = self.embed_dim
        self.in_proj_w = self.param("in_proj_w", xavier_uniform_init, (e, 3 * e))
        self.in_proj_b = self.param("in_proj_b", nn.initializers.zeros, (3 * e,))
        self.out_w = self.param("out_w", kaiming_normal_relu_init, (e, e))
        self.out_b = self.param("out_b", nn.initializers.zeros, (e,))

    def params_dict(self):
        return {
            "in_proj_w": self.in_proj_w,
            "in_proj_b": self.in_proj_b,
            "out_w": self.out_w,
            "out_b": self.out_b,
        }

    def __call__(self, q, k, v, *, attn_mask=None, deterministic: bool = True):
        rng = None
        if not deterministic and self.dropout > 0:
            rng = self.make_rng("dropout")
        return multi_head_attention(
            q, k, v, self.params_dict(), self.num_heads,
            attn_mask=attn_mask,
            dropout_rate=0.0 if deterministic else self.dropout,
            dropout_rng=rng,
        )

    def project_kv(self, x):
        return project_kv(x, self.params_dict(), self.embed_dim)

    def attend_step(self, q_t, kp, vp, *, attn_mask=None):
        """Single-query attention against projected keys/values."""
        p = self.params_dict()
        return attend_projected(
            project_q(q_t, p), kp, vp, self.num_heads, p["out_w"], p["out_b"],
            attn_mask=attn_mask,
        )


class LayerNorm(nn.Module):
    """torch nn.LayerNorm over the last axis, eps 1e-5, fp32 statistics."""

    dim: int
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x):
        scale = self.param("scale", nn.initializers.ones, (self.dim,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (self.dim,), jnp.float32)
        x32 = x.astype(jnp.float32)
        mean = jnp.mean(x32, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(x32 - mean), axis=-1, keepdims=True)
        y = (x32 - mean) * jax.lax.rsqrt(var + self.eps) * scale + bias
        return y.astype(x.dtype)


class CaptionDecoderLayer(nn.Module):
    embed_dim: int
    num_heads: int
    dropout: float = 0.1

    def setup(self):
        self.self_attn = MHAParams(self.embed_dim, self.num_heads, self.dropout)
        self.cross_attn = MHAParams(self.embed_dim, self.num_heads, self.dropout)
        self.norm1 = LayerNorm(self.embed_dim)
        self.norm2 = LayerNorm(self.embed_dim)
        self.drop1 = nn.Dropout(self.dropout)
        self.drop2 = nn.Dropout(self.dropout)

    def __call__(self, tgt, memory, *, tgt_mask=None, deterministic: bool = True):
        sa = self.self_attn(tgt, tgt, tgt, attn_mask=tgt_mask, deterministic=deterministic)
        sa = self.drop1(sa, deterministic=deterministic)
        x1 = self.norm1(tgt + sa)
        ca = self.cross_attn(x1, memory, memory, deterministic=deterministic)
        ca = self.drop2(ca, deterministic=deterministic)
        return self.norm2(x1 + ca)

    def step(self, x_t, memory_kv, cache, pos):
        """KV-cached single-token step (eval-only, deterministic).

        x_t: [B, 1, E]; memory_kv: projected cross-attention (k, v)
        [B, S, E] each; cache: dict {'k','v'} [B, Lmax, E]; pos: traced
        position index. Returns (y_t [B, 1, E], new cache). Mathematically
        identical to the full re-decode at column ``pos`` (shared
        attend_projected core; LayerNorm is per-token)."""
        k_t, v_t = self.self_attn.project_kv(x_t)
        k_all = jax.lax.dynamic_update_slice(cache["k"], k_t.astype(cache["k"].dtype), (0, pos, 0))
        v_all = jax.lax.dynamic_update_slice(cache["v"], v_t.astype(cache["v"].dtype), (0, pos, 0))
        lmax = k_all.shape[1]
        # Causal: attend to positions <= pos only.
        mask = jnp.where(jnp.arange(lmax) <= pos, 0.0, -jnp.inf)[None, :]
        sa = self.self_attn.attend_step(x_t, k_all, v_all, attn_mask=mask)
        x1 = self.norm1(x_t + sa)
        mk, mv = memory_kv
        ca = self.cross_attn.attend_step(x1, mk, mv)
        return self.norm2(x1 + ca), {"k": k_all, "v": v_all}


class CaptionDecoder(nn.Module):
    vocab_size: int
    embed_dim: int = 192
    num_heads: int = 8
    num_layers: int = 3
    dropout: float = 0.1

    def setup(self):
        self.vocab_embedding = self.param(
            "vocab_embedding", uniform_init(0.1), (self.vocab_size, self.embed_dim)
        )
        self.pe = sinusoidal_position_encoding(5000, self.embed_dim)
        self.layers = [
            CaptionDecoderLayer(self.embed_dim, self.num_heads, self.dropout, name=f"layer{i}")
            for i in range(self.num_layers)
        ]
        self.out_w = self.param("out_w", uniform_init(0.1), (self.embed_dim, self.vocab_size))
        self.out_b = self.param("out_b", nn.initializers.zeros, (self.vocab_size,))
        self.pe_dropout = nn.Dropout(0.1)
        self.out_dropout = nn.Dropout(self.dropout)

    def decode(self, tokens: jax.Array, memory: jax.Array, *, deterministic: bool = True):
        """tokens: [B, L] int32, memory: [B, S, E] -> logits [B, L, V]."""
        l = tokens.shape[1]
        x = jnp.take(self.vocab_embedding, tokens, axis=0).astype(memory.dtype)
        x = x + self.pe[:l].astype(x.dtype)
        x = self.pe_dropout(x, deterministic=deterministic)
        mask = causal_mask(l)
        for layer in self.layers:
            x = layer(x, memory, tgt_mask=mask, deterministic=deterministic)
        x = self.out_dropout(x, deterministic=deterministic)
        return linear(x, self.out_w, self.out_b)

    def __call__(self, memory: jax.Array, captions: jax.Array, *, deterministic: bool = True):
        """Teacher-forced training scores: predict caption[1:] from caption[:-1]."""
        return self.decode(captions, memory, deterministic=deterministic)

    # -- KV-cached incremental decode (eval) --------------------------------

    def init_decode_cache(self, batch: int, max_len: int, dtype=None):
        """Per-layer self-attention K/V caches [B, max_len, E]. Pass the
        memory dtype so bf16 serving carries bf16 caches (the hottest decode
        arrays) instead of silently widening to f32."""
        dtype = dtype or jnp.float32
        z = lambda: jnp.zeros((batch, max_len, self.embed_dim), dtype)
        return tuple({"k": z(), "v": z()} for _ in range(self.num_layers))

    def precompute_memory_kv(self, memory: jax.Array):
        """Project each layer's cross-attention keys/values from the image
        memory once per decode instead of once per step."""
        return tuple(layer.cross_attn.project_kv(memory) for layer in self.layers)

    def decode_step(self, tokens_t: jax.Array, memory_kv, cache, pos):
        """One incremental decode step (deterministic).

        tokens_t: [B] int32 tokens at position ``pos``; returns
        (logits [B, V] for position pos+1, new cache). Equivalent to column
        ``pos`` of ``decode`` on the full prefix, at O(1) attention cost per
        step instead of O(len) (the reference re-decodes the whole 52-token
        prefix every step, ref: /root/reference/scripts/train_CC.py:258-269).
        """
        x = jnp.take(self.vocab_embedding, tokens_t, axis=0)[:, None]
        x = x.astype(memory_kv[0][0].dtype)
        x = x + jax.lax.dynamic_slice_in_dim(self.pe, pos, 1).astype(x.dtype)[None]
        new_cache = []
        for layer, mkv, c in zip(self.layers, memory_kv, cache):
            x, c2 = layer.step(x, mkv, c, pos)
            new_cache.append(c2)
        return linear(x[:, 0], self.out_w, self.out_b), tuple(new_cache)


def make_incremental_fns(model):
    """(precompute, init_cache, step) triple for ``beam_search_decode``'s
    KV-cached mode, for any flax module exposing the decode-step surface
    (CaptionDecoder itself, or Change3D which forwards to its decoder)."""
    step_method = getattr(model, "decode_captions_step", None) or model.decode_step

    def precompute(variables, mem):
        return model.apply(variables, mem, method=model.precompute_memory_kv)

    def init_cache(variables, batch, max_len, dtype=None):
        return model.apply(variables, batch, max_len, dtype, method=model.init_decode_cache)

    def step(variables, tokens_t, mem_kv, cache, pos):
        return model.apply(variables, tokens_t, mem_kv, cache, pos, method=step_method)

    return precompute, init_cache, step


def beam_search_decode(
    apply_fn,
    variables,
    memory: jax.Array,
    *,
    beam_size: int,
    start_token: int,
    end_token: int,
    pad_token: int = 0,
    max_len: int = MAX_CAPTION_LEN,
    incremental=None,
    early_exit: bool = True,
):
    """Fixed-shape batched beam search with the reference's exact semantics
    (ref: /root/reference/scripts/train_CC.py:256-332):

    - cumulative (unnormalized) log-prob ranking;
    - a beam that emits <end> is *retired*: it's recorded as a completed
      sequence and the live beam width shrinks by one (the reference's
      ``k -= len(complete_inds)``), so later steps keep fewer continuations;
    - the answer is the highest-scoring completed sequence over the whole
      search (the reference's max over ``complete_seqs_scores``), tracked in
      the scan carry so a completion can never be lost;
    - if nothing completes within the length budget, fall back to the best
      live beam (the reference's fallback path would crash there; this is the
      bounded, documented divergence).

    Fixed shapes throughout: retirement is expressed as k slots with an
    ``alive`` mask and a per-batch live-width counter — rank-r candidates
    with r >= live width are discarded exactly like the reference's shrink.

    When ``incremental`` is a (precompute_fn, init_cache_fn, step_fn) triple
    (see ``make_incremental_fns``), each step decodes ONE token against
    per-layer KV caches carried through the scan instead of re-decoding the
    whole prefix — O(L) total attention instead of O(L^2), identical results
    (equality-tested).

    With ``early_exit`` (default) the fixed-trip scan becomes a
    ``lax.while_loop`` that stops as soon as no beam anywhere in the batch is
    still alive — the reference's own ``if k == 0: break``
    (ref: /root/reference/scripts/train_CC.py:316-317). Once every beam has
    retired, a step is a provable no-op on everything the result depends on
    (all candidates score ``neg_inf`` so nothing is kept, completed, or
    improved), so results are bit-identical to the full-length scan
    (equality-tested) while real captions (~10-20 of 52 tokens) pay only the
    steps they use.

    memory: [B, S, E]. Returns (tokens [B, max_len], scores [B]).
    """
    b, s, e = memory.shape
    k = beam_size
    neg_inf = jnp.float32(-1e9)

    # k=1 (greedy, the serving/bench default): every repeat below is an
    # identity — skip the copies outright (bit-identical by construction).
    mem = memory if k == 1 else jnp.repeat(memory, k, axis=0)  # [B*k, S, E]
    tokens = jnp.full((b * k, max_len), pad_token, jnp.int32).at[:, 0].set(start_token)
    # Beam 0 active, others -inf so the first expansion fans out from one beam.
    scores = jnp.tile(jnp.concatenate([jnp.zeros((1,)), jnp.full((k - 1,), neg_inf)]), (b,))
    alive = jnp.tile(jnp.arange(k) == 0, (b,))  # [B*k]
    n_live = jnp.full((b,), k, jnp.int32)  # reference's shrinking k
    best_tokens = jnp.full((b, max_len), pad_token, jnp.int32)
    best_scores = jnp.full((b,), neg_inf)

    if incremental is not None:
        precompute_fn, init_cache_fn, step_fn = incremental
        # Project cross-attention K/V from the UN-repeated memory (the k
        # beam copies per image are identical rows), then repeat the results.
        mem_kv = precompute_fn(variables, memory)
        if k > 1:
            mem_kv = jax.tree_util.tree_map(lambda a: jnp.repeat(a, k, axis=0), mem_kv)
        cache0 = init_cache_fn(variables, b * k, max_len, memory.dtype)

    def step(carry, t):
        if incremental is not None:
            tokens, scores, alive, n_live, best_tokens, best_scores, cache = carry
            step_logits, cache = step_fn(variables, tokens[jnp.arange(b * k), t - 1], mem_kv, cache, t - 1)
            logp = jax.nn.log_softmax(step_logits.astype(jnp.float32), axis=-1)
        else:
            tokens, scores, alive, n_live, best_tokens, best_scores = carry
            logits = apply_fn(variables, tokens, mem)  # [B*k, L, V]
            logp = jax.nn.log_softmax(logits[:, t - 1].astype(jnp.float32), axis=-1)
        # Clamp underflowed log-probs: a legitimate live candidate whose
        # fp32 log_softmax rounds to -inf must stay distinguishable from the
        # dead-slot sentinel (neg_inf) or the `kept` filter below would drop
        # it even when it is the only continuation. -1e6 per step keeps the
        # worst-case cumulative score (52 steps) far above neg_inf/2.
        logp = jnp.maximum(logp, jnp.float32(-1e6))
        v = logp.shape[-1]
        # Dead slots (retired or never populated) produce no candidates.
        cand = jnp.where(alive[:, None], scores[:, None] + logp, neg_inf)
        cand = cand.reshape(b, k * v)
        top_scores, top_idx = jax.lax.top_k(cand, k)  # [B, k] ranked desc
        beam_idx = top_idx // v + jnp.arange(b)[:, None] * k  # into [B*k]
        tok_idx = top_idx % v
        if k == 1:
            # Single-beam: top_idx // v == 0 always, so the parent
            # permutation is the identity — skip the gather (and, below, the
            # per-layer KV-cache gathers: 6 full-cache copies per step that
            # dominate greedy-decode time). Bit-identical by construction.
            tokens = tokens.reshape(b, k, max_len)
        else:
            tokens = tokens[beam_idx.reshape(-1)].reshape(b, k, max_len)
        tokens = tokens.at[:, :, t].set(tok_idx)
        # Only the first n_live ranked candidates are kept (shrunk width).
        kept = jnp.arange(k)[None, :] < n_live[:, None]  # [B, k]
        kept = kept & (top_scores > neg_inf / 2)  # no live parents -> nothing kept
        done_now = kept & (tok_idx == end_token)
        # Record this step's best completion into the running best.
        step_best = jnp.max(jnp.where(done_now, top_scores, neg_inf), axis=1)
        step_arg = jnp.argmax(jnp.where(done_now, top_scores, neg_inf), axis=1)
        improved = step_best > best_scores
        best_scores = jnp.where(improved, step_best, best_scores)
        best_tokens = jnp.where(
            improved[:, None], tokens[jnp.arange(b), step_arg], best_tokens
        )
        n_live = n_live - jnp.sum(done_now, axis=1).astype(jnp.int32)
        alive = (kept & ~done_now).reshape(-1)
        scores = jnp.where(alive, top_scores.reshape(-1), neg_inf)
        out = (tokens.reshape(b * k, max_len), scores, alive, n_live, best_tokens, best_scores)
        if incremental is not None:
            if k == 1:
                cache2 = cache  # identity permutation (see above)
            else:
                # Beams follow their parents: caches reorder with the gather.
                flat_idx = beam_idx.reshape(-1)
                cache2 = jax.tree_util.tree_map(lambda a: a[flat_idx], cache)
            out = out + (cache2,)
        return out, None

    carry0 = (tokens, scores, alive, n_live, best_tokens, best_scores)
    if incremental is not None:
        carry0 = carry0 + (cache0,)
    if early_exit:
        # Same step body; stop as soon as no beam in the batch is alive
        # (carry[2] is the flat alive mask). Identical results, fewer steps.
        def cond(state):
            t, carry = state
            return (t < max_len) & jnp.any(carry[2])

        def body(state):
            t, carry = state
            return t + 1, step(carry, t)[0]

        _, final_carry = jax.lax.while_loop(cond, body, (jnp.int32(1), carry0))
    else:
        final_carry, _ = jax.lax.scan(step, carry0, jnp.arange(1, max_len))
    tokens, scores, alive, n_live, best_tokens, best_scores = final_carry[:6]
    # Fallback when nothing completed: best live beam.
    any_done = best_scores > neg_inf / 2
    live_scores = jnp.where(alive, scores, neg_inf).reshape(b, k)
    fb = jnp.argmax(live_scores, axis=1)
    fb_tokens = tokens.reshape(b, k, max_len)[jnp.arange(b), fb]
    out_tokens = jnp.where(any_done[:, None], best_tokens, fb_tokens)
    out_scores = jnp.where(any_done, best_scores, live_scores[jnp.arange(b), fb])
    return out_tokens, out_scores
