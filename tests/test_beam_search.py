"""Beam-search semantics: k=1 equals stepwise greedy decode; beams stop at
<end>; larger beams never score worse than greedy."""

import numpy as np

import jax
import jax.numpy as jnp

from change3d_tpu.models.caption_decoder import CaptionDecoder, beam_search_decode

V, E, L = 12, 16, 10
START, END, PAD = 2, 3, 0


def _setup():
    dec = CaptionDecoder(vocab_size=V, embed_dim=E, num_heads=4, num_layers=1)
    memory = jax.random.normal(jax.random.PRNGKey(0), (2, 6, E))
    variables = dec.init(jax.random.PRNGKey(1), memory, jnp.zeros((2, 4), jnp.int32))

    def apply_tokens(vs, tokens, mem):
        return dec.apply(vs, tokens, mem, method=dec.decode)

    return dec, variables, memory, apply_tokens


def _greedy_reference(apply_tokens, variables, memory):
    """Stepwise greedy re-decode (the reference's k=1 loop semantics,
    ref: /root/reference/scripts/train_CC.py:258-321)."""
    b = memory.shape[0]
    tokens = np.full((b, L), PAD, np.int32)
    tokens[:, 0] = START
    done = np.zeros(b, bool)
    for t in range(1, L):
        logits = np.asarray(apply_tokens(variables, jnp.asarray(tokens), memory))
        nxt = logits[:, t - 1].argmax(-1)
        nxt = np.where(done, PAD, nxt)
        tokens[:, t] = nxt
        done |= nxt == END
    return tokens


def test_beam1_equals_greedy():
    _, variables, memory, apply_tokens = _setup()
    got, _ = beam_search_decode(
        apply_tokens, variables, memory,
        beam_size=1, start_token=START, end_token=END, pad_token=PAD, max_len=L,
    )
    ref = _greedy_reference(apply_tokens, variables, memory)
    np.testing.assert_array_equal(np.asarray(got), ref)


def test_beams_freeze_after_end():
    _, variables, memory, apply_tokens = _setup()
    tokens, _ = beam_search_decode(
        apply_tokens, variables, memory,
        beam_size=3, start_token=START, end_token=END, pad_token=PAD, max_len=L,
    )
    tokens = np.asarray(tokens)
    for row in tokens:
        ends = np.where(row == END)[0]
        if len(ends):
            assert np.all(row[ends[0] + 1 :] == PAD)


def test_wider_beam_never_scores_worse():
    _, variables, memory, apply_tokens = _setup()
    def score(k):
        _, s = beam_search_decode(
            apply_tokens, variables, memory,
            beam_size=k, start_token=START, end_token=END, pad_token=PAD, max_len=L,
        )
        return np.asarray(s)

    s1, s4 = score(1), score(4)
    assert np.all(s4 >= s1 - 1e-4), (s1, s4)
