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


def _log_softmax(x):
    x = x - x.max(-1, keepdims=True)
    return x - np.log(np.exp(x).sum(-1, keepdims=True))


def _reference_beam_oracle(apply_tokens, variables, memory_row, k, max_len):
    """Plain-Python transliteration of the reference's beam-search loop
    (ref: /root/reference/scripts/train_CC.py:256-332): beams retire on <end>
    (k shrinks), all completions are kept, highest-scoring completion wins.
    memory_row: [S, E] for one image. Returns (tokens list, score) or None if
    nothing completed."""
    mem_full = jnp.tile(jnp.asarray(memory_row)[None], (k, 1, 1))
    k_prev_words = np.full((k, max_len), PAD, np.int64)
    k_prev_words[:, 0] = START
    seqs = np.full((k, 1), START, np.int64)
    top_k_scores = np.zeros((k, 1))
    complete_seqs, complete_scores = [], []
    step = 1
    while True:
        s = k_prev_words.shape[0]
        logits = np.asarray(
            apply_tokens(variables, jnp.asarray(k_prev_words, np.int32), mem_full[:s])
        ).astype(np.float64)
        scores = _log_softmax(logits[:, step - 1])  # [s, V]
        vocab = scores.shape[-1]
        scores = top_k_scores + scores
        if step == 1:
            flat = scores[0]
        else:
            flat = scores.reshape(-1)
        order = np.argsort(-flat)[:k]
        top_scores, top_words = flat[order], order
        prev = top_words // vocab if step > 1 else np.zeros(k, np.int64)
        nxt = top_words % vocab if step > 1 else top_words
        seqs = np.concatenate([seqs[prev], nxt[:, None]], axis=1)
        incomplete = [i for i, w in enumerate(nxt) if w != END]
        complete = [i for i in range(len(nxt)) if i not in incomplete]
        if complete:
            complete_seqs.extend(seqs[complete].tolist())
            complete_scores.extend(top_scores[complete].tolist())
        k -= len(complete)
        if k == 0:
            break
        seqs = seqs[incomplete]
        top_k_scores = top_scores[incomplete][:, None]
        k_prev_words = k_prev_words[prev[incomplete]]
        k_prev_words[:, : step + 1] = seqs
        if step > max_len - 2:
            break
        step += 1
    if not complete_scores:
        return None
    i = int(np.argmax(complete_scores))
    return complete_seqs[i], complete_scores[i]


def test_beam_k3_k5_match_reference_oracle():
    _, variables, memory, apply_tokens = _setup()
    for k in (3, 5):
        got_tokens, got_scores = beam_search_decode(
            apply_tokens, variables, memory,
            beam_size=k, start_token=START, end_token=END, pad_token=PAD, max_len=L,
        )
        got_tokens, got_scores = np.asarray(got_tokens), np.asarray(got_scores)
        for row in range(memory.shape[0]):
            oracle = _reference_beam_oracle(apply_tokens, variables, memory[row], k, L)
            if oracle is None:
                continue  # nothing completed: ours falls back to best live beam
            ref_seq, ref_score = oracle
            got = [int(t) for t in got_tokens[row] if int(t) != PAD]
            assert got == [int(t) for t in ref_seq], (k, row, got, ref_seq)
            np.testing.assert_allclose(got_scores[row], ref_score, rtol=1e-4)


def test_incremental_decode_matches_full_redecode():
    # KV-cached single-token steps must reproduce the full-prefix decode's
    # per-position logits exactly (deterministic, fp32).
    dec, variables, memory, apply_tokens = _setup()
    from change3d_tpu.models.caption_decoder import make_incremental_fns

    pre_fn, init_fn, step_fn = make_incremental_fns(dec)
    b = memory.shape[0]
    tokens = np.full((b, L), PAD, np.int32)
    tokens[:, 0] = START
    rng = np.random.RandomState(0)
    tokens[:, 1:] = rng.randint(4, V, (b, L - 1))  # arbitrary forced prefix

    full = np.asarray(apply_tokens(variables, jnp.asarray(tokens), memory))
    mem_kv = pre_fn(variables, memory)
    cache = init_fn(variables, b, L)
    for t in range(L - 1):
        logits_t, cache = step_fn(variables, jnp.asarray(tokens[:, t]), mem_kv, cache, t)
        np.testing.assert_allclose(
            np.asarray(logits_t), full[:, t], rtol=2e-5, atol=2e-5, err_msg=f"pos {t}"
        )


def test_incremental_beam_matches_full_beam():
    dec, variables, memory, apply_tokens = _setup()
    from change3d_tpu.models.caption_decoder import make_incremental_fns

    incr = make_incremental_fns(dec)
    for k in (1, 3, 5):
        t_full, s_full = beam_search_decode(
            apply_tokens, variables, memory,
            beam_size=k, start_token=START, end_token=END, pad_token=PAD, max_len=L,
        )
        t_inc, s_inc = beam_search_decode(
            apply_tokens, variables, memory,
            beam_size=k, start_token=START, end_token=END, pad_token=PAD, max_len=L,
            incremental=incr,
        )
        np.testing.assert_array_equal(np.asarray(t_inc), np.asarray(t_full))
        np.testing.assert_allclose(np.asarray(s_inc), np.asarray(s_full), rtol=1e-5)


def test_short_decode_budget_matches_across_modes():
    # The realistic-length bench row (bench_tasks.REALISTIC_MAX_LEN) decodes
    # a shorter max_len budget; the KV-cached incremental path must agree
    # with the full re-decode at ANY budget, not just the 52-token cap.
    dec, variables, memory, apply_tokens = _setup()
    from change3d_tpu.models.caption_decoder import make_incremental_fns

    incr = make_incremental_fns(dec)
    b = memory.shape[0]
    for k in (1, 3):
        for ml in (4, 7):
            t_full, s_full = beam_search_decode(
                apply_tokens, variables, memory,
                beam_size=k, start_token=START, end_token=END, pad_token=PAD,
                max_len=ml,
            )
            t_inc, s_inc = beam_search_decode(
                apply_tokens, variables, memory,
                beam_size=k, start_token=START, end_token=END, pad_token=PAD,
                max_len=ml, incremental=incr,
            )
            assert t_full.shape == (b, ml) and t_inc.shape == (b, ml)
            np.testing.assert_array_equal(np.asarray(t_inc), np.asarray(t_full))
            np.testing.assert_allclose(np.asarray(s_inc), np.asarray(s_full), rtol=1e-5)


def test_early_exit_matches_full_length_scan():
    # The while_loop early exit (all beams retired -> stop) must be
    # bit-identical to the fixed 51-step scan, in both decode modes.
    dec, variables, memory, apply_tokens = _setup()
    from change3d_tpu.models.caption_decoder import make_incremental_fns

    incr = make_incremental_fns(dec)
    for k in (1, 3):
        for inc in (None, incr):
            t_ee, s_ee = beam_search_decode(
                apply_tokens, variables, memory,
                beam_size=k, start_token=START, end_token=END, pad_token=PAD,
                max_len=L, incremental=inc, early_exit=True,
            )
            t_scan, s_scan = beam_search_decode(
                apply_tokens, variables, memory,
                beam_size=k, start_token=START, end_token=END, pad_token=PAD,
                max_len=L, incremental=inc, early_exit=False,
            )
            np.testing.assert_array_equal(np.asarray(t_ee), np.asarray(t_scan))
            np.testing.assert_array_equal(np.asarray(s_ee), np.asarray(s_scan))


def test_early_exit_actually_stops_early():
    # A decoder that puts all its mass on <end> retires one beam rank per
    # step until n_live hits 0; with k=3 every beam is gone after step 2, so
    # the while_loop body must execute far fewer than max_len-1 times. The
    # runtime execution count is observed via jax.debug.callback (the body is
    # traced once but the callback fires once per executed iteration).
    calls = []

    def bump(_):
        calls.append(1)

    big = 50.0

    def apply_tokens(variables, tokens, mem):
        jax.debug.callback(bump, jnp.int32(0))
        b, l = tokens.shape
        logits = jnp.full((b, l, V), -big)
        return logits.at[:, :, END].set(big)

    memory = jnp.zeros((2, 4, E))
    max_len = 40
    tokens, scores = beam_search_decode(
        apply_tokens, {}, memory,
        beam_size=3, start_token=START, end_token=END, pad_token=PAD,
        max_len=max_len, early_exit=True,
    )
    jax.block_until_ready((tokens, scores))
    jax.effects_barrier()
    assert np.all(np.asarray(tokens)[:, 1] == END)
    # step 1 retires rank 0, step 2 retires the remaining two -> 2 body runs.
    assert len(calls) <= 4, len(calls)


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
