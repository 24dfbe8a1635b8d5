"""Caption metric parity vs the reference's vendored pycocoevalcap scorers.

The vendored scorers at /root/reference/eval_func are imported read-only as a
golden oracle (BLEU/ROUGE/CIDEr are pure Python there; METEOR needs the
missing jar and is tested against hand-computed values instead).
"""

import sys

import numpy as np
import pytest

sys.path.insert(0, "/root/reference")

from change3d_tpu.metrics.caption import (
    corpus_bleu,
    corpus_rouge_l,
    corpus_cider_d,
    corpus_meteor,
    eval_caption_scores,
)


def _corpus():
    rng = np.random.RandomState(0)
    vocab = [str(i) for i in range(30)]
    refs, hyps = [], []
    for i in range(12):
        n_ref = 3
        base = [vocab[rng.randint(30)] for _ in range(rng.randint(6, 14))]
        r = []
        for _ in range(n_ref):
            s = list(base)
            for _ in range(rng.randint(0, 3)):
                s[rng.randint(len(s))] = vocab[rng.randint(30)]
            r.append(s)
        h = list(base)
        for _ in range(rng.randint(0, 4)):
            h[rng.randint(len(h))] = vocab[rng.randint(30)]
        refs.append(r)
        hyps.append(h)
    return refs, hyps


def _as_gts_res(refs, hyps):
    gts = {i: [" ".join(r) for r in rr] for i, rr in enumerate(refs)}
    res = {i: [" ".join(h)] for i, h in enumerate(hyps)}
    return gts, res


def test_bleu_matches_vendored():
    from eval_func.bleu.bleu import Bleu

    refs, hyps = _corpus()
    gts, res = _as_gts_res(refs, hyps)
    expected, _ = Bleu(4).compute_score(gts, res)
    got = corpus_bleu(refs, hyps)
    np.testing.assert_allclose(got, expected, rtol=1e-6)


def test_rouge_matches_vendored():
    from eval_func.rouge.rouge import Rouge

    refs, hyps = _corpus()
    gts, res = _as_gts_res(refs, hyps)
    expected, _ = Rouge().compute_score(gts, res)
    got = corpus_rouge_l(refs, hyps)
    np.testing.assert_allclose(got, expected, rtol=1e-6)


def test_cider_matches_vendored():
    from eval_func.cider.cider import Cider

    refs, hyps = _corpus()
    gts, res = _as_gts_res(refs, hyps)
    expected, _ = Cider().compute_score(gts, res)
    got = corpus_cider_d(refs, hyps)
    np.testing.assert_allclose(got, expected, rtol=1e-5)


def test_meteor_identical_sentence_scores_high():
    s = "a building appeared on the road"
    score = corpus_meteor([[s]], [s])
    # Perfect match, one chunk: penalty = 0.5*(1/m)^3, F=1.
    assert 0.95 < score <= 1.0


def test_meteor_stem_matching():
    # 'buildings' should match 'building' via the stem stage.
    score = corpus_meteor([["many building appear"]], ["many buildings appeared"])
    assert score > 0.8


def test_meteor_disjoint_is_zero():
    assert corpus_meteor([["x y z"]], ["a b c"]) == 0.0


def test_eval_caption_scores_keys():
    refs, hyps = _corpus()
    scores = eval_caption_scores(refs, hyps)
    for k in ("Bleu_1", "Bleu_2", "Bleu_3", "Bleu_4", "METEOR", "ROUGE_L", "CIDEr"):
        assert k in scores
        assert np.isfinite(scores[k])
