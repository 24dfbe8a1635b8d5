"""METEOR via the native C++ library (ctypes), with a Python fallback.

The reference shells out to ``java -jar meteor-1.5.jar - - -stdio -l en -norm``
over pipes under a lock (ref: /root/reference/eval_func/meteor/meteor.py:22-56).
Here the scorer is the in-process C++ library ``native/libmeteor.so``, built
on demand with ``make`` and memoized; a pure-Python mirror of the same
algorithm keeps the metric available if no compiler exists.

Scoring follows Meteor 1.5 (Denkowski & Lavie 2014) for English:

- matcher stages exact (weight 1.0) then Porter-stem (weight 0.6);
- content/function-word weighting (delta on content words);
- per segment the best-scoring reference's sufficient statistics are kept;
- the corpus score is computed from the statistics *summed over segments*
  (micro-average) — the jar's aggregate-EVAL-line semantics
  (ref: /root/reference/eval_func/meteor/meteor.py:33-56) — not a mean of
  sentence scores.

Documented divergences from meteor-1.5.jar: the synonym (WordNet) and
paraphrase (paraphrase-en.gz) matcher stages are absent (those tables are
missing blobs in the reference repo itself), and the function-word list is a
built-in common-English list rather than the jar's corpus-frequency list.

IMPORTANT comparability note: the reference's caption eval feeds *stringified
token ids* to every scorer, METEOR included (ref:
/root/reference/model/utils.py:517-519) — and this pipeline does the same
(metrics/caption/score.py). On digit strings the stem/synonym/paraphrase
stages and the function-word distinction are no-ops for the jar exactly as
they are here, so for the production protocol the scores are comparable to
the reference's published numbers; the word-level stages above matter only
when scoring real text. One residual divergence applies even to the digit
protocol: alignment here is greedy first-match per stage, while the jar
searches for the max-match/min-chunk alignment — on segments with repeated
tokens the fragmentation penalty can differ slightly.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import List, Sequence, Tuple

# Meteor 1.5 English parameters (task 'rank'): alpha, beta, gamma, delta.
ALPHA, BETA, GAMMA, DELTA = 0.85, 0.2, 0.6, 0.75
W_STEM = 0.6  # stem-stage module weight (exact stage is 1.0)

FUNCTION_WORDS = frozenset(
    """a an the and or but nor so yet of in on at to from by with about as into
    like through after over between out against during without before under
    around among for is am are was were be been being have has had do does did
    will would shall should may might must can could i you he she it we they
    me him her us them my your his its our their mine yours hers ours theirs
    this that these those there here where when what which who whom whose why
    how not no if then than too very just also up down off some any all both
    each few more most other such only own same s t now while because until
    again""".split()
)

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))), os.pardir, "native")
_NATIVE_DIR = os.path.abspath(_NATIVE_DIR)
_LIB = None
_LIB_TRIED = False


def _load_native():
    global _LIB, _LIB_TRIED
    if _LIB_TRIED:
        return _LIB
    _LIB_TRIED = True
    so = os.path.join(_NATIVE_DIR, "libmeteor.so")
    try:
        # Invoke make first: it is dependency-tracked and near-free when
        # up to date, and it prevents a stale (gitignored) .so built from an
        # older meteor.cpp from being loaded silently.
        try:
            subprocess.run(["make", "-C", _NATIVE_DIR], check=True, capture_output=True)
        except Exception:
            # No toolchain (or make failed) but a previously built .so may
            # still be loadable — accept the documented staleness risk over
            # silently dropping to the slow pure-Python path.
            if not os.path.exists(so):
                raise
        lib = ctypes.CDLL(so)
        lib.meteor_sentence.restype = ctypes.c_double
        lib.meteor_sentence.argtypes = [
            ctypes.c_char_p, ctypes.c_char_p,
            ctypes.c_double, ctypes.c_double, ctypes.c_double,
        ]
        lib.meteor_segment_stats.restype = None
        lib.meteor_segment_stats.argtypes = [
            ctypes.c_char_p, ctypes.c_char_p,
            ctypes.c_double, ctypes.c_double, ctypes.c_double, ctypes.c_double,
            ctypes.c_double, ctypes.POINTER(ctypes.c_double),
        ]
        _LIB = lib
    except Exception:
        _LIB = None
    return _LIB


# ---------------------------------------------------------------------------
# Pure-Python fallback (same algorithm as the C++ core).
# ---------------------------------------------------------------------------


def _word_weight(w: str) -> float:
    return (1.0 - DELTA) if w in FUNCTION_WORDS else DELTA


def _py_align(hyp: List[str], ref: List[str]) -> Tuple[List[float], ...]:
    """Greedy stage-wise alignment. Returns (wm_h, wm_r, wlen_h, wlen_r,
    matches, chunks) sufficient statistics."""
    try:
        from nltk.stem.porter import PorterStemmer  # pragma: no cover

        stem = PorterStemmer().stem
    except Exception:
        stem = _simple_stem
    nh, nr = len(hyp), len(ref)
    h2r = [-1] * nh
    stage_w = [0.0] * nh
    used = [False] * nr

    for stage, w in ((lambda x: x, 1.0), (stem, W_STEM)):
        hk = [stage(x) for x in hyp]
        rk = [stage(x) for x in ref]
        for i in range(nh):
            if h2r[i] >= 0:
                continue
            for j in range(nr):
                if not used[j] and hk[i] == rk[j]:
                    h2r[i] = j
                    stage_w[i] = w
                    used[j] = True
                    break

    wm_h = wm_r = 0.0
    # A chunk extends only while matched words are adjacent in BOTH sentences
    # (Meteor 1.5 definition), so track the previous matched hyp index too.
    matches, chunks, prev, prev_i = 0, 0, -2, -2
    for i in range(nh):
        if h2r[i] < 0:
            continue
        matches += 1
        if h2r[i] != prev + 1 or i != prev_i + 1:
            chunks += 1
        prev, prev_i = h2r[i], i
        wm_h += stage_w[i] * _word_weight(hyp[i])
        wm_r += stage_w[i] * _word_weight(ref[h2r[i]])
    wlen_h = sum(_word_weight(w) for w in hyp)
    wlen_r = sum(_word_weight(w) for w in ref)
    return wm_h, wm_r, wlen_h, wlen_r, matches, chunks


def _simple_stem(w: str) -> str:
    for suf in ("ing", "ed", "es", "s"):
        if w.endswith(suf) and len(w) - len(suf) >= 3:
            return w[: -len(suf)]
    return w


def score_from_stats(
    wm_h: float, wm_r: float, wlen_h: float, wlen_r: float, matches: float, chunks: float
) -> float:
    """Meteor 1.5 score formula over (possibly aggregated) statistics."""
    if matches == 0 or wlen_h <= 0 or wlen_r <= 0:
        return 0.0
    p, r = wm_h / wlen_h, wm_r / wlen_r
    if p + r == 0:
        return 0.0
    fmean = p * r / (ALPHA * p + (1 - ALPHA) * r)
    penalty = GAMMA * (chunks / matches) ** BETA
    return (1 - penalty) * fmean


def _py_segment_stats(refs: Sequence[str], hyp: str):
    best, best_score = None, -1.0
    for ref in refs:
        stats = _py_align(hyp.lower().split(), ref.lower().split())
        score = score_from_stats(*stats)
        if score > best_score:
            best, best_score = stats, score
    return best or (0.0, 0.0, 0.0, 0.0, 0, 0)


def segment_stats(refs: Sequence[str], hyp: str) -> Tuple[float, ...]:
    """Best-reference sufficient statistics (wm_h, wm_r, wlen_h, wlen_r,
    matches, chunks) for one segment."""
    lib = _load_native()
    if lib is not None:
        out = (ctypes.c_double * 7)()
        lib.meteor_segment_stats(
            hyp.encode(), "\n".join(refs).encode(),
            ALPHA, BETA, GAMMA, DELTA, W_STEM, out,
        )
        return tuple(out[:6])
    return tuple(_py_segment_stats(refs, hyp))


def sentence_meteor(refs: Sequence[str], hyp: str) -> float:
    """Best single-reference Meteor 1.5 score for one hypothesis."""
    lib = _load_native()
    if lib is not None:
        return float(
            lib.meteor_sentence(hyp.encode(), "\n".join(refs).encode(), ALPHA, BETA, GAMMA)
        )
    return score_from_stats(*_py_segment_stats(refs, hyp))


def corpus_meteor(references: List[List[str]], hypotheses: List[str]) -> float:
    """references[i]: list of reference strings; hypotheses[i]: string.
    Corpus score = Meteor formula over segment statistics summed corpus-wide
    (micro-average), matching the jar's final-score aggregation."""
    assert len(references) == len(hypotheses)
    if not hypotheses:
        return 0.0
    totals = [0.0] * 6
    for refs, hyp in zip(references, hypotheses):
        for k, v in enumerate(segment_stats(refs, hyp)):
            totals[k] += v
    return score_from_stats(*totals)
