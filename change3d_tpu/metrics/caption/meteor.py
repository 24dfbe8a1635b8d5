"""METEOR via the native C++ library (ctypes), with a Python fallback.

The reference shells out to ``java -jar meteor-1.5.jar - - -stdio -l en -norm``
over pipes under a lock (ref: /root/reference/eval_func/meteor/meteor.py:22-56).
Here the scorer is the in-process C++ library ``native/libmeteor.so``
(exact + Porter-stem alignment stages; see native/meteor.cpp for the formula
and for the documented divergence: the jar's synonym/paraphrase tables are
missing blobs even in the reference repo). The library is built on demand
with ``make`` and memoized; a pure-Python mirror of the same algorithm keeps
the metric available if no compiler exists.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import List, Sequence

ALPHA, BETA, GAMMA = 0.9, 3.0, 0.5

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
        if not os.path.exists(so):
            subprocess.run(["make", "-C", _NATIVE_DIR], check=True, capture_output=True)
        lib = ctypes.CDLL(so)
        lib.meteor_sentence.restype = ctypes.c_double
        lib.meteor_sentence.argtypes = [
            ctypes.c_char_p,
            ctypes.c_char_p,
            ctypes.c_double,
            ctypes.c_double,
            ctypes.c_double,
        ]
        _LIB = lib
    except Exception:
        _LIB = None
    return _LIB


# ---------------------------------------------------------------------------
# Pure-Python fallback (same algorithm as the C++ core).
# ---------------------------------------------------------------------------


def _py_align(hyp: List[str], ref: List[str]):
    try:
        from nltk.stem.porter import PorterStemmer  # pragma: no cover

        stem = PorterStemmer().stem
    except Exception:
        stem = _simple_stem
    nh, nr = len(hyp), len(ref)
    h2r = [-1] * nh
    used = [False] * nr

    for stage in (lambda w: w, stem):
        hk = [stage(w) for w in hyp]
        rk = [stage(w) for w in ref]
        for i in range(nh):
            if h2r[i] >= 0:
                continue
            for j in range(nr):
                if not used[j] and hk[i] == rk[j]:
                    h2r[i] = j
                    used[j] = True
                    break

    matches, chunks, prev = 0, 0, -2
    for i in range(nh):
        if h2r[i] < 0:
            continue
        matches += 1
        if h2r[i] != prev + 1:
            chunks += 1
        prev = h2r[i]
    return matches, chunks


def _simple_stem(w: str) -> str:
    for suf in ("ing", "ed", "es", "s"):
        if w.endswith(suf) and len(w) - len(suf) >= 3:
            return w[: -len(suf)]
    return w


def _py_sentence(hyp: List[str], ref: List[str]) -> float:
    m, ch = _py_align(hyp, ref)
    if m == 0 or not hyp or not ref:
        return 0.0
    p, r = m / len(hyp), m / len(ref)
    fmean = p * r / (ALPHA * p + (1 - ALPHA) * r)
    penalty = GAMMA * (ch / m) ** BETA
    return (1 - penalty) * fmean


def sentence_meteor(refs: Sequence[str], hyp: str) -> float:
    """refs: list of reference strings; hyp: hypothesis string."""
    lib = _load_native()
    if lib is not None:
        return float(
            lib.meteor_sentence(
                hyp.encode(), "\n".join(refs).encode(), ALPHA, BETA, GAMMA
            )
        )
    return max(_py_sentence(hyp.lower().split(), r.lower().split()) for r in refs)


def corpus_meteor(references: List[List[str]], hypotheses: List[str]) -> float:
    """references[i]: list of reference strings; hypotheses[i]: string.
    Corpus score = mean sentence score (the jar aggregates test-set statistics;
    mean-of-sentences is the common in-process approximation)."""
    assert len(references) == len(hypotheses)
    if not hypotheses:
        return 0.0
    return sum(sentence_meteor(r, h) for r, h in zip(references, hypotheses)) / len(hypotheses)
