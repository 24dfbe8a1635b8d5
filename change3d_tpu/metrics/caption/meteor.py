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

All four Meteor 1.5 matcher stages are implemented (round 3): exact (1.0),
Porter-stem (0.6), synonym (0.8) and paraphrase (0.6). The synonym and
paraphrase stages sit behind optional table paths — ``synonym_table=`` /
``paraphrase_table=`` on ``corpus_meteor``/``segment_stats`` (plain text or
.gz, lines ``a ||| b`` or the jar's ``prob ||| a ||| b``) — because the
jar's own data files (WordNet export, paraphrase-en.gz) are missing blobs
in the reference repo; supply them and the scorer consumes them directly.
Alignment resolution (round 4) is the jar's beam search over
non-conflicting match subsets — maximize covered words, then minimize
chunks, then minimize summed |hyp_start - ref_start|, beam width 40 — not
a greedy first-match sweep, so repeated-token segments chunk the way
Meteor 1.5 chunks them. The function-word list defaults to a built-in
common-English approximation; pass ``function_words=`` (a path in the
jar's one-word-per-line function.words format) to replace it with the
jar's own list — with the jar's three data files supplied (function
words, WordNet synonyms, paraphrase-en.gz) there is no remaining
scoring divergence.

IMPORTANT comparability note: the reference's caption eval feeds *stringified
token ids* to every scorer, METEOR included (ref:
/root/reference/model/utils.py:517-519) — and this pipeline does the same
(metrics/caption/score.py). On digit strings the stem/synonym/paraphrase
stages and the function-word distinction are no-ops for the jar exactly as
they are here, so for the production protocol the scores are comparable to
the reference's published numbers; the word-level stages above matter only
when scoring real text. Repeated-token segments — which the id protocol
does contain — resolve through the same max-coverage/min-chunk search the
jar uses (see ``_resolve_alignment``), so the fragmentation penalty matches.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import List, Sequence, Tuple

# Meteor 1.5 English parameters (task 'rank'): alpha, beta, gamma, delta.
ALPHA, BETA, GAMMA, DELTA = 0.85, 0.2, 0.6, 0.75
W_STEM = 0.6  # stem-stage module weight (exact stage is 1.0)
W_SYNONYM = 0.8  # synonym-stage module weight (Meteor 1.5 English)
W_PARAPHRASE = 0.6  # paraphrase-stage module weight (Meteor 1.5 English)
MAX_PHRASE_LEN = 6  # longest span considered by the paraphrase matcher

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
# Must match meteor_abi_version() in native/meteor.cpp. Bumped whenever
# scoring semantics change so a stale prebuilt .so (loadable when make is
# unavailable) can never silently diverge from the Python fallback.
_NATIVE_ABI_VERSION = 4


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
        try:
            lib.meteor_abi_version.restype = ctypes.c_int
            ver = lib.meteor_abi_version()
        except AttributeError:
            ver = -1  # pre-versioning build
        if ver != _NATIVE_ABI_VERSION:
            # Semantics mismatch: prefer the (slow but consistent) pure-Python
            # path over a library scoring with outdated alignment rules.
            raise RuntimeError(
                f"stale libmeteor.so (abi {ver}, expected {_NATIVE_ABI_VERSION})"
            )
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
        # The ABI version gate above guarantees these symbols exist.
        for fn in ("meteor_set_paraphrase_table", "meteor_set_synonym_table",
                   "meteor_set_function_words"):
            getattr(lib, fn).restype = ctypes.c_int
            getattr(lib, fn).argtypes = [ctypes.c_char_p]
        _LIB = lib
    except Exception:
        _LIB = None
    return _LIB


# ---------------------------------------------------------------------------
# Pure-Python fallback (same algorithm as the C++ core).
# ---------------------------------------------------------------------------


def _word_weight(w: str, fw=FUNCTION_WORDS) -> float:
    return (1.0 - DELTA) if w in fw else DELTA


_FUNCTION_WORD_CACHE: dict = {}


def load_function_words(path: str) -> frozenset:
    """Load a function-word list (memoized by path) in the jar's
    function.words format: one word per line (blank lines ignored, words
    lowercased; .gz accepted). The loaded list REPLACES the built-in one,
    so supplying the jar's own file reproduces its content/function
    weighting exactly."""
    if path in _FUNCTION_WORD_CACHE:
        return _FUNCTION_WORD_CACHE[path]
    import gzip

    opener = gzip.open if path.endswith(".gz") else open
    words = set()
    with opener(path, "rt", encoding="utf-8", errors="replace") as f:
        for line in f:
            words.update(w.lower() for w in line.split())
    result = frozenset(words)
    _FUNCTION_WORD_CACHE[path] = result
    return result


_PARAPHRASE_CACHE: dict = {}


def load_paraphrase_table(path: str):
    """Load a paraphrase table (memoized by path). Accepts plain text or
    .gz with ``phrase1 ||| phrase2`` or the jar's paraphrase-en.gz format
    ``prob ||| phrase1 ||| phrase2``. The mapping is made symmetric."""
    if path in _PARAPHRASE_CACHE:
        return _PARAPHRASE_CACHE[path]
    import gzip

    opener = gzip.open if path.endswith(".gz") else open
    table: dict = {}
    with opener(path, "rt", encoding="utf-8", errors="replace") as f:
        for line in f:
            parts = [p.strip().lower() for p in line.split("|||")]
            if len(parts) == 2:
                a, b = parts
            elif len(parts) == 3:
                a, b = parts[1], parts[2]
            else:
                continue
            if not a or not b or a == b:
                continue
            # Lists, not sets: candidate order is file order, so the greedy
            # matcher is deterministic and bit-identical to the C++ core.
            for src, dst in ((a, b), (b, a)):
                cands = table.setdefault(src, [])
                if dst not in cands:
                    cands.append(dst)
    _PARAPHRASE_CACHE[path] = table
    return table


BEAM_WIDTH = 40  # the jar's alignment-resolution beam size


def _collect_candidates(hyp: List[str], ref: List[str], table, syn_table):
    """All candidate matches (hi, hl, ri, rl, stage, weight) across the four
    Meteor 1.5 stages. Each span pair appears once, attributed to its
    earliest matching stage (exact 1.0, stem 0.6, synonym 0.8, paraphrase
    0.6), the way the jar's matchers skip already-matched pairs."""
    try:
        from nltk.stem.porter import PorterStemmer  # pragma: no cover

        stem = PorterStemmer().stem
    except Exception:
        stem = _simple_stem
    nh, nr = len(hyp), len(ref)
    hs = [stem(x) for x in hyp]
    rs = [stem(x) for x in ref]
    cands = []
    word_pairs = set()
    for j in range(nr):
        for i in range(nh):
            if hyp[i] == ref[j]:
                cands.append((i, 1, j, 1, 0, 1.0))
            elif hs[i] == rs[j]:
                cands.append((i, 1, j, 1, 1, W_STEM))
            elif syn_table and ref[j] in syn_table.get(hyp[i], ()):
                cands.append((i, 1, j, 1, 2, W_SYNONYM))
            else:
                continue
            word_pairs.add((i, j))
    if table:
        seen = set()
        for i in range(nh):
            for lh in range(1, min(MAX_PHRASE_LEN, nh - i) + 1):
                targets = table.get(" ".join(hyp[i : i + lh]))
                if not targets:
                    continue
                for tgt in targets:
                    tw = tgt.split()
                    lr = len(tw)
                    if lr == 0 or lr > nr:
                        continue
                    for j in range(nr - lr + 1):
                        if ref[j : j + lr] != tw:
                            continue
                        if lh == 1 and lr == 1 and (i, j) in word_pairs:
                            continue
                        if (i, lh, j, lr) in seen:
                            continue
                        seen.add((i, lh, j, lr))
                        cands.append((i, lh, j, lr, 3, W_PARAPHRASE))
    return cands


def _resolve_alignment(nh: int, nr: int, cands) -> list:
    """Meteor 1.5 alignment resolution: beam search over ref positions —
    each partial alignment either leaves the ref word unmatched or takes a
    candidate starting there whose spans are free — keeping the BEAM_WIDTH
    best partials under the lexicographic objective (max covered words, min
    chunks, min summed |hyp_start - ref_start|). Returns the chosen
    candidate records. A greedy first-match sweep can mis-chunk segments
    with repeated tokens; this search finds the jar's alignment."""
    by_ref = [[] for _ in range(nr)]
    for ci, c in enumerate(cands):
        by_ref[c[2]].append(ci)

    # Partial: (covered, chunks, dist, h_used bitmask, prev_hend, prev_rend,
    #           next_free_ref, chosen tuple)
    beam = [(0, 0, 0, 0, -1, -1, 0, ())]
    for j in range(nr):
        if not by_ref[j]:
            continue  # skip-only position: beam unchanged
        nxt = list(beam)  # every partial may leave ref j unmatched
        for covered, chunks, dist, h_used, ph, pr, free, chosen in beam:
            if free > j:
                continue  # ref j consumed by a phrase match
            for ci in by_ref[j]:
                hi, hl, ri, rl, _stage, _w = cands[ci]
                if ri + rl > nr:
                    continue
                hmask = ((1 << hl) - 1) << hi
                if h_used & hmask:
                    continue
                nxt.append((
                    covered + hl + rl,
                    chunks + (0 if (hi == ph and ri == pr) else 1),
                    dist + abs(hi - ri),
                    h_used | hmask,
                    hi + hl,
                    ri + rl,
                    ri + rl,
                    chosen + (ci,),
                ))
        if len(nxt) > BEAM_WIDTH:
            nxt.sort(key=lambda s: (-s[0], s[1], s[2]))
            del nxt[BEAM_WIDTH:]
        beam = nxt
    best = min(beam, key=lambda s: (-s[0], s[1], s[2]))
    return [cands[ci] for ci in best[7]]


def _py_align(hyp: List[str], ref: List[str], table=None, syn_table=None,
              fw=FUNCTION_WORDS) -> Tuple[float, ...]:
    """Meteor 1.5 alignment. Returns (wm_h, wm_r, wlen_h, wlen_r, matches,
    chunks) sufficient statistics.

    Candidates come from all four stages — exact (w=1.0), Porter-stem
    (w=0.6), synonym words at w=0.8 (``syn_table``), paraphrase spans at
    w=0.6 (``table``) — and are resolved one-to-one by the beam search in
    ``_resolve_alignment``. ``matches`` is the Meteor average
    (m_hyp + m_ref)/2 (a float once phrase matches of unequal span length
    exist; integral and identical to a plain count without them)."""
    nh, nr = len(hyp), len(ref)
    cands = _collect_candidates(hyp, ref, table, syn_table)
    records = [(hi, hl, ri, rl, w) for hi, hl, ri, rl, _s, w in _resolve_alignment(nh, nr, cands)]
    records.sort()
    wm_h = wm_r = 0.0
    matches = 0.0
    chunks = 0
    # A chunk extends only while match blocks are adjacent in BOTH sentences
    # (Meteor 1.5 definition).
    prev_hend, prev_rend = -1, -1
    for hi, lh, ri, lr, w in records:
        matches += (lh + lr) / 2.0
        if hi != prev_hend or ri != prev_rend:
            chunks += 1
        prev_hend, prev_rend = hi + lh, ri + lr
        wm_h += w * sum(_word_weight(x, fw) for x in hyp[hi : hi + lh])
        wm_r += w * sum(_word_weight(x, fw) for x in ref[ri : ri + lr])
    wlen_h = sum(_word_weight(w, fw) for w in hyp)
    wlen_r = sum(_word_weight(w, fw) for w in ref)
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


def _py_segment_stats(refs: Sequence[str], hyp: str, table=None, syn_table=None,
                      fw=FUNCTION_WORDS):
    best, best_score = None, -1.0
    for ref in refs:
        stats = _py_align(hyp.lower().split(), ref.lower().split(), table, syn_table, fw)
        score = score_from_stats(*stats)
        if score > best_score:
            best, best_score = stats, score
    return best or (0.0, 0.0, 0.0, 0.0, 0, 0)


class _NativeTable:
    """Tracks one native table endpoint (paraphrase or synonym): idempotent
    set, .gz decompression to a managed temp file (removed on switch and at
    exit — the C++ reader is plain text)."""

    def __init__(self, fn_name: str):
        self.fn_name = fn_name
        self.logical_path: str | None = None
        self.tmp_path: str | None = None

    def _cleanup_tmp(self):
        if self.tmp_path is not None:
            try:
                os.unlink(self.tmp_path)
            except OSError:
                pass
            self.tmp_path = None

    def set(self, lib, table_path: str | None) -> bool:
        """Returns False if the native side cannot take the table."""
        if not hasattr(lib, self.fn_name):
            return table_path is None
        if table_path == self.logical_path:
            return True
        path = table_path
        if path is not None and path.endswith(".gz"):
            import atexit
            import gzip
            import tempfile

            with gzip.open(path, "rt", encoding="utf-8", errors="replace") as f:
                tmp = tempfile.NamedTemporaryFile(
                    "w", suffix=".meteor-table.txt", delete=False
                )
                with tmp:
                    for line in f:
                        tmp.write(line)
            self._cleanup_tmp()  # previous table's decompressed copy
            self.tmp_path = tmp.name
            atexit.register(self._cleanup_tmp)
            path = tmp.name
        n = getattr(lib, self.fn_name)(path.encode() if path is not None else None)
        if path is not None and n < 0:
            # The C++ side clears its table before attempting a load, so a
            # failed load leaves the native state EMPTY — forget the previous
            # path, or a retry with it would short-circuit to "already loaded"
            # and silently score without the stage.
            self.logical_path = None
            return False
        if table_path is None or not table_path.endswith(".gz"):
            self._cleanup_tmp()
        self.logical_path = table_path
        return True


_PARAPHRASE_NATIVE = _NativeTable("meteor_set_paraphrase_table")
_SYNONYM_NATIVE = _NativeTable("meteor_set_synonym_table")
_FUNCTION_NATIVE = _NativeTable("meteor_set_function_words")


def _native_set_table(lib, paraphrase_table: str | None) -> bool:
    return _PARAPHRASE_NATIVE.set(lib, paraphrase_table)


def _native_set_synonyms(lib, synonym_table: str | None) -> bool:
    return _SYNONYM_NATIVE.set(lib, synonym_table)


def _native_set_function_words(lib, function_words: str | None) -> bool:
    return _FUNCTION_NATIVE.set(lib, function_words)


def segment_stats(
    refs: Sequence[str],
    hyp: str,
    paraphrase_table: str | None = None,
    synonym_table: str | None = None,
    function_words: str | None = None,
) -> Tuple[float, ...]:
    """Best-reference sufficient statistics (wm_h, wm_r, wlen_h, wlen_r,
    matches, chunks) for one segment. ``paraphrase_table`` enables the
    phrase-matching stage, ``synonym_table`` the word-level synonym stage,
    and ``function_words`` (a path in the jar's one-word-per-line
    function.words format) replaces the built-in function-word list
    (see module docstring)."""
    lib = _load_native()
    if (
        lib is not None
        and _native_set_table(lib, paraphrase_table)
        and _native_set_synonyms(lib, synonym_table)
        and _native_set_function_words(lib, function_words)
    ):
        out = (ctypes.c_double * 7)()
        lib.meteor_segment_stats(
            hyp.encode(), "\n".join(refs).encode(),
            ALPHA, BETA, GAMMA, DELTA, W_STEM, out,
        )
        return tuple(out[:6])
    table = load_paraphrase_table(paraphrase_table) if paraphrase_table else None
    syn = load_paraphrase_table(synonym_table) if synonym_table else None
    fw = load_function_words(function_words) if function_words else FUNCTION_WORDS
    return tuple(_py_segment_stats(refs, hyp, table, syn, fw))


def sentence_meteor(
    refs: Sequence[str],
    hyp: str,
    paraphrase_table: str | None = None,
    synonym_table: str | None = None,
    function_words: str | None = None,
) -> float:
    """Best single-reference Meteor 1.5 score for one hypothesis."""
    if paraphrase_table is None and synonym_table is None and function_words is None:
        lib = _load_native()
        if (lib is not None and _native_set_table(lib, None)
                and _native_set_synonyms(lib, None)
                and _native_set_function_words(lib, None)):
            return float(
                lib.meteor_sentence(hyp.encode(), "\n".join(refs).encode(), ALPHA, BETA, GAMMA)
            )
    return score_from_stats(*segment_stats(
        refs, hyp, paraphrase_table, synonym_table, function_words))


def corpus_meteor(
    references: List[List[str]],
    hypotheses: List[str],
    paraphrase_table: str | None = None,
    synonym_table: str | None = None,
    function_words: str | None = None,
) -> float:
    """references[i]: list of reference strings; hypotheses[i]: string.
    Corpus score = Meteor formula over segment statistics summed corpus-wide
    (micro-average), matching the jar's final-score aggregation."""
    assert len(references) == len(hypotheses)
    if not hypotheses:
        return 0.0
    totals = [0.0] * 6
    for refs, hyp in zip(references, hypotheses):
        for k, v in enumerate(segment_stats(
                refs, hyp, paraphrase_table, synonym_table, function_words)):
            totals[k] += v
    return score_from_stats(*totals)
