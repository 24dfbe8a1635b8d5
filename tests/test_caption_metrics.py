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


def test_meteor_identical_sentence_exact():
    s = "a building appeared on the road"
    score = corpus_meteor([[s]], [s])
    # Perfect match (P = R = Fmean = 1), one chunk over m=6 matches:
    # score = 1 - gamma * (1/6)^beta with the Meteor 1.5 English parameters.
    expected = 1.0 - 0.6 * (1.0 / 6.0) ** 0.2
    np.testing.assert_allclose(score, expected, rtol=1e-9)


def test_meteor_stem_matching():
    # 'buildings'/'appeared' match 'building'/'appear' via the stem stage
    # (weight 0.6); without stemming only 'many' matches.
    stemmed = corpus_meteor([["many building appear"]], ["many buildings appeared"])
    unstemmed = corpus_meteor([["many cars vanish"]], ["many trucks flew"])
    assert stemmed > unstemmed > 0.0
    # Hand-computed: all three words content words. wm = 0.75*(1 + 0.6 + 0.6),
    # wlen = 2.25 both sides, m=3 in 1 chunk.
    p = 0.75 * 2.2 / 2.25
    expected = (p * p / (0.85 * p + 0.15 * p)) * (1 - 0.6 * (1 / 3) ** 0.2)
    np.testing.assert_allclose(stemmed, expected, rtol=1e-9)


def test_meteor_disjoint_is_zero():
    assert corpus_meteor([["x y z"]], ["a b c"]) == 0.0


def test_meteor_corpus_is_micro_aggregated():
    # Corpus score must come from summed statistics, not a mean of sentence
    # scores: combine a perfect long segment with a fragmented short one and
    # check against hand-aggregated stats.
    from change3d_tpu.metrics.caption.meteor import (
        score_from_stats,
        segment_stats,
        sentence_meteor,
    )

    refs = [["a big building appeared near the old road"], ["water on road"]]
    hyps = ["a big building appeared near the old road", "road on water"]
    got = corpus_meteor(refs, hyps)
    totals = [0.0] * 6
    for r, h in zip(refs, hyps):
        for k, v in enumerate(segment_stats(r, h)):
            totals[k] += v
    np.testing.assert_allclose(got, score_from_stats(*totals), rtol=1e-12)
    macro = np.mean([sentence_meteor(r, h) for r, h in zip(refs, hyps)])
    assert abs(got - macro) > 1e-3  # the two aggregations genuinely differ


def test_meteor_function_words_downweighted():
    # A miss on a function word ('the') costs less than a miss on a content
    # word ('tower') in an otherwise identical sentence.
    ref = [["the tower collapsed"]]
    miss_function = corpus_meteor(ref, ["a tower collapsed"])
    miss_content = corpus_meteor(ref, ["the house collapsed"])
    assert miss_function > miss_content


def test_meteor_custom_function_words_flip_score(tmp_path):
    """A custom function.words list (the jar's format: one word per line)
    REPLACES the built-in one, and flipping a word's content/function class
    changes the score. 'tower' is a content word by default; a custom list
    marking it a function word makes missing it cheaper."""
    from change3d_tpu.metrics.caption import meteor as m

    fw = tmp_path / "function.words"
    fw.write_text("tower\nthe\n")
    ref = [["the tower collapsed"]]
    hyp = ["the house collapsed"]
    default = corpus_meteor(ref, hyp)
    custom = corpus_meteor(ref, hyp, function_words=str(fw))
    assert custom != default
    # With 'tower' function-class, the miss is down-weighted: score rises.
    assert custom > default
    # The custom list REPLACES (not extends) the built-in: 'a' is no longer
    # a function word under the custom list, so missing 'the'->'a' now costs
    # full content weight and scores differ from the built-in treatment.
    ref2 = [["the tower collapsed"]]
    miss_fn_default = corpus_meteor(ref2, ["a tower collapsed"])
    miss_fn_custom = corpus_meteor(ref2, ["a tower collapsed"], function_words=str(fw))
    assert miss_fn_custom != miss_fn_default
    # Clearing (no kwarg) restores the built-in list bit-exactly.
    np.testing.assert_allclose(corpus_meteor(ref, hyp), default, rtol=1e-12)
    # Python fallback mirrors the native semantics exactly.
    stats_any = m.segment_stats(ref[0], hyp[0], function_words=str(fw))
    py_stats = m._py_segment_stats(
        ref[0], hyp[0], fw=m.load_function_words(str(fw)))
    np.testing.assert_allclose(stats_any, py_stats, rtol=1e-12)


def test_meteor_native_matches_python():
    # The ctypes C++ core and the pure-Python fallback implement the same
    # algorithm; their sufficient statistics must agree.
    from change3d_tpu.metrics.caption import meteor as m

    if m._load_native() is None:
        pytest.skip("no C++ toolchain")
    refs = [
        ["the scene is the same as before"],
        ["a row of houses appeared along the road", "many buildings built beside the path"],
        ["trees were removed and a playground was constructed"],
    ]
    hyps = [
        "the scene is the same as before",
        "several houses appear along the roads",
        "a playground replaced the trees",
    ]
    import ctypes

    lib = m._load_native()
    for r, h in zip(refs, hyps):
        native = m.segment_stats(r, h)
        python = m._py_segment_stats(r, h)
        np.testing.assert_allclose(native, python, rtol=1e-9, atol=1e-12)
        # Formula parity: the native per-segment score must equal Python's
        # score_from_stats on the same statistics (single formula owner).
        out = (ctypes.c_double * 7)()
        lib.meteor_segment_stats(
            h.encode(), "\n".join(r).encode(),
            m.ALPHA, m.BETA, m.GAMMA, m.DELTA, m.W_STEM, out,
        )
        np.testing.assert_allclose(out[6], m.score_from_stats(*out[:6]), rtol=1e-12)


def test_meteor_token_id_protocol_matches_reference():
    # The production pipeline (like the reference, ref:
    # /root/reference/model/utils.py:517-519) scores stringified token ids;
    # on digit strings stemming and the function-word list are no-ops, so the
    # score must equal the plain unweighted METEOR formula.
    from change3d_tpu.metrics.caption.meteor import ALPHA, BETA, GAMMA

    refs = [["5 6 7 8 9"]]
    hyps = ["5 6 9 8 7"]
    got = corpus_meteor(refs, hyps)
    # Alignment ref-indices in hyp order: [0,1,4,3,2] -> chunks (0,1)(4)(3)(2).
    m, ch, nh, nr = 5, 4, 5, 5
    p, r = m / nh, m / nr
    fmean = p * r / (ALPHA * p + (1 - ALPHA) * r)
    expected = (1 - GAMMA * (ch / m) ** BETA) * fmean
    np.testing.assert_allclose(got, expected, rtol=1e-9)


def test_meteor_chunks_require_adjacency_in_both_sentences():
    # ref 'a b' / hyp 'a x b': the matches are adjacent in the reference but
    # separated by an unmatched hyp token — Meteor counts TWO chunks (the
    # chunk must be contiguous in both sentences).
    from change3d_tpu.metrics.caption import meteor as m

    stats = m._py_segment_stats(["5 6"], "5 9 6")
    assert stats[4] == 2 and stats[5] == 2  # matches=2, chunks=2
    if m._load_native() is not None:
        np.testing.assert_allclose(m.segment_stats(["5 6"], "5 9 6"), stats, rtol=1e-12)


def test_meteor_repeated_tokens_resolve_to_min_chunks():
    # hyp '1 2 1' vs ref '1 1 2': a greedy first-match sweep pairs hyp[0]
    # with ref[0], forcing 3 chunks; the Meteor 1.5 resolution (max covered
    # words, then min chunks) pairs hyp[0]->ref[1], hyp[1]->ref[2],
    # hyp[2]->ref[0] for 2 chunks. Token-id caption strings DO repeat ids,
    # so this is the production-protocol regression for the beam search.
    from change3d_tpu.metrics.caption import meteor as m

    stats = m._py_segment_stats(["1 1 2"], "1 2 1")
    assert stats[4] == 3 and stats[5] == 2  # matches=3, chunks=2 (greedy: 3)
    if m._load_native() is not None:
        np.testing.assert_allclose(m.segment_stats(["1 1 2"], "1 2 1"), stats, rtol=1e-12)


def test_meteor_coverage_beats_chunks():
    # hyp '1 2' vs ref '2 1': full coverage costs 2 chunks; matching only
    # one word would give 1 chunk. Coverage is the higher-priority objective,
    # so the resolver must take both matches.
    from change3d_tpu.metrics.caption import meteor as m

    stats = m._py_segment_stats(["2 1"], "1 2")
    assert stats[4] == 2 and stats[5] == 2
    if m._load_native() is not None:
        np.testing.assert_allclose(m.segment_stats(["2 1"], "1 2"), stats, rtol=1e-12)


def test_meteor_repeated_tokens_native_matches_python():
    # Stress native/Python agreement on repeat-heavy segments where multiple
    # alignments tie on coverage and the chunk/distance tie-breaks decide.
    from change3d_tpu.metrics.caption import meteor as m

    if m._load_native() is None:
        pytest.skip("no C++ toolchain")
    cases = [
        (["7 7 7 3 7"], "7 3 7 7"),
        (["1 2 1 2 1"], "2 1 2 1 2"),
        (["4 4 4 4"], "4 4"),
        (["9 8 9 8 9 8 7"], "8 9 8 9 7 9"),
        (["the the a the"], "a the the"),
    ]
    for refs, hyp in cases:
        np.testing.assert_allclose(
            m.segment_stats(refs, hyp), m._py_segment_stats(refs, hyp), rtol=1e-12
        )


@pytest.fixture()
def paraphrase_table(tmp_path):
    # Both supported line formats; includes a 2<->1-word pair.
    table = tmp_path / "paraphrases.txt"
    table.write_text(
        "sea front ||| coastline\n"
        "0.73 ||| houses ||| buildings\n"
        "appeared ||| showed up\n"
    )
    return str(table)


def test_meteor_paraphrase_stage_matches_spans(paraphrase_table):
    from change3d_tpu.metrics.caption import meteor as m

    refs = ["many buildings appeared along the coastline"]
    hyp = "many houses showed up along the sea front"
    table = m.load_paraphrase_table(paraphrase_table)
    without = m._py_align(hyp.split(), refs[0].split())
    with_tbl = m._py_align(hyp.split(), refs[0].split(), table)
    # Word stages match only 'many'/'along'/'the'; paraphrases cover the rest:
    # houses->buildings (1:1), 'showed up'->appeared (2:1),
    # 'sea front'->coastline (2:1).
    assert without[4] == 3
    assert with_tbl[4] == pytest.approx(3 + 1 + 1.5 + 1.5)
    s_without = m.score_from_stats(*without)
    s_with = m.score_from_stats(*with_tbl)
    assert s_with > s_without

    # Corpus API accepts the table path directly (and memoizes the load).
    score = m.corpus_meteor([refs], [hyp], paraphrase_table=paraphrase_table)
    assert score == pytest.approx(s_with, rel=1e-12)


def test_meteor_paraphrase_native_matches_python(paraphrase_table):
    from change3d_tpu.metrics.caption import meteor as m

    if m._load_native() is None:
        pytest.skip("no C++ toolchain")
    cases = [
        (["many buildings appeared along the coastline"],
         "many houses showed up along the sea front"),
        (["houses on the sea front"], "buildings on the coastline"),
        (["nothing in common here"], "totally different words"),
    ]
    table = m.load_paraphrase_table(paraphrase_table)
    for refs, hyp in cases:
        native = m.segment_stats(refs, hyp, paraphrase_table=paraphrase_table)
        python = m._py_segment_stats(refs, hyp, table)
        np.testing.assert_allclose(native, python, rtol=1e-9, atol=1e-12)
    # Clearing the table restores the word-stage-only behaviour.
    plain = m.segment_stats(cases[0][0], cases[0][1])
    assert plain[4] == 3


def test_meteor_synonym_stage(tmp_path):
    from change3d_tpu.metrics.caption import meteor as m

    syn = tmp_path / "synonyms.txt"
    syn.write_text("houses ||| buildings\nroad ||| street\n")
    refs = ["many buildings near the road"]
    hyp = "many houses near the street"
    table = m.load_paraphrase_table(str(syn))
    without = m._py_align(hyp.split(), refs[0].split())
    with_tbl = m._py_align(hyp.split(), refs[0].split(), None, table)
    assert without[4] == 3  # many/near/the
    assert with_tbl[4] == 5  # + houses->buildings, street->road
    # One contiguous block in both sentences -> 1 chunk, synonym weight 0.8
    # shows up in the weighted match mass.
    assert with_tbl[5] == 1
    assert m.score_from_stats(*with_tbl) > m.score_from_stats(*without)

    if m._load_native() is not None:
        native = m.segment_stats(refs, hyp, synonym_table=str(syn))
        python = m._py_segment_stats(refs, hyp, None, table)
        np.testing.assert_allclose(native, python, rtol=1e-9, atol=1e-12)
        # Clearing restores word-stage-only behaviour.
        assert m.segment_stats(refs, hyp)[4] == 3


def test_meteor_synonym_and_paraphrase_combined(tmp_path, paraphrase_table):
    from change3d_tpu.metrics.caption import meteor as m

    syn = tmp_path / "synonyms.txt"
    syn.write_text("road ||| street\n")
    refs = [["many buildings appeared along the street"]]
    hyp = ["many houses showed up along the road"]
    combined = m.corpus_meteor(
        refs, hyp, paraphrase_table=paraphrase_table, synonym_table=str(syn)
    )
    para_only = m.corpus_meteor(refs, hyp, paraphrase_table=paraphrase_table)
    assert combined > para_only > 0


def test_meteor_paraphrase_gz_table(tmp_path, paraphrase_table):
    import gzip

    from change3d_tpu.metrics.caption import meteor as m

    gz = tmp_path / "paraphrases.txt.gz"
    with open(paraphrase_table, "rb") as src, gzip.open(gz, "wb") as dst:
        dst.write(src.read())
    refs = [["many buildings appeared along the coastline"]]
    hyp = ["many houses showed up along the sea front"]
    assert m.corpus_meteor(refs, hyp, paraphrase_table=str(gz)) == pytest.approx(
        m.corpus_meteor(refs, hyp, paraphrase_table=paraphrase_table), rel=1e-12
    )


def test_eval_caption_scores_keys():
    refs, hyps = _corpus()
    scores = eval_caption_scores(refs, hyps)
    for k in ("Bleu_1", "Bleu_2", "Bleu_3", "Bleu_4", "METEOR", "ROUGE_L", "CIDEr"):
        assert k in scores
        assert np.isfinite(scores[k])


def test_meteor_failed_table_load_recovers(tmp_path, paraphrase_table):
    """A failed native table load clears the C++ table; a retry with the
    previously-good path must actually reload it (regression: logical_path
    used to stay stale, silently scoring without the paraphrase stage)."""
    from change3d_tpu.metrics.caption import meteor as m

    if m._load_native() is None:
        pytest.skip("no C++ toolchain")
    refs = ["many buildings appeared along the coastline"]
    hyp = "many houses showed up along the sea front"
    good = m.segment_stats(refs, hyp, paraphrase_table=paraphrase_table)
    with pytest.raises(Exception):
        m.segment_stats(refs, hyp, paraphrase_table=str(tmp_path / "missing.txt"))
    again = m.segment_stats(refs, hyp, paraphrase_table=paraphrase_table)
    np.testing.assert_allclose(again, good, rtol=1e-12)


def test_meteor_native_abi_version_in_sync():
    """The built .so must advertise the Python side's expected ABI version
    (the load path rejects any other — stale prebuilt binaries fall back to
    the pure-Python scorer instead of silently diverging)."""
    import ctypes

    from change3d_tpu.metrics.caption import meteor as m

    lib = m._load_native()
    if lib is None:
        pytest.skip("no C++ toolchain")
    lib.meteor_abi_version.restype = ctypes.c_int
    assert lib.meteor_abi_version() == m._NATIVE_ABI_VERSION
