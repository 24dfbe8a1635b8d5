"""Aggregate caption scoring — the eval_caption_score equivalent
(ref: /root/reference/model/utils.py:509-530).

Inputs use the reference's convention: hypotheses/references are sequences of
token ids (or words); they are stringified and space-joined before scoring.
Returns {"Bleu_1".."Bleu_4", "METEOR", "ROUGE_L", "CIDEr"}.
"""

from __future__ import annotations

from typing import Dict, List, Sequence

from change3d_tpu.metrics.caption.bleu import corpus_bleu
from change3d_tpu.metrics.caption.rouge import corpus_rouge_l
from change3d_tpu.metrics.caption.cider import corpus_cider_d
from change3d_tpu.metrics.caption.meteor import corpus_meteor


def _to_tokens(seq: Sequence) -> List[str]:
    return [str(x) for x in seq]


def eval_caption_scores(
    references: List[List[Sequence]],
    hypotheses: List[Sequence],
    *,
    meteor_paraphrase_table: str | None = None,
    meteor_synonym_table: str | None = None,
    meteor_function_words: str | None = None,
) -> Dict[str, float]:
    """``meteor_paraphrase_table`` / ``meteor_synonym_table``: optional table
    paths (plain or .gz, jar format) enabling METEOR's phrase-matching and
    synonym stages; ``meteor_function_words``: optional path to the jar's
    function.words list, replacing the built-in one — only useful when
    scoring real words; under the reference's stringified-token-id protocol
    all three are no-ops."""
    refs_tok = [[_to_tokens(r) for r in refs] for refs in references]
    hyps_tok = [_to_tokens(h) for h in hypotheses]
    bleu = corpus_bleu(refs_tok, hyps_tok)
    rouge = corpus_rouge_l(refs_tok, hyps_tok)
    cider = corpus_cider_d(refs_tok, hyps_tok)
    meteor = corpus_meteor(
        [[" ".join(r) for r in refs] for refs in refs_tok],
        [" ".join(h) for h in hyps_tok],
        paraphrase_table=meteor_paraphrase_table,
        synonym_table=meteor_synonym_table,
        function_words=meteor_function_words,
    )
    return {
        "Bleu_1": bleu[0],
        "Bleu_2": bleu[1],
        "Bleu_3": bleu[2],
        "Bleu_4": bleu[3],
        "METEOR": meteor,
        "ROUGE_L": rouge,
        "CIDEr": cider,
    }
