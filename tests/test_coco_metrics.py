"""ROUGE-L / CIDEr-D sanity and hand-computed checks."""

import math

import numpy as np
import pytest

from icee_tpu.evaluation.coco_metrics import (
    _lcs_len,
    cider_d,
    coco_metrics,
    rouge_l,
    rouge_l_sentence,
)


def test_lcs():
    assert _lcs_len("abcde", "ace") == 3
    assert _lcs_len([], [1]) == 0
    assert _lcs_len([1, 2, 3], [4, 5]) == 0


def test_rouge_perfect_match():
    refs = [["a", "b", "c"]]
    assert abs(rouge_l_sentence(refs, ["a", "b", "c"]) - 1.0) < 1e-9


def test_rouge_hand_computed():
    # hyp=[a,x,c], ref=[a,b,c]: lcs=2, P=2/3, R=2/3, beta=1.2 -> F=2/3
    got = rouge_l_sentence([["a", "b", "c"]], ["a", "x", "c"])
    assert abs(got - 2 / 3) < 1e-9
    # max over references
    got2 = rouge_l_sentence([["a", "b", "c"], ["a", "x", "c"]],
                            ["a", "x", "c"])
    assert abs(got2 - 1.0) < 1e-9


def test_rouge_independent_max_p_and_r():
    """pycocoevalcap takes max precision and max recall over DIFFERENT
    references: hyp=[a,x,c] vs refs [a,x] (P=2/3, R=1) and
    [a,x,c,d,e,f] (P=1, R=1/2) -> F from (P=1, R=1) = 1.0."""
    got = rouge_l_sentence([["a", "x"], ["a", "x", "c", "d", "e", "f"]],
                           ["a", "x", "c"])
    assert abs(got - 1.0) < 1e-9


def test_rouge_corpus_mean():
    refs = [[["a", "b"]], [["c", "d"]]]
    hyps = [["a", "b"], ["x", "y"]]
    assert abs(rouge_l(refs, hyps) - 0.5) < 1e-9


def test_cider_identical_corpus_scores_ten():
    """Perfect hypothesis == its only reference: every defined n-gram cosine
    is exactly 1 (clipped numerator sum(min(h,r)*r) == sum(r^2) == |h||r|),
    penalty 1 -> score = 10 when all n=1..4 are populated."""
    refs = [[["a", "cat", "sits", "on", "mat"]],
            [["a", "dog", "runs", "very", "fast"]]]
    hyps = [["a", "cat", "sits", "on", "mat"],
            ["a", "dog", "runs", "very", "fast"]]
    score = cider_d(refs, hyps)
    assert abs(score - 10.0) < 1e-6, score


def test_cider_disjoint_is_zero():
    refs = [[["a", "b", "c"]], [["d", "e", "f"]]]
    hyps = [["x", "y", "z"], ["q", "r", "s"]]
    assert cider_d(refs, hyps) == 0.0


def test_cider_length_penalty_decreases_score():
    # a 1-image corpus has log(m)=0 -> all-zero IDF (pycocoevalcap behaves
    # identically); use 2 images so weights are nonzero
    refs = [[["a", "b", "c", "d", "e"]], [["x", "y", "z"]]]
    short = cider_d(refs, [["a", "b"], ["x", "y", "z"]])
    exact = cider_d(refs, [["a", "b", "c", "d", "e"], ["x", "y", "z"]])
    assert exact > short


def test_coco_metrics_block():
    refs = [[["a", "b", "c", "d"]]]
    hyps = [["a", "b", "c", "d"]]
    m = coco_metrics(refs, hyps)
    assert set(m) == {"Bleu_1", "Bleu_2", "Bleu_3", "Bleu_4", "ROUGE_L",
                      "CIDEr", "METEOR"}
    assert abs(m["Bleu_4"] - 1.0) < 1e-9
    assert abs(m["ROUGE_L"] - 1.0) < 1e-9
    assert abs(m["METEOR"] - (1 - 0.5 * (1 / 4) ** 3)) < 1e-12


# --- METEOR (exact+stem tiers; hand-checked alignments) --------------------

def test_meteor_identical_sentence():
    from icee_tpu.evaluation.coco_metrics import meteor_sentence
    s = "a b c d".split()
    # m=4, P=R=F=1, 1 chunk: score = 1 - 0.5*(1/4)^3
    assert abs(meteor_sentence([s], s) - (1 - 0.5 * (1 / 4) ** 3)) < 1e-12


def test_meteor_classic_reordering():
    """Banerjee & Lavie's fully-scrambled example: perfect unigram overlap,
    maximal fragmentation (6 chunks of 6 matches) -> penalty 0.5."""
    from icee_tpu.evaluation.coco_metrics import meteor_sentence
    ref = "the cat sat on the mat".split()
    hyp = "on the mat sat the cat".split()
    assert abs(meteor_sentence([ref], hyp) - 0.5) < 1e-12


def test_meteor_stem_tier():
    from icee_tpu.evaluation.coco_metrics import meteor_sentence
    ref = "the cat runs".split()
    hyp = "the cat running".split()   # 'running'~'runs' via Porter stem
    assert abs(meteor_sentence([ref], hyp) - (1 - 0.5 / 27)) < 1e-12


def test_meteor_precision_recall_weighting():
    from icee_tpu.evaluation.coco_metrics import meteor_sentence
    ref = "a b c d e".split()
    hyp = "a b".split()
    # m=2, P=1, R=2/5, 1 chunk: F = PR/(0.9P+0.1R) = 0.4/0.94
    f = (1.0 * 0.4) / (0.9 * 1.0 + 0.1 * 0.4)
    want = f * (1 - 0.5 * (1 / 2) ** 3)
    assert abs(meteor_sentence([ref], hyp) - want) < 1e-12


def test_meteor_multi_reference_takes_best():
    from icee_tpu.evaluation.coco_metrics import meteor_sentence
    hyp = "x y z".split()
    bad = "p q r".split()
    assert meteor_sentence([bad, hyp], hyp) == meteor_sentence([hyp], hyp)
    assert meteor_sentence([bad], hyp) == 0.0


def test_coco_metrics_block_reports_float_meteor():
    from icee_tpu.evaluation.coco_metrics import coco_metrics
    refs = [["a cat sits".split(), "a cat is sitting".split()]]
    hyps = ["a cat sits".split()]
    out = coco_metrics(refs, hyps)
    assert isinstance(out["METEOR"], float) and out["METEOR"] > 0.9
