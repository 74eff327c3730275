"""Evaluation parity: native BLEU vs installed NLTK (bit-level), masked
metrics vs packed torch semantics."""

import warnings

import numpy as np
import jax.numpy as jnp
import pytest

from icee_tpu.evaluation import bleu as B
from icee_tpu.evaluation.metrics import (
    masked_cross_entropy,
    masked_top_k_accuracy,
)


def _random_corpus(rng, n_sent, vocab=20, zero_matches=False):
    refs, hyps = [], []
    for _ in range(n_sent):
        n_refs = int(rng.integers(1, 4))
        refs.append([
            [str(w) for w in rng.integers(0, vocab, int(rng.integers(3, 12)))]
            for _ in range(n_refs)
        ])
        if zero_matches:
            hyps.append([str(w + vocab) for w in
                         rng.integers(0, vocab, int(rng.integers(3, 12)))])
        else:
            # bias hypotheses toward reference tokens for nonzero overlap
            base = refs[-1][0]
            hyp = [t if rng.random() < 0.7 else str(int(rng.integers(0, vocab)))
                   for t in base]
            hyps.append(hyp)
    return refs, hyps


@pytest.mark.parametrize("seed", [0, 1, 2])
@pytest.mark.parametrize("weights", [
    (0.25, 0.25, 0.25, 0.25), (1.0,), (0.5, 0.5), (1 / 3, 1 / 3, 1 / 3),
])
def test_corpus_bleu_matches_nltk(seed, weights):
    from nltk.translate.bleu_score import corpus_bleu as nltk_bleu

    rng = np.random.default_rng(seed)
    refs, hyps = _random_corpus(rng, 25)
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        want = nltk_bleu(refs, hyps, weights=weights)
    got = B.corpus_bleu(refs, hyps, weights=weights)
    assert got == want or abs(got - want) < 1e-15, (got, want)


def test_corpus_bleu_zero_matches_matches_nltk():
    from nltk.translate.bleu_score import corpus_bleu as nltk_bleu

    rng = np.random.default_rng(7)
    refs, hyps = _random_corpus(rng, 5, zero_matches=True)
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        want = nltk_bleu(refs, hyps)
    assert B.corpus_bleu(refs, hyps) == want == 0


def test_corpus_bleu_zero_higher_order_matches_nltk():
    """Unigram matches but no 4-gram matches: method0 float_info.min path."""
    from nltk.translate.bleu_score import corpus_bleu as nltk_bleu

    refs = [[["a", "b", "c", "d", "e"]]]
    hyps = [["a", "x", "c", "y", "e"]]
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        want = nltk_bleu(refs, hyps)
    got = B.corpus_bleu(refs, hyps)
    assert got == want, (got, want)


def test_sentence_and_empty_hypothesis():
    from nltk.translate.bleu_score import corpus_bleu as nltk_bleu

    refs = [[["a", "b"]], [["c", "d", "e"]]]
    hyps = [[], ["c", "d", "e"]]
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        want = nltk_bleu(refs, hyps)
    assert abs(B.corpus_bleu(refs, hyps) - want) < 1e-15


def test_masked_cross_entropy_matches_packed_torch(rng):
    import torch

    b, t, v = 4, 6, 11
    logits = rng.standard_normal((b, t, v)).astype(np.float32)
    targets = rng.integers(0, v, (b, t)).astype(np.int64)
    lengths = np.array([6, 4, 3, 1])

    # torch packed-stream CE
    flat_logits, flat_tgts = [], []
    for i in range(b):
        flat_logits.append(logits[i, : lengths[i]])
        flat_tgts.append(targets[i, : lengths[i]])
    loss_t = torch.nn.CrossEntropyLoss()(
        torch.tensor(np.concatenate(flat_logits)),
        torch.tensor(np.concatenate(flat_tgts)),
    ).item()

    loss_j = masked_cross_entropy(
        jnp.asarray(logits), jnp.asarray(targets), jnp.asarray(lengths)
    )
    assert abs(float(loss_j) - loss_t) < 1e-5


def test_masked_top5_matches_packed_torch(rng):
    b, t, v = 3, 5, 12
    logits = rng.standard_normal((b, t, v)).astype(np.float32)
    targets = rng.integers(0, v, (b, t)).astype(np.int64)
    lengths = np.array([5, 2, 4])
    # manual packed top-5
    total, correct = 0, 0
    for i in range(b):
        for s in range(lengths[i]):
            total += 1
            top5 = np.argsort(-logits[i, s])[:5]
            correct += int(targets[i, s] in top5)
    want = 100.0 * correct / total
    got = masked_top_k_accuracy(
        jnp.asarray(logits), jnp.asarray(targets), jnp.asarray(lengths), k=5
    )
    assert abs(float(got) - want) < 1e-4
