"""Sentiment utilities (reference ``senticap/sentiment_utils.py``, SURVEY C9).

- :func:`reward` — the Gaussian goal reward (``sentiment_utils.py:7-12``),
- :class:`SentiScores` — noun -> (adjective, score) sentiment lexicon reader
  (``:34-60``),
- :class:`ANPVisualScores` — per-image adjective-noun-pair detector scores
  (``:23-31``); the reference reads Caffe detector outputs, here a
  pickle/npz of {image: {anp: score}}.
"""

from __future__ import annotations

import pickle
from typing import Dict, List, Optional, Tuple

import numpy as np


def reward(goal: float, s: float, sigma: float = 0.1) -> float:
    """Gaussian reward around the sentiment goal (``sentiment_utils.py:7-12``)."""
    return float(np.exp(-((s - goal) ** 2) / (2.0 * sigma ** 2)))


class SentiScores:
    """Sentiment lexicon: noun -> [(adjective, score), ...].

    File format: one ``noun<TAB>adjective<TAB>score`` per line (the
    reference parses an equivalent lexicon file)."""

    def __init__(self, path: Optional[str] = None) -> None:
        self.by_noun: Dict[str, List[Tuple[str, float]]] = {}
        if path:
            with open(path) as f:
                for line in f:
                    parts = line.strip().split("\t")
                    if len(parts) != 3:
                        continue
                    noun, adj, score = parts
                    self.by_noun.setdefault(noun, []).append(
                        (adj, float(score)))

    def adjectives_for(self, noun: str) -> List[Tuple[str, float]]:
        return self.by_noun.get(noun, [])

    def sentiment_of(self, adj: str, noun: str) -> Optional[float]:
        for a, s in self.by_noun.get(noun, []):
            if a == adj:
                return s
        return None


class ANPVisualScores:
    """Adjective-noun-pair detector scores per image."""

    def __init__(self, path: Optional[str] = None) -> None:
        self.scores: Dict[str, Dict[str, float]] = {}
        if path:
            if path.endswith(".npz"):
                blob = np.load(path, allow_pickle=True)
                self.scores = {k: blob[k].item() for k in blob.files}
            else:
                with open(path, "rb") as f:
                    self.scores = pickle.load(f)

    def score(self, image: str, anp: str) -> float:
        return self.scores.get(image, {}).get(anp, 0.0)


def switch_targets(tokens: List[str], senti: "SentiScores") -> List[float]:
    """ANP switch-supervision vector: 1.0 at sentiment-bearing positions
    (adjective of a known adjective-noun pair), else 0 — the ``SW`` matrix
    feeding LAMBDA_GAM supervision (``mrnn_switched.py:1006-1057``)."""
    out = [0.0] * len(tokens)
    for i in range(len(tokens) - 1):
        adj, noun = tokens[i], tokens[i + 1]
        if senti.sentiment_of(adj, noun) is not None:
            out[i] = 1.0
    return out
