"""Vocabulary with reference parity.

Reproduces the reference's ``Vocabulary`` wrapper and ``build_vocab`` CLI
(``stylenet/build_vocab.py:7-61``): special tokens ``<pad>=0, <start>=1,
<end>=2, <unk>=3``, unknown words fall back to ``<unk>``, and the vocabulary
keeps corpus insertion order of words with frequency >= threshold.

Also loads the reference's pickled ``vocab.pkl`` files (pickles of
``build_vocab.Vocabulary``) via a class-remapping unpickler, so trained
reference artifacts work directly.
"""

from __future__ import annotations

import io
import json
import pickle
from collections import Counter
from typing import Dict, Iterable, List

from icee_tpu.data.tokenize import word_tokenize

PAD, START, END, UNK = "<pad>", "<start>", "<end>", "<unk>"
SPECIALS = (PAD, START, END, UNK)


class Vocabulary:
    """word<->idx map; unknown words map to ``<unk>`` (build_vocab.py:21-24)."""

    def __init__(self) -> None:
        self.word2idx: Dict[str, int] = {}
        self.idx2word: Dict[int, str] = {}
        self.idx = 0

    def add_word(self, word: str) -> None:
        if word not in self.word2idx:
            self.word2idx[word] = self.idx
            self.idx2word[self.idx] = word
            self.idx += 1

    def __call__(self, word: str) -> int:
        if word not in self.word2idx:
            return self.word2idx[UNK]
        return self.word2idx[word]

    def __len__(self) -> int:
        return len(self.word2idx)

    # -- convenience -----------------------------------------------------
    @property
    def pad(self) -> int:
        return self.word2idx[PAD]

    @property
    def start(self) -> int:
        return self.word2idx[START]

    @property
    def end(self) -> int:
        return self.word2idx[END]

    @property
    def unk(self) -> int:
        return self.word2idx[UNK]

    def encode(self, tokens: Iterable[str]) -> List[int]:
        """``<start> tok... <end>`` id list (data_loader.py:74-81)."""
        return [self.start] + [self(t) for t in tokens] + [self.end]

    def decode(self, ids: Iterable[int], strip_specials: bool = True) -> List[str]:
        words = [self.idx2word[int(i)] for i in ids]
        if strip_specials:
            words = [w for w in words if w not in (START, END, PAD)]
        return words

    # -- persistence -----------------------------------------------------
    def save(self, path: str) -> None:
        """Pickle in a layout loadable by both this class and plain pickle."""
        with open(path, "wb") as f:
            pickle.dump(self, f)

    def to_json(self, path: str) -> None:
        with open(path, "w") as f:
            json.dump({"words": [self.idx2word[i] for i in range(self.idx)]}, f)

    @classmethod
    def from_json(cls, path: str) -> "Vocabulary":
        with open(path) as f:
            data = json.load(f)
        v = cls()
        for w in data["words"]:
            v.add_word(w)
        return v


class _RemapUnpickler(pickle.Unpickler):
    """Unpickler that maps the reference's ``build_vocab.Vocabulary`` (and the
    copies in every family dir) onto our :class:`Vocabulary`."""

    def find_class(self, module: str, name: str):  # noqa: D102
        if name == "Vocabulary":
            return Vocabulary
        return super().find_class(module, name)


def load_vocab(path: str) -> Vocabulary:
    """Load either our pickles or the reference's ``vocab.pkl`` artifacts."""
    with open(path, "rb") as f:
        obj = _RemapUnpickler(f).load()
    if isinstance(obj, Vocabulary):
        return obj
    # Pickle of a foreign Vocabulary restored as a bare instance dict.
    v = Vocabulary()
    v.word2idx = dict(obj.word2idx)
    v.idx2word = {int(k): w for k, w in obj.idx2word.items()}
    v.idx = int(obj.idx)
    return v


def build_vocab(path: str, threshold: int = 4) -> Vocabulary:
    """Build the vocabulary exactly like ``build_vocab.py:30-61``.

    Reads the caption file, keeps the text after the last tab, removes all
    periods, lowercases, tokenizes the whole corpus as one string, counts, and
    keeps words with frequency >= threshold in corpus order after the four
    specials.
    """
    with open(path, "r") as f:
        lines = f.readlines()

    text = ""
    for line in lines:
        line = line.split("\t")[-1]
        line = line.replace(".", "")
        line = line.strip()
        text += line + " "
    text = text.strip().lower()

    words = word_tokenize(text)
    counter = Counter(words)
    kept = [w for w, c in counter.items() if c >= threshold]

    vocab = Vocabulary()
    for s in SPECIALS:
        vocab.add_word(s)
    for w in kept:
        vocab.add_word(w)
    return vocab
