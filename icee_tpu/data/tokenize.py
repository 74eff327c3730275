"""Word tokenization with reference parity.

The reference tokenizes every caption with ``nltk.tokenize.word_tokenize``
(``stylenet/build_vocab.py:45``, ``stylenet/data_loader.py:65``), which is the
Punkt sentence splitter + the regex-based ``NLTKWordTokenizer``.  The Punkt
*data model* is unavailable offline, but ``NLTKWordTokenizer`` itself is pure
regex code shipped with the nltk package, so we reproduce ``word_tokenize``
as: lightweight sentence split -> ``NLTKWordTokenizer`` per sentence.

For the caption domain this is exactly equivalent: ``build_vocab`` strips all
periods before tokenizing (``build_vocab.py:39``) and the caption files are
single sentences, so Punkt's only job (splitting on sentence-final
punctuation) is a no-op.  The sentence splitter below conservatively splits on
``.!?`` followed by whitespace, matching Punkt on this corpus.

A pure-Python fallback tokenizer is included for environments without nltk.
"""

from __future__ import annotations

import re
from typing import List

try:  # nltk is an allowed baked-in dependency; the regex tokenizer needs no data
    from nltk.tokenize.destructive import NLTKWordTokenizer

    _NLTK_TOKENIZER = NLTKWordTokenizer()
except Exception:  # pragma: no cover - exercised only without nltk
    _NLTK_TOKENIZER = None

_SENT_RE = re.compile(r"(?<=[.!?])\s+")

# Fallback rules approximating TreebankWordTokenizer for plain lowercase text.
_FALLBACK_RE = re.compile(r"[\w-]+|[^\w\s]")


def sent_split(text: str) -> List[str]:
    """Conservative sentence split standing in for Punkt (see module doc)."""
    parts = _SENT_RE.split(text.strip())
    return [p for p in parts if p]


def word_tokenize(text: str) -> List[str]:
    """Reference-parity ``nltk.tokenize.word_tokenize`` without Punkt data."""
    if _NLTK_TOKENIZER is not None:
        return [
            tok for sent in sent_split(text) for tok in _NLTK_TOKENIZER.tokenize(sent)
        ]
    return _FALLBACK_RE.findall(text)
