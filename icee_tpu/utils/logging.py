"""Metrics logging / observability.

The reference logs via ``print`` plus an append-only text file
(``train_multitask.py:216,254``; SURVEY.md §5).  The trainers keep that text
contract; this module adds structured JSONL metrics so runs are machine-
readable (loss/ppl/top-5/BLEU per epoch, LR decays, step timing)."""

from __future__ import annotations

import json
import time
from typing import Optional


class MetricsLogger:
    """Append-only JSONL metrics writer (one record per event)."""

    def __init__(self, path: Optional[str]) -> None:
        self.path = path

    def log(self, event: str, **fields) -> None:
        if not self.path:
            return
        rec = {"t": time.time(), "event": event, **fields}
        with open(self.path, "a+") as f:
            f.write(json.dumps(rec) + "\n")
