"""SentiCap test-path outputs: file layout, HTML highlight, metric block."""

import os

import pytest

from icee_tpu.senticap.eval_out import (
    score_decodes,
    switch_highlight_html,
    write_eval_outputs,
)

DECODES = [
    {"image": "i1", "positive": ["a", "happy", "dog"],
     "descriptive": ["a", "dog"], "attention": [0.1, 0.9, 0.2]},
    {"image": "i2", "positive": ["sad", "cat"],
     "descriptive": ["cat"], "attention": [0.8, 0.1]},
]
REFS = {"i1": [["a", "happy", "dog"], ["a", "dog", "runs"]],
        "i2": [["a", "sad", "cat"]]}


def test_highlight_html_marks_switched_words():
    html = switch_highlight_html(["a", "happy", "dog"], [0.1, 0.9, 0.2])
    assert 'font-weight: bold" title="switch=0.900">happy</span>' in html
    assert html.count("<span") == 3


def test_write_eval_outputs_layout(tmp_path):
    write_eval_outputs(DECODES, REFS, str(tmp_path))
    assert open(tmp_path / "output_pos").read().splitlines() == [
        "a happy dog", "sad cat"]
    assert open(tmp_path / "output_des").read().splitlines() == [
        "a dog", "cat"]
    # reference files padded over the ragged ref counts
    assert open(tmp_path / "reference0").read().splitlines() == [
        "a happy dog", "a sad cat"]
    assert open(tmp_path / "reference1").read().splitlines() == [
        "a dog runs", ""]
    assert "happy" in open(tmp_path / "highlight.html").read()


def test_score_decodes_metrics():
    m = score_decodes(DECODES, REFS, key="positive")
    assert m["Bleu_1"] > 0.5
    assert 0.0 < m["ROUGE_L"] <= 1.0
    assert isinstance(m["METEOR"], float) and 0.0 < m["METEOR"] <= 1.0
