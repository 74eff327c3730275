"""Render a convergence-run trajectory (VERDICT r3 #5) from the trainer's
JSONL metrics file (``icee-train --metrics_path run.jsonl``) as a markdown
table + control-policy event summary for docs/CONVERGENCE.md.

Usage: python scripts/convergence_report.py run.jsonl [more.jsonl ...]
"""

import json
import math
import sys


def load(path):
    with open(path) as f:
        return [json.loads(line) for line in f if line.strip()]


def render(path):
    recs = load(path)
    print(f"### {path}\n")
    rows = [r for r in recs if r["event"] in ("epoch_factual",
                                              "epoch_emotion")]
    if rows:
        print("| epoch | track | train loss | train ppl | val loss "
              "| val ppl | top-5 | BLEU-4 | lr |")
        print("|---|---|---|---|---|---|---|---|---|")
    for r in rows:
        track = "FAC" if r["event"] == "epoch_factual" \
            else r.get("mode", "emo")[:3].upper()
        print(f"| {r['epoch']} | {track} "
              f"| {r['train_loss']:.4f} | {math.exp(r['train_loss']):.2f} "
              f"| {r['val_loss']:.4f} | {math.exp(r['val_loss']):.2f} "
              f"| {r['top5']:.2f} | {r['bleu4']:.4f} | {r['lr']:.2e} |")
    events = [r for r in recs if r["event"] in ("lr_decay", "early_stop")]
    if events:
        print("\nControl-policy events:\n")
        for r in events:
            if r["event"] == "lr_decay":
                print(f"- epoch {r['epoch']}: LR decay ({r['track']}) "
                      f"-> {r['lr']:.2e}")
            else:
                print(f"- epoch {r['epoch']}: EARLY STOP "
                      f"(factual {r['imp_fac']} / emotion {r['imp_emo']} "
                      "non-improving epochs)")
    best = {}
    for r in rows:
        k = r["event"]
        if k not in best or r["bleu4"] > best[k]["bleu4"]:
            best[k] = r
    for k, r in best.items():
        print(f"\nBest {k}: epoch {r['epoch']} BLEU-4 {r['bleu4']:.4f} "
              f"val loss {r['val_loss']:.4f}")
    print()


if __name__ == "__main__":
    for p in sys.argv[1:]:
        render(p)
