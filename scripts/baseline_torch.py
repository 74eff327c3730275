"""Measure the reference-style CPU PyTorch beam-decode throughput.

The reference publishes no throughput numbers (BASELINE.md), so this script
establishes the CPU torch baseline that ``bench.py`` compares against: a
FactoredLSTM decoder with the reference's structure (separate per-gate
``nn.Linear`` chains, one image at a time, per-step Python loop, dynamic beam
shrinking, k=5, max 40 steps) at the flagship configuration
(V=8192, E=300, H=512, F=512).

This is an independent re-implementation of the *algorithm* for benchmarking
purposes, at the same asymptotic work as ``stylenet/model.py:198-294``.

Run: ``python scripts/baseline_torch.py`` -> prints measured captions/sec.
"""

import time

import torch
import torch.nn as nn
import torch.nn.functional as Fn

V, E, H, F = 8192, 300, 512, 512
K, MAX_STEPS = 5, 40


class TorchFactoredDecoder(nn.Module):
    def __init__(self):
        super().__init__()
        self.B = nn.Embedding(V, E)
        for g in "ifoc":
            setattr(self, f"V_{g}", nn.Linear(E, F))
            setattr(self, f"S_{g}", nn.Linear(F, F))
            setattr(self, f"U_{g}", nn.Linear(F, H))
            setattr(self, f"W_{g}", nn.Linear(H, H))
        self.C = nn.Linear(H, V)

    def step(self, x, h, c):
        pre = {}
        for g in "ifoc":
            v = getattr(self, f"V_{g}")(x)
            s = getattr(self, f"S_{g}")(v)
            u = getattr(self, f"U_{g}")(s)
            pre[g] = u + getattr(self, f"W_{g}")(h)
        i = torch.sigmoid(pre["i"])
        f = torch.sigmoid(pre["f"])
        o = torch.sigmoid(pre["o"])
        g = torch.tanh(pre["c"])
        c = f * c + i * g
        h = o * c
        return h, c


@torch.no_grad()
def beam_decode(model, feature, start=1, end=2):
    k = K
    prev = torch.full((k, 1), start, dtype=torch.long)
    seqs = prev
    top_scores = torch.zeros(k, 1)
    h = torch.zeros(k, H)
    c = torch.zeros(k, H)
    complete, complete_scores = [], []
    step = 1
    while True:
        if step == 1:
            x = feature.expand(k, E)
        else:
            x = model.B(prev).squeeze(1)
        h, c = model.step(x, h, c)
        scores = Fn.log_softmax(model.C(h), dim=1)
        scores = top_scores.expand_as(scores) + scores
        if step == 1:
            top_scores, top_words = scores[0].topk(k, 0, True, True)
        else:
            top_scores, top_words = scores.view(-1).topk(k, 0, True, True)
        prev_idx = torch.div(top_words, V, rounding_mode="floor")
        words = top_words % V
        seqs = torch.cat([seqs[prev_idx], words.unsqueeze(1)], dim=1)
        incomplete = [i for i, w in enumerate(words) if w != end]
        done = list(set(range(len(words))) - set(incomplete))
        if done:
            complete.extend(seqs[done].tolist())
            complete_scores.extend(top_scores[done])
        k -= len(done)
        if k == 0:
            break
        seqs = seqs[incomplete]
        h = h[prev_idx[incomplete]]
        c = c[prev_idx[incomplete]]
        top_scores = top_scores[incomplete].unsqueeze(1)
        prev = words[incomplete].unsqueeze(1)
        if step > MAX_STEPS:
            break
        step += 1
    return complete if complete else [[end]]


def main():
    torch.manual_seed(0)
    torch.set_num_threads(max(1, torch.get_num_threads()))
    model = TorchFactoredDecoder().eval()
    feats = torch.randn(8, E)
    # warmup
    beam_decode(model, feats[0:1])
    n = 8
    t0 = time.perf_counter()
    for i in range(n):
        beam_decode(model, feats[i % feats.shape[0]:i % feats.shape[0] + 1])
    dt = time.perf_counter() - t0
    print(f"torch CPU baseline: {n / dt:.3f} captions/sec "
          f"({dt / n * 1000:.1f} ms/caption, threads={torch.get_num_threads()})")


if __name__ == "__main__":
    main()
