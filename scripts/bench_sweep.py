"""Sweep mega-beam-kernel configs (block size, streams, vocab tile) on TPU.

Timing protocol: repetitions INSIDE one jitted program (lax.map over
stacked batches) so the axon relay's ~27 ms per-dispatch floor amortizes
away; median over REPS dispatches.  Configs are compared same-session
(the shared chip varies 2-3x between sessions).

Usage:  python scripts/bench_sweep.py "256,2,2048" "256,2,2048,1" ...
Each positional arg is "n_img_block,n_streams,v_tile[,topk_fold]".
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from icee_tpu.core.config import DecoderConfig
from icee_tpu.models import factored_lstm as fl
from icee_tpu.ops.pallas_beam import mega_beam_decode

V, E, H, F = 8192, 300, 512, 512
K, MAX_STEPS = 5, 40
BATCH = 1024
PIPELINE = 16
REPS = 5

cfg = DecoderConfig(vocab_size=V, embed_size=E, hidden_size=H,
                    factored_size=F, max_seq_length=MAX_STEPS)
dec = fl.init_params(jax.random.PRNGKey(0), cfg)
dec = jax.tree_util.tree_map(lambda x: x.astype(jnp.bfloat16), dec)

rng = np.random.default_rng(0)
feats_stack = jnp.asarray(
    rng.standard_normal((PIPELINE, BATCH, K, E)), jnp.bfloat16)
style = jnp.asarray(1)

configs = [tuple(int(x) for x in a.split(",")) for a in sys.argv[1:]] or [
    (256, 2, 2048), (256, 4, 2048)]
configs = [c if len(c) == 4 else c + (0,) for c in configs]

ref_tokens = None
for nib, streams, vt, fold in configs:
    def run(ft, nib=nib, streams=streams, vt=vt, fold=fold):
        return mega_beam_decode(dec, ft, style, BATCH, start_token=1,
                                end_token=2, k=K, max_seq_length=MAX_STEPS,
                                n_img_block=nib, v_tile=vt,
                                n_streams=streams,
                                topk_fold=bool(fold)).tokens

    many = jax.jit(lambda fs, f=run: jax.lax.map(f, fs))
    t0 = time.perf_counter()
    try:
        out = np.asarray(many(feats_stack))
    except Exception as e:
        print(f"nib={nib} streams={streams} vt={vt} fold={fold}: FAILED "
              f"{type(e).__name__}: {e}", flush=True)
        continue
    compile_s = time.perf_counter() - t0
    if ref_tokens is None:
        ref_tokens = out
    exact = bool((out == ref_tokens).all())
    times = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        np.asarray(many(feats_stack))
        times.append((time.perf_counter() - t0) / PIPELINE)
    med, best = float(np.median(times)), float(np.min(times))
    print(f"nib={nib} streams={streams} vt={vt} fold={fold}: "
          f"median {med*1e3:6.1f} ms ({BATCH/med:7.0f} cps)  "
          f"best {best*1e3:6.1f} ms ({BATCH/best:7.0f} cps)  "
          f"compile {compile_s:5.1f}s  match_first={exact}", flush=True)
