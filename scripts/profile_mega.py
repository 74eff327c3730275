"""Phase budget of the mega beam kernel via the ``_profile`` stubs.

Runs the full kernel and the three stubbed variants (no_topk / no_select /
no_embed) at the same config; each phase's cost ~ full - stubbed (the
stubs keep the remaining phases data-dependent so nothing is DCE'd).
Use nib=128 for quick compiles (~70 s each vs ~850 s at 256; within 2% of
the production speed).

Usage: PYTHONPATH=/root/repo:/root/.axon_site \
           python scripts/profile_mega.py [nib] [streams]
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

NIB = int(sys.argv[1]) if len(sys.argv) > 1 else 128
NS = int(sys.argv[2]) if len(sys.argv) > 2 else 2

cfg = DecoderConfig(vocab_size=V, embed_size=E, hidden_size=H,
                    factored_size=F, max_seq_length=MAX_STEPS)
dec = jax.tree_util.tree_map(
    lambda x: x.astype(jnp.bfloat16),
    fl.init_params(jax.random.PRNGKey(0), cfg))
rng = np.random.default_rng(0)
feats_stack = jnp.asarray(
    rng.standard_normal((PIPELINE, BATCH, K, E)), jnp.bfloat16)
style = jnp.asarray(1)

results = {}
for prof in ("full", "no_topk", "no_select", "no_embed"):
    def run(ft, prof=prof):
        return mega_beam_decode(dec, ft, style, BATCH, start_token=1,
                                end_token=2, k=K, max_seq_length=MAX_STEPS,
                                n_img_block=NIB, v_tile=2048, n_streams=NS,
                                _profile=prof).tokens

    many = jax.jit(lambda fs, f=run: jax.lax.map(f, fs))
    t0 = time.perf_counter()
    try:
        np.asarray(many(feats_stack))
    except Exception as e:
        print(f"{prof}: FAILED {type(e).__name__}: {e}", flush=True)
        continue
    compile_s = time.perf_counter() - t0
    times = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        np.asarray(many(feats_stack))
        times.append((time.perf_counter() - t0) / PIPELINE)
    med = float(np.median(times))
    results[prof] = med
    print(f"{prof:10s}: median {med*1e3:6.1f} ms  compile {compile_s:5.1f}s",
          flush=True)

if "full" in results:
    full = results["full"]
    for prof, label in (("no_topk", "streaming top-k"),
                        ("no_select", "beam select"),
                        ("no_embed", "one-hot embedding")):
        if prof in results:
            print(f"{label:18s} ~ {(full - results[prof])*1e3:5.1f} ms "
                  f"({(full - results[prof])/full*100:4.1f}%)", flush=True)
