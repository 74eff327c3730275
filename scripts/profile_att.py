"""Phase budget of the ATTENTION mega kernel via its ``_profile`` stubs
(same methodology as ``scripts/profile_mega.py``): full vs no_topk /
no_attend / no_embed; each phase's marginal cost ~ full - stubbed.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/profile_att.py
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from icee_tpu.core.config import AttentionDecoderConfig
from icee_tpu.models import attention as att_mod
from icee_tpu.ops.pallas_att_decode import mega_att_beam_decode

V, E, H, F = 8192, 300, 512, 512
K, MAX_STEPS = 5, 40
BATCH, PIX = 96, 196
PIPELINE = 8
REPS = 5
NIB = int(sys.argv[1]) if len(sys.argv) > 1 else 24

cfg = AttentionDecoderConfig(
    vocab_size=V, embed_size=E, hidden_size=H, factored_size=F,
    attention_size=512, feature_size=2048, max_seq_length=MAX_STEPS)
params = jax.tree_util.tree_map(
    lambda x: x.astype(jnp.bfloat16),
    att_mod.init_factored_att_params(jax.random.PRNGKey(0), cfg))
rng = np.random.default_rng(0)
stack = jnp.asarray(
    rng.standard_normal((PIPELINE, BATCH, PIX, 2048)), jnp.bfloat16)
style = jnp.asarray(1)

results = {}
for prof in ("full", "no_topk", "no_attend", "no_embed"):
    def run(ft, prof=prof):
        return mega_att_beam_decode(
            params, ft, style, BATCH, k=K, max_seq_length=MAX_STEPS,
            n_img_block=NIB, v_tile=2048, _profile=prof).tokens

    many = jax.jit(lambda fs, f=run: jax.lax.map(f, fs))
    t0 = time.perf_counter()
    try:
        np.asarray(many(stack))
    except Exception as e:
        print(f"{prof}: FAILED {type(e).__name__}: {e}", flush=True)
        continue
    compile_s = time.perf_counter() - t0
    times = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        np.asarray(many(stack))
        times.append((time.perf_counter() - t0) / PIPELINE)
    med = float(np.median(times))
    results[prof] = med
    print(f"{prof:10s}: median {med*1e3:6.1f} ms  compile {compile_s:5.1f}s",
          flush=True)

if "full" in results:
    full = results["full"]
    for prof, label in (("no_topk", "streaming top-k"),
                        ("no_attend", "re-attention"),
                        ("no_embed", "one-hot embedding")):
        if prof in results:
            print(f"{label:18s} ~ {(full - results[prof])*1e3:5.1f} ms "
                  f"({(full - results[prof])/full*100:4.1f}%)", flush=True)
