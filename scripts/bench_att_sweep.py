"""Sweep attention-mega-kernel block sizes on TPU (same protocol as
scripts/bench_sweep.py: in-jit lax.map repetitions, median over REPS)."""
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

cfg = AttentionDecoderConfig(
    vocab_size=V, embed_size=E, hidden_size=H, factored_size=F,
    attention_size=512, feature_size=2048, max_seq_length=MAX_STEPS)
params = att_mod.init_factored_att_params(jax.random.PRNGKey(0), cfg)
params = jax.tree_util.tree_map(lambda x: x.astype(jnp.bfloat16), params)
rng = np.random.default_rng(0)
stack = jnp.asarray(
    rng.standard_normal((PIPELINE, BATCH, PIX, 2048)), jnp.bfloat16)
style = jnp.asarray(1)

configs = [tuple(int(x) for x in a.split(",")) for a in sys.argv[1:]] or [
    (24, 1), (24, 2), (48, 2)]

ref = None
for nib, ns in configs:
    if BATCH % nib:
        print(f"nib={nib}: skipped (BATCH % nib != 0)", flush=True)
        continue

    def run(ft, nib=nib, ns=ns):
        return mega_att_beam_decode(
            params, ft, style, BATCH, k=K, max_seq_length=MAX_STEPS,
            n_img_block=nib, v_tile=2048, n_streams=ns).tokens

    many = jax.jit(lambda fs, f=run: jax.lax.map(f, fs))
    t0 = time.perf_counter()
    try:
        out = np.asarray(many(stack))
    except Exception as e:
        print(f"nib={nib} ns={ns}: FAILED {type(e).__name__}: {e}", flush=True)
        continue
    compile_s = time.perf_counter() - t0
    if ref is None:
        ref = out
    times = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        np.asarray(many(stack))
        times.append((time.perf_counter() - t0) / PIPELINE)
    med, best = float(np.median(times)), float(np.min(times))
    print(f"nib={nib} ns={ns}: median {med*1e3:6.1f} ms ({BATCH/med:6.0f} cps)  "
          f"best {best*1e3:6.1f} ms ({BATCH/best:6.0f} cps)  "
          f"compile {compile_s:5.1f}s  match_first={bool((out == ref).all())}",
          flush=True)
