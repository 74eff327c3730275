"""Compare mega beam kernel vs round-1 per-step fused path on the real TPU."""
import time

import numpy as np
import jax
import jax.numpy as jnp

from icee_tpu.core.config import DecoderConfig
from icee_tpu.decode.beam import beam_search_batched
from icee_tpu.models import factored_lstm as fl
from icee_tpu.ops.pallas_beam import mega_beam_decode
from icee_tpu.ops.pallas_decode import fused_decode_step_topk

V, E, H, F = 8192, 300, 512, 512
K, MAX_STEPS = 5, 40
BATCH = 1024

cfg = DecoderConfig(vocab_size=V, embed_size=E, hidden_size=H,
                    factored_size=F, max_seq_length=MAX_STEPS)
dec = fl.init_params(jax.random.PRNGKey(0), cfg)
dec = jax.tree_util.tree_map(lambda x: x.astype(jnp.bfloat16), dec)

rng = np.random.default_rng(0)
feats = jnp.asarray(rng.standard_normal((BATCH, K, E)), jnp.bfloat16)
style = jnp.asarray(1)
zeros = jnp.zeros((BATCH * K, H), jnp.bfloat16)


def run_mega(ft):
    return mega_beam_decode(dec, ft, style, BATCH, start_token=1,
                            end_token=2, k=K, max_seq_length=MAX_STEPS,
                            n_img_block=64, v_tile=2048)


def topk_step(x, state):
    h, c = state
    vals, idx, h2, c2 = fused_decode_step_topk(
        dec, x, h, c, style, ktop=K, row_block=256, v_tile=2048)
    return vals, idx, (h2, c2)


def run_old(ft):
    return beam_search_batched(
        embed_fn=lambda t: fl.embed(dec, t), step_fn=None,
        init_model_state=(zeros, zeros), start_token=1, end_token=2, k=K,
        max_seq_length=MAX_STEPS, vocab_size=V, batch=BATCH,
        first_input=ft, step_topk_fn=topk_step)


def timeit(name, fn):
    t0 = time.perf_counter()
    out = fn(feats)
    jax.block_until_ready(out.tokens)
    print(f"{name}: compile+run {time.perf_counter()-t0:.1f}s")
    times = []
    for _ in range(9):
        t0 = time.perf_counter()
        out = fn(feats)
        jax.block_until_ready(out.tokens)
        times.append(time.perf_counter() - t0)
    med = float(np.median(times))
    best = float(np.min(times))
    print(f"{name}: median {med*1e3:.1f} ms ({BATCH/med:.0f} cps) "
          f"best {best*1e3:.1f} ms ({BATCH/best:.0f} cps)")
    return out


mega = timeit("mega", jax.jit(run_mega))
old = timeit("per-step", jax.jit(run_old))
tok_eq = bool(jnp.all(mega.tokens == old.tokens))
len_eq = bool(jnp.all(mega.length == old.length))
print("tokens equal:", tok_eq, " lengths equal:", len_eq)
if not tok_eq:
    d = np.argwhere(np.asarray(mega.tokens != old.tokens))
    print("first diffs:", d[:5])
