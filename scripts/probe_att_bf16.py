"""Probe (VERDICT r3 #4): do bf16 operands speed up the attention TRAIN
step?  The B=512 factored-family probe was neutral (chunked CE removed its
HBM bound), but the attention step's P=196 score/context matmuls are a
different regime — this measures it.

Runs the full production step (make_attention_steps: fwd+bwd+clip+Adam,
chunked CE) at B=128/T=25 in three configs:
  f32-xla   — params f32, fused_scan off (the XLA comparator)
  bf16-xla  — params + features cast bf16, fused_scan off
  f32-fused — params f32, the whole-scan Pallas kernel (production default)
  bf16-fused— params bf16 through the kernel (may not compile; reported)

and prints ms/step + the loss value of each (numerics delta context).
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp
import optax

from icee_tpu.core.config import AttentionDecoderConfig, TrainConfig
from icee_tpu.models import attention as att_mod
from icee_tpu.train.steps import make_attention_steps

B, T, PIX = 128, 25, 196
V, E, H, F, A = 8192, 300, 512, 512, 512
REPS, N_INNER = 5, 8


def run(dtype, fused):
    cfg = AttentionDecoderConfig(
        vocab_size=V, embed_size=E, hidden_size=H, factored_size=F,
        attention_size=A, feature_size=2048, dropout=0.0)
    tcfg = TrainConfig(fused_scan=fused)
    opt = optax.adam(2e-4)
    fac_step, _, _ = make_attention_steps(cfg, tcfg, opt, opt, factored=True)

    dec = att_mod.init_factored_att_params(jax.random.PRNGKey(0), cfg)
    dec = jax.tree_util.tree_map(lambda x: x.astype(dtype), dec)
    opt_state = opt.init(dec)
    rng = np.random.default_rng(0)
    feats = jnp.asarray(rng.standard_normal((B, PIX, 2048)) * 0.1, dtype)
    captions = jnp.asarray(rng.integers(4, V, (B, T + 1)), jnp.int32)
    lengths = jnp.full((B,), T + 1, jnp.int32)
    mask = jnp.ones((B,), bool)
    key = jax.random.PRNGKey(0)

    @jax.jit
    def many(dec, opt_state):
        def body(carry, _):
            d, o = carry
            d, o, loss = fac_step(d, o, feats, captions, lengths, mask, key)
            return (d, o), loss
        _, losses = jax.lax.scan(body, (dec, opt_state), None,
                                 length=N_INNER)
        return losses[-1]

    loss = float(np.asarray(many(dec, opt_state)))  # compile + warmup
    times = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        np.asarray(many(dec, opt_state))
        times.append((time.perf_counter() - t0) / N_INNER)
    return float(np.median(times)) * 1e3, loss


def main():
    print("devices:", jax.devices())
    only = sys.argv[1] if len(sys.argv) > 1 else None
    for name, dtype, fused in (("f32-xla", jnp.float32, False),
                               ("bf16-xla", jnp.bfloat16, False),
                               ("f32-fused", jnp.float32, True),
                               ("bf16-fused", jnp.bfloat16, True)):
        if only and name != only:
            continue
        try:
            ms, loss = run(dtype, fused)
            print(f"{name}: {ms:.2f} ms/step  loss={loss:.4f}")
        except Exception as e:  # noqa: BLE001
            print(f"{name}: FAILED {type(e).__name__}: {str(e)[:200]}")


if __name__ == "__main__":
    main()
