"""A/B the production train step: chunked CE vs materialized loss.

Times `make_caption_steps`' factual step (fwd+bwd+clip+Adam) with
TrainConfig.chunked_ce on/off across batch sizes and teacher-forcing
regimes, 16 reps inside one jitted scan (relay-floor-immune).

Usage: python scripts/profile_chunked_step.py
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

V, E, H, F, T = 8192, 300, 512, 512, 25
N_INNER = 16


def main():
    import jax
    import jax.numpy as jnp
    import optax

    from icee_tpu.core.config import DecoderConfig, EncoderConfig, TrainConfig
    from icee_tpu.models import encoder as enc_mod
    from icee_tpu.models import factored_lstm as fl
    from icee_tpu.train.steps import make_caption_steps

    cfg = DecoderConfig(vocab_size=V, embed_size=E, hidden_size=H,
                        factored_size=F, dropout=0.0)
    opt = optax.adam(2e-4)
    dec = fl.init_params(jax.random.PRNGKey(0), cfg)
    head = enc_mod.init_head_params(
        jax.random.PRNGKey(1), EncoderConfig(embed_size=E))
    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(0)

    def run(batch, tf_ratio, chunked):
        tcfg = TrainConfig(teacher_forcing_ratio=tf_ratio,
                           chunked_ce=chunked)
        fac, _, _ = make_caption_steps(cfg, tcfg, opt, opt, factored=True)
        opt_state = opt.init((dec, head))
        pooled = jnp.asarray(rng.standard_normal((batch, 2048)), jnp.float32)
        caps = jnp.asarray(rng.integers(4, V, (batch, T)), jnp.int32)
        lens = jnp.full((batch,), T, jnp.int32)
        mask = jnp.ones((batch,), bool)

        @jax.jit
        def many(dec, head, opt_state):
            def body(carry, _):
                d, h, o = carry
                d, h, o, loss = fac(d, h, o, pooled, caps, lens, mask, key)
                return (d, h, o), loss
            _, losses = jax.lax.scan(body, (dec, head, opt_state), None,
                                     length=N_INNER)
            return losses[-1]

        loss = float(np.asarray(many(dec, head, opt_state)))
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            np.asarray(many(dec, head, opt_state))
            ts.append((time.perf_counter() - t0) / N_INNER)
        ms = float(np.median(ts)) * 1e3
        print(f"B={batch:4d} tf={tf_ratio} chunked={int(chunked)}: "
              f"{ms:7.2f} ms/step ({batch/np.median(ts):8.0f} cps) "
              f"loss {loss:.4f}", flush=True)
        return ms

    for batch in (64, 512):
        for tf_ratio in (1.0, 0.8):
            base = run(batch, tf_ratio, False)
            ck = run(batch, tf_ratio, True)
            print(f"  -> speedup {base/ck:.2f}x", flush=True)


if __name__ == "__main__":
    main()
