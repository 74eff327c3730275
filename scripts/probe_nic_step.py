"""NIC (standard-LSTM) train step: fused whole-scan kernel vs XLA scan (TPU).

The NIC family got its whole-scan Pallas kernel (ops/pallas_nic_train.py)
after the factored one measured a real win; this probe produces the
hardware number that decides whether FUSED_SCAN stays auto-on for NIC
(the reference regime is ``nic/train.py:118-141``, batch 128).

Variants (full user-facing step from make_caption_steps, factored=False):
  xla    : TrainConfig(fused_scan=False)
  fused  : TrainConfig(fused_scan=True)
at B in {128, 512}, T=25, V=8192, emb 300 / hidden 512 — same shapes as
bench.py's factored train metric so the numbers are comparable.

Usage: [ICEE_BENCH_B=128,512] python scripts/probe_nic_step.py
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

V, T, E, H = 8192, 25, 300, 512
BATCHES = tuple(int(b) for b in
                os.environ.get("ICEE_BENCH_B", "128,512").split(","))


def main():
    import jax
    import jax.numpy as jnp
    import optax

    from icee_tpu.core.config import DecoderConfig, EncoderConfig, TrainConfig
    from icee_tpu.models import encoder as enc_mod
    from icee_tpu.models import lstm as nic
    from icee_tpu.train.steps import make_caption_steps

    cfg = DecoderConfig(vocab_size=V, embed_size=E, hidden_size=H,
                        dropout=0.0, factored=False)
    dec = nic.init_params(jax.random.PRNGKey(0), cfg)
    head = enc_mod.init_head_params(
        jax.random.PRNGKey(1), EncoderConfig(embed_size=E))
    rng = np.random.default_rng(0)

    for batch in BATCHES:
        pooled = jnp.asarray(rng.standard_normal((batch, 2048)), jnp.float32)
        captions = jnp.asarray(rng.integers(4, V, (batch, T)), jnp.int32)
        lengths = jnp.full((batch,), T, jnp.int32)
        mask = jnp.ones((batch,), bool)
        key = jax.random.PRNGKey(0)
        n_inner = 16

        for name, fused in (("xla  ", False), ("fused", True)):
            tcfg = TrainConfig(teacher_forcing_ratio=1.0, fused_scan=fused)
            opt = optax.adam(2e-4)
            step, _, _ = make_caption_steps(cfg, tcfg, opt, opt,
                                            factored=False)
            opt_state = opt.init((dec, head))

            @jax.jit
            def many(dec, head, opt_state, step=step):
                def body(carry, _):
                    d, h, o = carry
                    d, h, o, loss = step(d, h, o, pooled, captions,
                                         lengths, mask, key)
                    return (d, h, o), loss
                (_, _, _), losses = jax.lax.scan(
                    body, (dec, head, opt_state), None, length=n_inner)
                return losses[-1]

            t0 = time.perf_counter()
            last = float(np.asarray(many(dec, head, opt_state)))
            print(f"B={batch} {name}: compile+1 "
                  f"{time.perf_counter() - t0:.1f}s  loss {last:.5f}",
                  flush=True)
            ts = []
            for _ in range(3):
                t0 = time.perf_counter()
                np.asarray(many(dec, head, opt_state))
                ts.append((time.perf_counter() - t0) / n_inner)
            print(f"B={batch} {name}: {float(np.median(ts)) * 1e3:7.2f} "
                  "ms/step", flush=True)


if __name__ == "__main__":
    main()
