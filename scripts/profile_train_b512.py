"""Ablation profile of the large-batch train step (KERNELS.md §4 note).

Times the B=512 factual step's pieces in-jit (16 reps per dispatch) to name
what bounds it: full step vs fwd-only vs fwd+bwd (no optimizer) vs a
no-head variant (loss on the pre-vocab hidden states), plus batch scaling.

Usage: python scripts/profile_train_b512.py
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

V, E, H, F, T = 8192, 300, 512, 512, 25


def timed(jax, fn, args, n_inner, label):
    import numpy as np
    np.asarray(fn(*args))
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(fn(*args))
        times.append((time.perf_counter() - t0) / n_inner)
    print(f"{label}: {np.median(times)*1e3:.2f} ms", flush=True)
    return float(np.median(times))


def main():
    import jax
    import jax.numpy as jnp
    import optax

    from icee_tpu.core.config import DecoderConfig, EncoderConfig, TrainConfig
    from icee_tpu.evaluation.metrics import masked_cross_entropy
    from icee_tpu.models import encoder as enc_mod
    from icee_tpu.models import factored_lstm as fl
    from icee_tpu.train.steps import make_caption_steps

    cfg = DecoderConfig(vocab_size=V, embed_size=E, hidden_size=H,
                        factored_size=F, dropout=0.0)
    tcfg = TrainConfig(teacher_forcing_ratio=1.0, fused_scan=False)
    opt = optax.adam(2e-4)
    dec = fl.init_params(jax.random.PRNGKey(0), cfg)
    head = enc_mod.init_head_params(
        jax.random.PRNGKey(1), EncoderConfig(embed_size=E))

    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(0)

    def data(b):
        return (jnp.asarray(rng.standard_normal((b, 2048)), jnp.float32),
                jnp.asarray(rng.integers(4, V, (b, T)), jnp.int32),
                jnp.full((b,), T, jnp.int32), jnp.ones((b,), bool))

    n_inner = 16

    def many_of(step3):
        @jax.jit
        def many(dec, head, args):
            def body(c, _):
                d, h = c
                d, h, loss = step3(d, h, *args)
                return (d, h), loss
            (_, _), losses = jax.lax.scan(body, (dec, head), None,
                                          length=n_inner)
            return losses[-1]
        return many

    def loss_fn(d, h, pooled, caps, lens, mask, with_head=True):
        feats, h2 = enc_mod.encode_global_from_pooled(h, pooled, train=True)
        logits = fl.forward(d, cfg, caps, feats, style=0,
                            teacher_forcing_ratio=1.0, rng=key, train=True)
        if with_head:
            return masked_cross_entropy(logits, caps, lens, mask)
        return jnp.mean(logits[..., :8] ** 2)  # pre-reduction proxy

    for b in (64, 128, 256, 512):
        args = data(b)
        fac, _, _ = make_caption_steps(cfg, tcfg, opt, opt, factored=True)
        opt_state = opt.init((dec, head))

        def full(d, h, *a, fac=fac, os_=opt_state):
            d, h, _, loss = fac(d, h, os_, *a, key)
            return d, h, loss

        def fwd(d, h, *a):
            return d, h, loss_fn(d, h, *a)

        def fwdbwd(d, h, *a):
            loss, grads = jax.value_and_grad(
                lambda p: loss_fn(p[0], p[1], *a))((d, h))
            return (jax.tree_util.tree_map(lambda x, g: x - 0.0 * g, d,
                                           grads[0]), h, loss)

        t_full = timed(jax, many_of(full), (dec, head, args), n_inner,
                       f"B={b} full step")
        t_fb = timed(jax, many_of(fwdbwd), (dec, head, args), n_inner,
                     f"B={b} fwd+bwd only")
        t_f = timed(jax, many_of(fwd), (dec, head, args), n_inner,
                    f"B={b} fwd only")
        print(f"B={b}: adam/clip tail {1e3*(t_full-t_fb):.2f} ms, "
              f"bwd {1e3*(t_fb-t_f):.2f} ms", flush=True)


if __name__ == "__main__":
    main()
