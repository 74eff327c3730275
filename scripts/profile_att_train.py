"""Phase attribution for the fused attention TRAIN step (TPU).

Times coarse variants of the B=128/T=25 attention train loss to attribute
the step between the forward kernel, the backward kernel, and the chunked
CE (fwd/bwd).  All timing is an 8-iteration in-jit scan (dispatch-floor
amortized, CLAUDE.md).

Variants (fused whole-scan kernel, tile (16, 8)):
  val       : loss value only (fwd kernel + chunked-CE fwd + reg)
  hid_grad  : grad of (mean(hiddens) + reg)  -> fwd+bwd kernels, no CE bwd
  full      : grad of (chunked CE + reg)     -> the production step

Usage: [ICEE_BENCH_TF=0.8] [ICEE_BENCH_B=128] python scripts/profile_att_train.py
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

V, T, P, A, H = 8192, 25, 196, 512, 512
B = int(os.environ.get("ICEE_BENCH_B", "128"))


def main():
    import jax
    import jax.numpy as jnp

    from icee_tpu.core.config import AttentionDecoderConfig
    from icee_tpu.models import attention as att_mod
    from icee_tpu.ops.chunked_loss import masked_ce_from_hiddens

    cfg = AttentionDecoderConfig(vocab_size=V, embed_size=300,
                                 hidden_size=H, factored_size=H,
                                 feature_size=2048, attention_size=A,
                                 dropout=0.0)
    dec = att_mod.init_factored_att_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    feats = jnp.asarray(rng.standard_normal((B, P, 2048)) * 0.1, jnp.float32)
    caps = jnp.asarray(rng.integers(4, V, (B, T)), jnp.int32)
    lens = jnp.full((B,), T, jnp.int32)
    mask = jnp.ones((B,), bool)
    tf_ratio = float(os.environ.get("ICEE_BENCH_TF", "1.0"))

    def fwd(params):
        return att_mod.factored_att_forward_hiddens(
            params, cfg, caps, feats, 0, teacher_forcing_ratio=tf_ratio,
            rng=jax.random.PRNGKey(3), train=False, fused_scan=True)

    def loss_full(params):
        hiddens, alphas = fwd(params)
        ce = masked_ce_from_hiddens(hiddens, params["C_w"], params["C_b"],
                                    caps, lens, mask)
        return ce + jnp.mean((1.0 - jnp.sum(alphas, axis=1)) ** 2)

    def loss_hid(params):
        hiddens, alphas = fwd(params)
        return (jnp.mean(hiddens)
                + jnp.mean((1.0 - jnp.sum(alphas, axis=1)) ** 2))

    def timed(name, step_fn):
        @jax.jit
        def many(params):
            def body(p, _):
                out = step_fn(p)
                if isinstance(out, dict):  # grad pytree: consume + perturb
                    p = jax.tree_util.tree_map(
                        lambda a, b: a - 1e-30 * b, p, out)
                    return p, out["C_b"][0]
                return p, out
            p, outs = jax.lax.scan(body, params, None, length=8)
            live = sum(jnp.sum(v) for v in jax.tree_util.tree_leaves(p))
            return outs[-1] + live * 1e-30

        t0 = time.perf_counter()
        np.asarray(many(dec))
        print(f"{name}: compile+1 {time.perf_counter()-t0:.1f}s", flush=True)
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            np.asarray(many(dec))
            ts.append((time.perf_counter() - t0) / 8)
        med = float(np.median(ts)) * 1e3
        print(f"{name}: {med:7.2f} ms", flush=True)
        return med

    t_val = timed("val      ", loss_full)
    t_hid = timed("hid_grad ", jax.grad(loss_hid))
    t_full = timed("full     ", jax.grad(loss_full))
    print(f"\nattribution (coarse): fwd-side {t_val:.2f} | "
          f"bwd kernel ~{t_hid - t_val:.2f} | CE bwd ~{t_full - t_hid:.2f} "
          f"| total {t_full:.2f} ms (tf={tf_ratio}, B={B})")


if __name__ == "__main__":
    main()
