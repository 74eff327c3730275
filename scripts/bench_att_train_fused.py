"""Measure the fused attention training scan vs the XLA scan on TPU.

Full production regime: B=128, T=25, V=8192, P=196, A=512, H=512 —
the complete train loss (chunked CE + doubly-stochastic regularizer),
fwd+bwd through jax.grad, 8-iteration in-jit scan.

Also checks hardware parity (compiled kernel vs XLA scan) on the full
shapes before timing.

Usage: python scripts/bench_att_train_fused.py [tile_b ...]
       ICEE_BENCH_TF=0.8 python scripts/bench_att_train_fused.py   # scheduled
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

V, T, B, P, A, H = 8192, 25, 128, 196, 512, 512
B = int(os.environ.get("ICEE_BENCH_B", B))


def main():
    import jax
    import jax.numpy as jnp

    from icee_tpu.core.config import AttentionDecoderConfig
    from icee_tpu.models import attention as att_mod
    from icee_tpu.ops.chunked_loss import masked_ce_from_hiddens

    def parse_tile(a):
        if "x" in a:  # "32x8" = tile_fwd 32, tile_bwd 8
            f, b = a.split("x")
            return (int(f), int(b))
        return int(a)

    tiles = [parse_tile(a) for a in sys.argv[1:]] or [8]

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

    def make_loss(fused, tile_b=8):
        def loss_fn(params):
            hiddens, alphas = att_mod.factored_att_forward_hiddens(
                params, cfg, caps, feats, 0, teacher_forcing_ratio=tf_ratio,
                rng=jax.random.PRNGKey(3), train=False, fused_scan=fused)
            ce = masked_ce_from_hiddens(hiddens, params["C_w"],
                                        params["C_b"], caps, lens, mask)
            reg = jnp.mean((1.0 - jnp.sum(alphas, axis=1)) ** 2)
            return ce + reg
        return loss_fn

    # --- hardware sanity on full shapes.  NOTE: on TPU the default f32
    # matmul precision rounds operands to bf16, so BOTH the kernel and the
    # XLA scan carry few-e-3 noise vs true f32 that the 25-step recurrence
    # amplifies; the meaningful check (scripts/debug_att_bwd.py, 3-way vs a
    # highest-precision oracle) shows kern-vs-highest == xla-vs-highest on
    # every grad leaf.  Exact-f32 equivalence is proven in interpret mode
    # (tests/test_pallas_att_train.py). ---
    vk = jax.jit(jax.value_and_grad(make_loss(True)))(dec)[0]
    vr = jax.jit(jax.value_and_grad(make_loss(False)))(dec)[0]
    print(f"loss fused={float(vk):.6f} xla={float(vr):.6f}", flush=True)

    def bench(name, loss_fn):
        grad_fn = jax.grad(loss_fn)

        @jax.jit
        def many(params):
            def body(p, _):
                g = grad_fn(p)
                p = jax.tree_util.tree_map(lambda a, b: a - 1e-30 * b, p, g)
                return p, g["C_b"][0]
            p, out = jax.lax.scan(body, params, None, length=8)
            live = sum(jnp.sum(v) for v in jax.tree_util.tree_leaves(p))
            return out[-1] + live

        t0 = time.perf_counter()
        np.asarray(many(dec))
        print(f"{name}: compile+1 {time.perf_counter()-t0:.1f}s", flush=True)
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            np.asarray(many(dec))
            ts.append((time.perf_counter() - t0) / 8)
        print(f"{name}: {np.median(ts)*1e3:7.2f} ms/step fwd+bwd", flush=True)

    bench("xla ", make_loss(False))
    for tb in tiles:
        import icee_tpu.models.attention as am

        # patch the glue's tile via a wrapper when exploring tile sizes
        # (teacher-forced only: the scheduled-sampling variant's tiles are
        # picked by the glue, so tf<1 always routes through make_loss)
        if tb != 8 and tf_ratio >= 1.0:
            import icee_tpu.ops.pallas_att_train as pat
            orig = pat.fused_att_scan

            def make_loss_tb(tile_b):
                def loss_fn(params):
                    att = att_mod._select_attention(params["attention"], 0)
                    att1 = feats @ att["enc_w"] + att["enc_b"]
                    h0, c0 = att_mod.init_hidden_state(params, feats)
                    from icee_tpu.models.factored_lstm import embed
                    emb_seq = embed(params, caps)
                    e = cfg.embed_size
                    cell = {"V_we": params["V_w"][:e],
                            "V_wc": params["V_w"][e:],
                            "V_b": params["V_b"],
                            "S_w": params["S_w"][0], "S_b": params["S_b"][0],
                            "U_w": params["U_w"], "U_b": params["U_b"],
                            "W_w": params["W_w"], "W_b": params["W_b"]}
                    katt = {"dec_w": att["dec_w"], "dec_b": att["dec_b"],
                            "full_w": att["full_w"], "full_b": att["full_b"],
                            "fb_w": params["f_beta_w"],
                            "fb_b": params["f_beta_b"]}
                    hiddens, alphas = orig(cell, katt, emb_seq, att1, feats,
                                           h0, c0, "factored", tile_b)
                    ce = masked_ce_from_hiddens(hiddens, params["C_w"],
                                                params["C_b"], caps, lens,
                                                mask)
                    reg = jnp.mean((1.0 - jnp.sum(alphas, axis=1)) ** 2)
                    return ce + reg
                return loss_fn

            bench(f"fused tb={tb}", make_loss_tb(tb))
        else:
            bench(f"fused tb={tb}", make_loss(True))


if __name__ == "__main__":
    main()
