"""Attribute the attention train step's cost (factored+att, B=128).

The chunked CE took the non-attention B=512 step 46.6 -> 8.2 ms but the
attention step only 32.4 -> 28.9 ms — something else dominates.  Candidates
per step t: the Bahdanau score pass relu(att1 + att2_t) @ full_w (a
(B, P, A) elementwise + reduce, ~51 MB of intermediate at B=128), the
context reduction sum(features * alpha), the f_beta gate, and the cell.

Variants (all fwd+bwd through jax.grad, 8-iteration in-jit scan with a
param-update data dependence):

- ``full``       : the production chunked-CE loss
- ``no_loss``    : sum(hiddens) — isolates the chunked-CE share
- ``fixed_alpha``: alpha = uniform (kills the score pass but keeps context)
- ``no_context`` : context = mean feature (kills score + context reduce)
- ``remat_att``  : jax.checkpoint on the per-step attention (recompute in
                   bwd instead of saving the (B,P,A)-shaped residuals)

Usage: python scripts/probe_att_train.py
"""

import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

V, T, B, P, A, H = 8192, 25, 128, 196, 512, 512


def main():
    import jax
    import jax.numpy as jnp

    from icee_tpu.core.config import AttentionDecoderConfig
    from icee_tpu.models import attention as att_mod
    from icee_tpu.ops.cells import factored_lstm_cell
    from icee_tpu.ops.chunked_loss import masked_ce_from_hiddens

    cfg = AttentionDecoderConfig(vocab_size=V, embed_size=300,
                                 hidden_size=H, factored_size=H,
                                 feature_size=2048, attention_size=A,
                                 dropout=0.0)
    dec = att_mod.init_factored_att_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    feats = jnp.asarray(rng.standard_normal((B, P, 2048)), jnp.float32)
    caps = jnp.asarray(rng.integers(4, V, (B, T)), jnp.int32)
    lens = jnp.full((B,), T, jnp.int32)
    mask = jnp.ones((B,), bool)

    def forward_hiddens(params, variant):
        from icee_tpu.models.factored_lstm import embed

        emb_seq = embed(params, caps)
        att = att_mod._select_attention(params["attention"], 0)
        att1 = feats @ att["enc_w"] + att["enc_b"]
        h0, c0 = att_mod.init_hidden_state(params, feats)
        mean_ctx = jnp.mean(feats, axis=1)

        def attend_t(h):
            if variant == "no_context":
                ctx, alpha = mean_ctx, jnp.full((B, P), 1.0 / P)
            elif variant == "fixed_alpha":
                alpha = jnp.full((B, P), 1.0 / P)
                ctx = jnp.sum(feats * alpha[..., None], axis=1)
            else:
                ctx, alpha = att_mod.attend_precomputed(att, att1, feats, h)
            gate = jax.nn.sigmoid(h @ params["f_beta_w"] + params["f_beta_b"])
            return gate * ctx, alpha

        if variant == "remat_att":
            attend_t = jax.checkpoint(attend_t)

        def body(carry, emb_t):
            h, c = carry
            ctx, _ = attend_t(h)
            x = jnp.concatenate([emb_t, ctx], axis=-1)
            h, c = factored_lstm_cell(params, x, h, c, 0)
            return (h, c), h

        _, hiddens = jax.lax.scan(body, (h0, c0),
                                  jnp.swapaxes(emb_seq, 0, 1))
        return jnp.swapaxes(hiddens, 0, 1)

    def make_loss(variant):
        def loss_fn(params):
            hiddens = forward_hiddens(params, variant)
            if variant == "no_loss":
                return jnp.sum(hiddens) * 1e-6
            return masked_ce_from_hiddens(hiddens, params["C_w"],
                                          params["C_b"], caps, lens, mask)
        return loss_fn

    def bench(variant):
        grad_fn = jax.grad(make_loss(variant))

        @jax.jit
        def many(params):
            def body(p, _):
                g = grad_fn(p)
                p = jax.tree_util.tree_map(lambda a, b: a - 1e-30 * b, p, g)
                return p, g["C_b"][0]
            p, out = jax.lax.scan(body, params, None, length=8)
            live = sum(jnp.sum(v) for v in jax.tree_util.tree_leaves(p))
            return out[-1] + live

        np.asarray(many(dec))
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            np.asarray(many(dec))
            ts.append((time.perf_counter() - t0) / 8)
        print(f"{variant:>12}: {np.median(ts)*1e3:7.2f} ms fwd+bwd",
              flush=True)

    for variant in ("full", "no_loss", "fixed_alpha", "no_context",
                    "remat_att"):
        bench(variant)


if __name__ == "__main__":
    main()
