"""Attribute the large-batch train step's backward cost (KERNELS.md §4).

The B=512 ablation (scripts/profile_train_b512.py) shows fwd 5.2 ms but
fwd+bwd 46.8 ms — the backward is ~4x less efficient than the forward.
This probe isolates WHERE the backward time goes by stop-gradient'ing one
piece at a time, and measures the two candidate fixes in place:

- ``sg_embed``   : no gradient into the embedding table (kills the
                   take()-backward scatter-add of 12.8k rows into (V, E))
- ``sg_head``    : no gradient into C_w/C_b (kills the (H,V) grad matmul)
- ``sumloss``    : sum(logits) instead of CE (kills the softmax backward
                   and the (B,T,V) log_softmax residuals)
- ``onehot_emb`` : embedding backward as a chunked one-hot matmul
                   (custom_vjp; MXU scatter replacement)
- ``chunked_ce`` : CE computed from hiddens in row chunks with a
                   custom_vjp that recomputes logits per chunk in the
                   backward — the (B,T,V) logits never hit HBM whole

Every variant runs inside one jitted 8-iteration scan whose carry is
``params - 0.0*grads`` — the gradient feeds the next iteration's params, so
XLA cannot hoist the computation out of the loop (the scalar-output probes
in the round-3 session were loop-invariant and measured ~5x too fast).

Usage: python scripts/probe_train_bwd.py
"""

import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

V, E, H, F, T, B = (int(os.environ.get(k, d)) for k, d in
                    (("PV", 8192), ("PE", 300), ("PH", 512), ("PF", 512),
                     ("PT", 25), ("PB", 512)))
N_INNER = int(os.environ.get("PN", 8))


def main():
    import jax
    import jax.numpy as jnp

    from icee_tpu.core.config import DecoderConfig
    from icee_tpu.models import factored_lstm as fl
    from icee_tpu.ops.cells import factored_lstm_cell

    cfg = DecoderConfig(vocab_size=V, embed_size=E, hidden_size=H,
                        factored_size=F, dropout=0.0)
    dec = fl.init_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    feats = jnp.asarray(rng.standard_normal((B, E)), jnp.float32)
    caps = jnp.asarray(rng.integers(4, V, (B, T)), jnp.int32)
    w = jnp.full((B, T), 1.0 / (B * T), jnp.float32)  # uniform valid mask

    # ---- chunked-onehot embedding-table gradient (candidate fix) ----------
    @jax.custom_vjp
    def embed_mm(table, tokens):
        return jnp.take(table, tokens, axis=0)

    def embed_mm_fwd(table, tokens):
        return jnp.take(table, tokens, axis=0), (tokens, table.shape[0])

    def embed_mm_bwd(res, g):
        tokens, v = res
        flat_t = tokens.reshape(-1)
        flat_g = g.reshape(-1, g.shape[-1])
        n = flat_t.shape[0]
        chunk = 2048
        n_pad = (-n) % chunk
        flat_t = jnp.pad(flat_t, (0, n_pad))
        flat_g = jnp.pad(flat_g, ((0, n_pad), (0, 0)))
        # padded rows scatter their (zero-padded) grad into token 0 — but the
        # grad rows are zero, so the contribution is zero
        tc = flat_t.reshape(-1, chunk)
        gc = flat_g.reshape(-1, chunk, flat_g.shape[-1])

        def body(acc, xs):
            t, gg = xs
            oh = jax.nn.one_hot(t, v, dtype=gg.dtype)       # (chunk, V)
            return acc + oh.T @ gg, None

        d_table, _ = jax.lax.scan(
            body, jnp.zeros((v, g.shape[-1]), g.dtype), (tc, gc))
        return d_table, None

    embed_mm.defvjp(embed_mm_fwd, embed_mm_bwd)

    # ---- chunked CE from hiddens (candidate fix) ---------------------------
    @functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
    def chunked_ce(hiddens, c_w, c_b, targets, weights, chunk):
        loss, _ = _ce_fwd_impl(hiddens, c_w, c_b, targets, weights, chunk)
        return loss

    def _ce_fwd_impl(hiddens, c_w, c_b, targets, weights, chunk):
        x = hiddens.reshape(-1, hiddens.shape[-1])
        t = targets.reshape(-1)
        ww = weights.reshape(-1)
        n = x.shape[0]
        n_pad = (-n) % chunk
        x = jnp.pad(x, ((0, n_pad), (0, 0)))
        t = jnp.pad(t, (0, n_pad))
        ww = jnp.pad(ww, (0, n_pad))
        xc = x.reshape(-1, chunk, x.shape[-1])
        tc = t.reshape(-1, chunk)
        wc = ww.reshape(-1, chunk)

        def body(acc, xs):
            xx, tt, www = xs
            logits = (xx @ c_w + c_b).astype(jnp.float32)
            m = jnp.max(logits, axis=-1)
            lse = m + jnp.log(jnp.sum(jnp.exp(logits - m[:, None]), axis=-1))
            tgt = jnp.sum(logits * jax.nn.one_hot(tt, logits.shape[-1],
                                                  dtype=logits.dtype), axis=-1)
            return acc + jnp.sum(www * (lse - tgt)), lse

        loss, lses = jax.lax.scan(body, jnp.asarray(0.0, jnp.float32),
                                  (xc, tc, wc))
        return loss, lses

    def chunked_ce_fwd(hiddens, c_w, c_b, targets, weights, chunk):
        loss, lses = _ce_fwd_impl(hiddens, c_w, c_b, targets, weights, chunk)
        return loss, (hiddens, c_w, c_b, targets, weights, lses)

    def chunked_ce_bwd(chunk, res, g):
        hiddens, c_w, c_b, targets, weights, lses = res
        x = hiddens.reshape(-1, hiddens.shape[-1])
        t = targets.reshape(-1)
        ww = weights.reshape(-1)
        n = x.shape[0]
        n_pad = (-n) % chunk
        x = jnp.pad(x, ((0, n_pad), (0, 0)))
        t = jnp.pad(t, (0, n_pad))
        ww = jnp.pad(ww, (0, n_pad))
        xc = x.reshape(-1, chunk, x.shape[-1])
        tc = t.reshape(-1, chunk)
        wc = ww.reshape(-1, chunk)

        def body(carry, xs):
            d_cw, d_cb = carry
            xx, tt, www, lse = xs
            logits = (xx @ c_w + c_b).astype(jnp.float32)
            p = jnp.exp(logits - lse[:, None])
            dlogits = (p - jax.nn.one_hot(tt, logits.shape[-1],
                                          dtype=logits.dtype))
            dlogits = dlogits * (www * g)[:, None]
            dx = (dlogits @ c_w.T.astype(jnp.float32)).astype(xx.dtype)
            d_cw = d_cw + xx.T.astype(jnp.float32) @ dlogits
            d_cb = d_cb + jnp.sum(dlogits, axis=0)
            return (d_cw, d_cb), dx

        (d_cw, d_cb), dxc = jax.lax.scan(
            body,
            (jnp.zeros(c_w.shape, jnp.float32), jnp.zeros(c_b.shape, jnp.float32)),
            (xc, tc, wc, lses))
        dx = dxc.reshape(-1, x.shape[-1])[:n].reshape(hiddens.shape)
        return (dx, d_cw.astype(c_w.dtype), d_cb.astype(c_b.dtype), None, None)

    chunked_ce.defvjp(chunked_ce_fwd, chunked_ce_bwd)

    # ---- the teacher-forced forward, piecewise-toggleable ------------------
    def forward_hiddens(params, emb):
        teacher_inputs = jnp.concatenate(
            [feats[:, None, :].astype(emb.dtype), emb[:, :-1]], axis=1)
        h0 = jnp.zeros((B, H), emb.dtype)

        def cell_body(carry, x_t):
            h, c = carry
            h, c = factored_lstm_cell(params, x_t, h, c, 0)
            return (h, c), h

        _, hiddens = jax.lax.scan(cell_body, (h0, h0),
                                  jnp.swapaxes(teacher_inputs, 0, 1))
        return jnp.swapaxes(hiddens, 0, 1)  # (B, T, H)

    def make_loss(variant):
        def loss_fn(params):
            table = params["B"]
            if variant == "sg_embed":
                table = jax.lax.stop_gradient(table)
            if variant in ("onehot_emb", "chunk_all"):
                emb = embed_mm(table, caps)
            else:
                emb = jnp.take(table, caps, axis=0)
            hiddens = forward_hiddens(params, emb)
            c_w, c_b = params["C_w"], params["C_b"]
            if variant == "sg_head":
                c_w = jax.lax.stop_gradient(c_w)
                c_b = jax.lax.stop_gradient(c_b)
            if variant in ("chunked_ce", "chunk_all"):
                return chunked_ce(hiddens, c_w, c_b, caps, w, 2048)
            logits = hiddens @ c_w + c_b
            if variant == "sumloss":
                return jnp.sum(logits) * 1e-6
            logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
            nll = -jnp.take_along_axis(logp, caps[..., None], axis=-1)[..., 0]
            return jnp.sum(nll * w)

        return loss_fn

    def bench(variant):
        grad_fn = jax.grad(make_loss(variant))

        @jax.jit
        def many(params):
            def body(p, _):
                g = grad_fn(p)
                p = jax.tree_util.tree_map(lambda a, b: a - 1e-30 * b, p, g)
                return p, g["C_b"][0]
            p, out = jax.lax.scan(body, params, None, length=N_INNER)
            # fold the final carry into the output so the param-update chain
            # (and with it every per-iteration grad) stays live under DCE
            live = sum(jnp.sum(v) for v in jax.tree_util.tree_leaves(p))
            return out[-1] + live

        np.asarray(many(dec))
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            np.asarray(many(dec))
            ts.append((time.perf_counter() - t0) / N_INNER)
        print(f"{variant:>12}: {np.median(ts)*1e3:7.2f} ms fwd+bwd", flush=True)
        return float(np.median(ts))

    # numeric check of the candidate fixes vs the reference loss, pre-timing
    base_l = make_loss("base")(dec)
    ck_l = make_loss("chunked_ce")(dec)
    print(f"loss check: base {float(base_l):.6f} chunked {float(ck_l):.6f}",
          flush=True)
    g_base = jax.grad(make_loss("base"))(dec)
    g_ck = jax.grad(make_loss("chunked_ce"))(dec)
    for k in ("C_w", "B", "U_w"):
        d = float(jnp.max(jnp.abs(g_base[k] - g_ck[k])))
        print(f"grad check {k}: max|diff| {d:.3e}", flush=True)
    g_oh = jax.grad(make_loss("onehot_emb"))(dec)
    d = float(jnp.max(jnp.abs(g_base["B"] - g_oh["B"])))
    print(f"grad check onehot B: max|diff| {d:.3e}", flush=True)

    for variant in ("base", "sg_embed", "sg_head", "sumloss",
                    "onehot_emb", "chunked_ce", "chunk_all"):
        bench(variant)


if __name__ == "__main__":
    main()
