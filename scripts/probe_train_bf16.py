"""Probe: mixed-precision (bf16 matmul operands, f32 accumulation/params)
ceiling for the large-batch train step.

With the chunked CE landed, the B=512 step is ~8.2 ms — the loss-path HBM
traffic is gone and the remaining time is the cell chain + head matmuls,
which run f32 on an MXU whose bf16 peak is ~4x the f32 path.  This probe
measures the available headroom by running the same fwd+bwd with the
matmul-heavy operands cast to bf16:

- ``f32``      : baseline (production today)
- ``bf16_cell``: cell inputs/weights bf16, f32 accumulation, h/c f32
- ``bf16_all`` : cell + chunked-CE head matmuls bf16 (logits f32)

Numerics shift (bf16 has ~3 decimal digits); the probe prints the loss and
grad deltas vs f32 so a production opt-in knows the cost.

Usage: python scripts/probe_train_bf16.py
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
N_INNER = 8


def main():
    import jax
    import jax.numpy as jnp

    from icee_tpu.core.config import DecoderConfig
    from icee_tpu.models import factored_lstm as fl
    from icee_tpu.ops.cells import factored_lstm_cell
    from icee_tpu.ops.chunked_loss import masked_ce_from_hiddens

    cfg = DecoderConfig(vocab_size=V, embed_size=E, hidden_size=H,
                        factored_size=F, dropout=0.0)
    dec = fl.init_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    feats = jnp.asarray(rng.standard_normal((B, E)), jnp.float32)
    caps = jnp.asarray(rng.integers(4, V, (B, T)), jnp.int32)
    lens = jnp.full((B,), T, jnp.int32)
    mask = jnp.ones((B,), bool)

    def forward_hiddens(params, cast_cell):
        emb = jnp.take(params["B"], caps, axis=0)
        teacher_inputs = jnp.concatenate(
            [feats[:, None, :].astype(emb.dtype), emb[:, :-1]], axis=1)
        h0 = jnp.zeros((B, H), jnp.float32)
        if cast_cell:
            cp = {k: (v.astype(jnp.bfloat16) if k in
                      ("V_w", "S_w", "U_w", "W_w") else v)
                  for k, v in params.items()}
            teacher_inputs = teacher_inputs.astype(jnp.bfloat16)
        else:
            cp = params

        def body(carry, x_t):
            h, c = carry
            hh = h.astype(x_t.dtype) if cast_cell else h
            h2, c2 = factored_lstm_cell(cp, x_t, hh, c, 0)
            return (h2.astype(jnp.float32), c2.astype(jnp.float32)), h2

        _, hiddens = jax.lax.scan(body, (h0, h0),
                                  jnp.swapaxes(teacher_inputs, 0, 1))
        return jnp.swapaxes(hiddens, 0, 1).astype(jnp.float32)

    def make_loss(variant):
        def loss_fn(params):
            hiddens = forward_hiddens(params, variant != "f32")
            cw, cb = params["C_w"], params["C_b"]
            if variant == "bf16_all":
                hiddens = hiddens.astype(jnp.bfloat16)
                cw = cw.astype(jnp.bfloat16)
            return masked_ce_from_hiddens(hiddens, cw, cb, caps, lens, mask)
        return loss_fn

    g0 = jax.grad(make_loss("f32"))(dec)
    for variant in ("bf16_cell", "bf16_all"):
        l0 = float(make_loss("f32")(dec))
        lv = float(make_loss(variant)(dec))
        gv = jax.grad(make_loss(variant))(dec)
        rel = float(jnp.linalg.norm(gv["U_w"] - g0["U_w"])
                    / jnp.linalg.norm(g0["U_w"]))
        print(f"{variant}: loss {lv:.4f} (f32 {l0:.4f}), "
              f"U_w grad rel-L2 {rel:.3e}", flush=True)

    def bench(variant):
        grad_fn = jax.grad(make_loss(variant))

        @jax.jit
        def many(params):
            def body(p, _):
                g = grad_fn(p)
                p = jax.tree_util.tree_map(lambda a, b: a - 1e-30 * b, p, g)
                return p, g["C_b"][0]
            p, out = jax.lax.scan(body, params, None, length=N_INNER)
            live = sum(jnp.sum(v) for v in jax.tree_util.tree_leaves(p))
            return out[-1] + live

        np.asarray(many(dec))
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            np.asarray(many(dec))
            ts.append((time.perf_counter() - t0) / N_INNER)
        print(f"{variant:>10}: {np.median(ts)*1e3:7.2f} ms fwd+bwd",
              flush=True)

    for variant in ("f32", "bf16_cell", "bf16_all"):
        bench(variant)


if __name__ == "__main__":
    main()
