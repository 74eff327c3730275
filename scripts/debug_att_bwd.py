"""Per-leaf hardware gradient check for the fused attention train scan.

Small lane-friendly shapes -> fast TPU compile; prints rel-L2 per grad leaf
vs the XLA oracle to isolate hardware-only backward bugs.

Usage: python scripts/debug_att_bwd.py [B] [T] [ntiles]
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

B = int(sys.argv[1]) if len(sys.argv) > 1 else 16
T = int(sys.argv[2]) if len(sys.argv) > 2 else 3
P = int(os.environ.get("DBG_P", 8))
A, FS, E, F, H = 128, 128, 128, 128, 128


def main():
    import jax
    import jax.numpy as jnp

    from icee_tpu.ops.pallas_att_train import (fused_att_scan,
                                               reference_att_scan)

    ks = jax.random.split(jax.random.PRNGKey(0), 24)
    n = lambda k, *s: jax.random.normal(k, s, jnp.float32) * 0.2  # noqa: E731
    att = {"dec_w": n(ks[0], H, A), "dec_b": n(ks[1], A),
           "full_w": n(ks[2], A, 1), "full_b": n(ks[3], 1),
           "fb_w": n(ks[4], H, FS), "fb_b": n(ks[5], FS)}
    cell = {"V_we": n(ks[6], E, 4 * F), "V_wc": n(ks[7], FS, 4 * F),
            "V_b": n(ks[8], 4, F),
            "S_w": n(ks[9], 4, F, F), "S_b": n(ks[10], 4, F),
            "U_w": n(ks[11], 4, F, H), "U_b": n(ks[12], 4, H),
            "W_w": n(ks[13], H, 4 * H), "W_b": n(ks[14], 4, H)}
    emb = n(ks[15], B, T, E)
    att1 = n(ks[16], B, P, A)
    feats = n(ks[17], B, P, FS)
    h0 = n(ks[18], B, H)
    c0 = n(ks[19], B, H)
    kh = n(ks[20], B, T, H)
    ka = n(ks[21], B, T, P)

    def loss(fn):
        def f(cell, att, emb, att1, h0, c0):
            h, a = fn(cell, att, emb, att1, feats, h0, c0)
            return jnp.sum(h * kh) + jnp.sum(a * ka)
        return f

    kern = lambda *a: fused_att_scan(*a, "factored", 8, False)  # noqa: E731
    orac = lambda *a: reference_att_scan(*a, "factored")        # noqa: E731
    args = (cell, att, emb, att1, h0, c0)
    hk, ak = jax.jit(lambda: kern(cell, att, emb, att1, feats, h0, c0))()
    hr, ar = jax.jit(lambda: orac(cell, att, emb, att1, feats, h0, c0))()
    with jax.default_matmul_precision("highest"):
        hx, ax = jax.jit(
            lambda: orac(cell, att, emb, att1, feats, h0, c0))()
    rel = lambda a_, b_: float(                               # noqa: E731
        np.linalg.norm(np.asarray(a_) - np.asarray(b_))
        / (np.linalg.norm(np.asarray(b_)) + 1e-30))
    print(f"fwd h:  kern-vs-xla {rel(hk, hr):9.2e}  "
          f"kern-vs-highest {rel(hk, hx):9.2e}  "
          f"xla-vs-highest {rel(hr, hx):9.2e}", flush=True)
    print(f"fwd a:  kern-vs-xla {rel(ak, ar):9.2e}  "
          f"kern-vs-highest {rel(ak, ax):9.2e}  "
          f"xla-vs-highest {rel(ar, ax):9.2e}", flush=True)
    gk = jax.jit(jax.grad(loss(kern), argnums=(0, 1, 2, 3, 4, 5)))(*args)
    gr = jax.jit(jax.grad(loss(orac), argnums=(0, 1, 2, 3, 4, 5)))(*args)
    with jax.default_matmul_precision("highest"):
        gx = jax.jit(jax.grad(loss(orac), argnums=(0, 1, 2, 3, 4, 5)))(*args)
    for (path, a_), (_, b_), (_, x_) in zip(
            jax.tree_util.tree_flatten_with_path(gk)[0],
            jax.tree_util.tree_flatten_with_path(gr)[0],
            jax.tree_util.tree_flatten_with_path(gx)[0]):
        a_, b_, x_ = np.asarray(a_), np.asarray(b_), np.asarray(x_)
        nx = np.linalg.norm(x_) + 1e-30
        print(f"{jax.tree_util.keystr(path):>28}: "
              f"kern-vs-highest {np.linalg.norm(a_ - x_) / nx:9.2e}  "
              f"xla-vs-highest {np.linalg.norm(b_ - x_) / nx:9.2e}",
              flush=True)


if __name__ == "__main__":
    main()
