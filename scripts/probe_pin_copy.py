"""AOT probe: does the pinned one-dispatch epoch program COPY the pinned
feature array, and does carry+donation eliminate it?

Round-5 design-point run (KERNELS.md 4f): the U=6000 pinned epoch OOMed at
23.14 G of 15.75 G — the program held a full `copy(images.1)` (9.16 G) in
HLO temp.  Hypothesis: a `lax.scan` closed-over constant becomes a while-
loop invariant threaded through the XLA loop-state tuple, so the entry
parameter is copied into temp space; carrying the array through the scan
CARRY with `donate_argnums` lets XLA alias parameter -> loop state ->
output instead (zero copy, caller rebinds the returned array).

Uses `jit(...).lower(ShapeDtypeStruct...).compile().memory_analysis()` —
compile-only (the axon remote compiler), no device data moved.  Prints
temp/argument/output sizes per variant and U.

Usage: python scripts/probe_pin_copy.py
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

P, FEAT, H, V = 196, 2048, 512, 8192
B, NB, T = 128, 8, 20


def main():
    import jax
    import jax.numpy as jnp

    f32, i32 = jnp.float32, jnp.int32

    def step(w, feats, caps):
        # representative compute: pooled feature -> hidden -> vocab CE
        def loss_fn(w):
            h = jnp.tanh(feats.mean(axis=1) @ w["e"])          # (B, H)
            logits = h @ w["v"]                                # (B, V)
            lse = jax.nn.logsumexp(logits, axis=-1)
            tok = jnp.take_along_axis(logits, caps[:, :1], axis=1)[:, 0]
            return jnp.mean(lse - tok)
        loss, g = jax.value_and_grad(loss_fn)(w)
        w = jax.tree_util.tree_map(lambda a, b: a - 1e-3 * b, w, g)
        return w, loss

    def epoch_const(w, images, caps, idx, rows):
        # images CLOSED OVER by the scan body (the current production form)
        def body(carry, xs):
            w = carry
            bidx, brow = xs
            feats = jnp.take(images, brow, axis=0)
            bcaps = jnp.take(caps, bidx, axis=0)
            w, loss = step(w, feats, bcaps)
            return w, loss
        w, losses = jax.lax.scan(body, w, (idx, rows))
        return w, losses

    def epoch_carry(w, images, caps, idx, rows):
        # images rides the scan CARRY unchanged and is RETURNED; with
        # donate_argnums=(1,) XLA can alias input -> loop state -> output
        def body(carry, xs):
            w, images = carry
            bidx, brow = xs
            feats = jnp.take(images, brow, axis=0)
            bcaps = jnp.take(caps, bidx, axis=0)
            w, loss = step(w, feats, bcaps)
            return (w, images), loss
        (w, images), losses = jax.lax.scan(body, (w, images), (idx, rows))
        return w, images, losses

    def shapes(u):
        w = {"e": jax.ShapeDtypeStruct((FEAT, H), f32),
             "v": jax.ShapeDtypeStruct((H, V), f32)}
        return (w,
                jax.ShapeDtypeStruct((u, P, FEAT), f32),
                jax.ShapeDtypeStruct((NB * B, T), i32),
                jax.ShapeDtypeStruct((NB, B), i32),
                jax.ShapeDtypeStruct((NB, B), i32))

    for u in (700, 4000, 6000):
        img_gib = u * P * FEAT * 4 / 2**30
        print(f"--- U={u} ({img_gib:.2f} GiB images) ---", flush=True)
        for name, fn, donate in (
                ("const          ", epoch_const, ()),
                ("carry+donate   ", epoch_carry, (1,)),
                ("carry, no-donate", epoch_carry, ())):
            try:
                c = (jax.jit(fn, donate_argnums=donate)
                     .lower(*shapes(u)).compile())
                m = c.memory_analysis()
                print(f"{name}: temp {m.temp_size_in_bytes/2**30:6.2f} GiB  "
                      f"args {m.argument_size_in_bytes/2**30:6.2f}  "
                      f"out {m.output_size_in_bytes/2**30:6.2f}  "
                      f"alias {m.alias_size_in_bytes/2**30:6.2f}",
                      flush=True)
            except Exception as e:  # noqa: BLE001
                print(f"{name}: FAILED {type(e).__name__}: {str(e)[:200]}",
                      flush=True)


if __name__ == "__main__":
    main()
