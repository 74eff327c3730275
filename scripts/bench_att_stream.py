"""Hardware A/B for the P-streamed attention mega kernel (VERDICT r2 #2).

Floor-amortized protocol (bench.py): repetitions inside one jitted
``lax.map`` dispatch; the session-speed calibration matmul contextualizes
the numbers across sessions.  Token-parity vs the resident kernel is
checked on the first batch of every timed config.

Usage: python scripts/bench_att_stream.py [configs...]
  config = name:nib:p_tile:ns:stream  e.g. res:24:0:1:0 str:64:28:1:1
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

V, E, H, F, A, FS, P = 8192, 300, 512, 512, 512, 2048, 196
K, STEPS = 5, 40
BATCH = 384
PIPE = 2
REPS = 3


def main():
    import jax
    import jax.numpy as jnp

    from icee_tpu.core.config import AttentionDecoderConfig
    from icee_tpu.models import attention as att_mod
    from icee_tpu.ops.pallas_att_decode import mega_att_beam_decode

    configs = []
    for arg in sys.argv[1:]:
        name, nib, pt, ns, st = arg.split(":")
        configs.append((name, int(nib), int(pt), int(ns), bool(int(st))))
    if not configs:
        configs = [("res24", 24, 0, 1, False), ("str64", 64, 28, 1, True)]

    cfg = AttentionDecoderConfig(
        vocab_size=V, embed_size=E, hidden_size=H, factored_size=F,
        attention_size=A, feature_size=FS, max_seq_length=STEPS)
    params = att_mod.init_factored_att_params(jax.random.PRNGKey(0), cfg)
    params = jax.tree_util.tree_map(lambda x: x.astype(jnp.bfloat16), params)
    rng = np.random.default_rng(0)
    stack = jnp.asarray(
        rng.standard_normal((PIPE, BATCH, P, FS)), jnp.bfloat16)
    style = jnp.asarray(1)

    ref_tokens = {}

    for name, nib, pt, ns, streamed in configs:
        def run(ft, nib=nib, pt=pt, ns=ns, streamed=streamed):
            return mega_att_beam_decode(
                params, ft, style, BATCH, k=K, max_seq_length=STEPS,
                n_img_block=nib, v_tile=2048, n_streams=ns,
                p_stream=streamed, p_tile=pt).tokens

        many = jax.jit(lambda fs, f=run: jax.lax.map(f, fs))
        t0 = time.time()
        try:
            toks = np.asarray(many(stack))
        except Exception as e:
            print(f"{name}: FAILED {type(e).__name__}: {str(e)[:300]}",
                  flush=True)
            continue
        compile_s = time.time() - t0
        if "ref" not in ref_tokens:
            ref_tokens["ref"] = toks
            diff = 0
        else:
            diff = int((toks != ref_tokens["ref"]).any(axis=-1).sum())
        times = []
        for _ in range(REPS):
            t0 = time.perf_counter()
            np.asarray(many(stack))
            times.append((time.perf_counter() - t0) / PIPE)
        med = float(np.median(times))
        print(f"{name}: nib={nib} pt={pt} ns={ns} stream={int(streamed)} "
              f"-> {med*1e3:.1f} ms/{BATCH} imgs = {BATCH/med:.0f} cps "
              f"(compile {compile_s:.0f}s, tokendiff {diff}/{BATCH*PIPE})",
              flush=True)

    # session yardstick
    n, iters = 4096, 256
    a = jnp.asarray(rng.standard_normal((n, n)), jnp.bfloat16)
    b = jnp.asarray(rng.standard_normal((n, n)), jnp.bfloat16)

    @jax.jit
    def chain(a, b):
        def body(x, _):
            y = jnp.dot(x, b, preferred_element_type=jnp.bfloat16)
            return y / jnp.float32(64.0).astype(jnp.bfloat16), ()
        out, _ = jax.lax.scan(body, a, None, length=iters)
        return jnp.sum(out.astype(jnp.float32))

    np.asarray(chain(a, b))
    times = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        np.asarray(chain(a, b))
        times.append(time.perf_counter() - t0)
    tf = 2 * n**3 * iters / float(np.median(times)) / 1e12
    print(f"calibration: {tf:.1f} TFLOP/s", flush=True)


if __name__ == "__main__":
    main()
