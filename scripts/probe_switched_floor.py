"""Hardware probe: attribute the switched mega kernel's unexplained ~29 ms
to the RELAY DISPATCH FLOOR vs per-grid-iteration cost.

The round-5 check (`check_senticap_switched_mega.py`) times SINGLE
dispatches (39.4 ms / 64 imgs at nib=16) and KERNELS.md 1b initially read
the unattributed ~29 ms as per-grid-iteration cost.  The base-kernel sweep
already contradicts that (nib=8 -> 37.71 ms vs nib=32 -> 34.08 ms: 126
fewer grid iterations move only 3.6 ms), and every other bench metric
amortizes the axon relay's ~27-29 ms per-dispatch floor with repetitions
inside ONE jitted program.  This probe separates the two stories:

  1. dispatch floor: per-call time of a trivial jitted op (the floor
     itself) in this session;
  2. switched mega, single dispatch (the check protocol);
  3. switched mega, lax.map over R=4 and R=8 searches in one jit (the
     bench protocol) -> per-search time approaches floor/R + real;
  4. base mega amortized, for the expected ~2x compute ratio.

If (3) at R=8 sits near (2) - floor, the kernel's real time is ~10 ms and
the bench metric (floor-amortized by design) should read >3,000 captions/s
— the VERDICT r4 #1 target is then met by measuring the kernel the way the
repo measures everything else.

Usage: python scripts/probe_switched_floor.py
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N, VOCAB, BEAM, MAX_LEN = 64, 8800, 20, 20
NIB, NS = 16, 1


def timeit(fn, reps=5, inner=1):
    import jax
    jax.block_until_ready(fn())  # compile + warmup
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(fn())
        ts.append((time.perf_counter() - t0) / inner)
    return float(np.median(ts)) * 1e3


def main():
    import jax
    import jax.numpy as jnp

    from icee_tpu.ops.pallas_senticap_decode import mega_senticap_beam_decode
    from icee_tpu.ops.pallas_senticap_switched_decode import (
        mega_senticap_switched_decode,
    )
    from icee_tpu.senticap import model as sc_model
    from icee_tpu.senticap import switched as sw_model
    from icee_tpu.senticap.config import senticap_conf

    print("devices:", jax.devices())
    conf = senticap_conf(emb_size=512, lstm_hidden_size=512)
    rng = np.random.default_rng(0)
    base = sc_model.init_params(jax.random.PRNGKey(0), VOCAB, conf)
    params = sw_model.init_params(jax.random.PRNGKey(1), VOCAB, conf,
                                  base=base)
    k = jax.random.PRNGKey(2)
    for name in ("w_lstm_sw", "w_sw", "wemb_sw", "wvm_sw"):
        k, k2 = jax.random.split(k)
        params[name] = params[name] + 0.05 * jax.random.normal(
            k2, params[name].shape)
    v = jnp.asarray(rng.standard_normal((N, conf["visual_size"])),
                    jnp.float32)

    # 1. the dispatch floor itself
    tiny = jax.jit(lambda x: x + 1.0)
    x = jnp.zeros((8, 128), jnp.float32)
    floor = timeit(lambda: tiny(x), reps=20)
    print(f"dispatch floor (trivial jitted add): {floor:.2f} ms/call")

    # calibration yardstick so the session is comparable to the records
    # (each iteration must DEPEND on the carry, else XLA hoists the
    # loop-invariant a @ a and the figure reads absurd — observed 35,811
    # "TFLOP/s" from the folded form)
    m = jnp.asarray(rng.standard_normal((4096, 4096)), jnp.bfloat16)
    mm = jax.jit(lambda a: jax.lax.fori_loop(
        0, 8, lambda i, x: (x @ a) * (1.0 / 64.0), a))
    ms = timeit(lambda: mm(m), inner=8)
    print(f"calib: {2 * 4096**3 * 1e-9 / ms:.1f} TFLOP/s yardstick")

    # 2. single dispatch (the check-script protocol)
    one = lambda: mega_senticap_switched_decode(  # noqa: E731
        params, v, N, beam_size=BEAM, max_len=MAX_LEN,
        n_img_block=NIB, n_streams=NS)[1]
    ms_one = timeit(one)
    print(f"switched single-dispatch: {ms_one:.2f} ms/64 "
          f"= {N / ms_one * 1e3:.0f} cps   (check protocol)")

    # 3. amortized (the bench protocol) at R=4 and R=8
    for R in (4, 8):
        stack = jnp.asarray(
            rng.standard_normal((R, N, conf["visual_size"])), jnp.float32)
        many = jax.jit(lambda vs: jax.lax.map(
            lambda vv: mega_senticap_switched_decode(
                params, vv, N, beam_size=BEAM, max_len=MAX_LEN,
                n_img_block=NIB, n_streams=NS)[1], vs))
        ms_r = timeit(lambda: many(stack), inner=R)
        print(f"switched lax.map R={R}: {ms_r:.2f} ms/64 "
              f"= {N / ms_r * 1e3:.0f} cps   (bench protocol)")

    # 4. base mega amortized (compute-ratio reference)
    stack4 = jnp.asarray(
        rng.standard_normal((4, N, conf["visual_size"])), jnp.float32)
    many_b = jax.jit(lambda vs: jax.lax.map(
        lambda vv: mega_senticap_beam_decode(
            base, vv, N, beam_size=BEAM, max_len=MAX_LEN,
            n_img_block=32, n_streams=2)[1], vs))
    ms_b = timeit(lambda: many_b(stack4), inner=4)
    print(f"base lax.map R=4:      {ms_b:.2f} ms/64 "
          f"= {N / ms_b * 1e3:.0f} cps")


if __name__ == "__main__":
    main()
