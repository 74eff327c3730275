"""Hardware check: SentiCap mega decode kernel vs the XLA device beam.

Runs on the real TPU (axon) at the bench regime (V=8800, emb/hidden 512,
visual 4096, beam 20, max_len 20), then times both paths.  VERDICT r3
next-step #2 evidence.

The verdict is MARGIN-AWARE: Mosaic's f32 matmul accumulates in a
different order than XLA's, so accumulated-nll rank ties deeper than
~1e-6 legitimately flip winners between the two backends (a random-init
model repeats its single best word, whose margin to the runner-up sits
exactly in that window — for ALL images, since they share the head).  A
token mismatch therefore only FAILS the check when the two captions'
length-normalized scores disagree beyond f32 rounding (rtol 1e-5): that
would mean a found-worse beam, i.e. a real algorithmic bug.  Algorithmic
token-exactness is proven in interpret mode (shared matmul arithmetic) by
``tests/test_pallas_senticap_decode.py``.

Usage: python scripts/check_senticap_mega.py [n_images]
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from icee_tpu.ops.pallas_senticap_decode import mega_senticap_beam_decode
from icee_tpu.senticap import model as sc_model
from icee_tpu.senticap.beam import make_device_beam
from icee_tpu.senticap.config import senticap_conf
from icee_tpu.senticap.train import make_beam_step

N = int(sys.argv[1]) if len(sys.argv) > 1 else 64
VOCAB = 8800
BEAM, MAX_LEN = 20, 20


def main():
    print("devices:", jax.devices())
    conf = senticap_conf(emb_size=512, lstm_hidden_size=512)
    rng = np.random.default_rng(0)
    # Zipf unigram head bias = the reference's own init (mrnn.py:347-362)
    # and the realistic decode regime: a random-bias head is near-uniform
    # softmax over 8800 tokens, where every rank is a ~1e-4-deep tie and
    # XLA-vs-Mosaic f32 matmul rounding legitimately flips winners.
    unigram = 1.0 / np.arange(1, VOCAB + 1, dtype=np.float64)
    unigram /= unigram.sum()
    params = sc_model.init_params(jax.random.PRNGKey(0), VOCAB, conf,
                                  unigram=unigram[rng.permutation(VOCAB)])
    v = jnp.asarray(rng.standard_normal((N, conf["visual_size"])),
                    jnp.float32)

    make = make_beam_step(params, conf, switched=False)
    dec = make_device_beam(make(0.0), conf["lstm_hidden_size"],
                           beam_size=BEAM, max_len=MAX_LEN)
    xla = jax.jit(jax.vmap(dec.run))

    t0 = time.time()
    w_sc, w_seq, w_len, _ = map(np.asarray, xla(v))
    print(f"xla compile+run {time.time()-t0:.1f}s")

    for nib, ns in ((8, 1), (16, 2), (32, 2), (32, 4)):
        t0 = time.time()
        try:
            g_sc, g_seq, g_len = map(np.asarray, mega_senticap_beam_decode(
                params, v, N, beam_size=BEAM, max_len=MAX_LEN,
                n_img_block=min(nib, N), n_streams=ns))
        except Exception as e:  # noqa: BLE001 — report and try next block
            print(f"nib={nib},ns={ns}: FAILED {type(e).__name__}: "
                  f"{str(e)[:300]}")
            continue
        print(f"nib={nib},ns={ns}: compile+run {time.time()-t0:.1f}s")
        exact = flips = bad = 0
        for i in range(N):
            n = int(w_len[i])
            sc_close = (abs(float(g_sc[i]) - float(w_sc[i]))
                        <= 1e-5 * abs(float(w_sc[i])))
            tok_same = (int(g_len[i]) == n
                        and g_seq[i][:n].tolist() == w_seq[i][:n].tolist())
            if tok_same and sc_close:
                exact += 1
            elif sc_close:
                flips += 1             # equally-scored beam: rounding tie
            else:
                bad += 1               # worse beam: real bug
                if bad <= 3:
                    print(f"  img {i}: want len {n} "
                          f"{w_seq[i][:n].tolist()[:8]} sc {w_sc[i]:.6f} | "
                          f"got len {int(g_len[i])} "
                          f"{g_seq[i][:int(g_len[i])].tolist()[:8]} "
                          f"sc {g_sc[i]:.6f}")
        verdict = "PASS" if bad == 0 else "FAIL"
        print(f"nib={nib},ns={ns}: {verdict} — {exact}/{N} token-exact, "
              f"{flips} rounding-tie flips (score rtol<=1e-5), {bad} worse")

        # timing (median of 5)
        ts = []
        for _ in range(5):
            t0 = time.perf_counter()
            jax.block_until_ready(mega_senticap_beam_decode(
                params, v, N, beam_size=BEAM, max_len=MAX_LEN,
                n_img_block=min(nib, N), n_streams=ns))
            ts.append(time.perf_counter() - t0)
        ms = float(np.median(ts)) * 1e3
        print(f"nib={nib},ns={ns}: {ms:.2f} ms for {N} imgs "
              f"= {N / (ms / 1e3):.0f} captions/s")

    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        jax.block_until_ready(xla(v))
        ts.append(time.perf_counter() - t0)
    ms = float(np.median(ts)) * 1e3
    print(f"xla: {ms:.2f} ms for {N} imgs = {N / (ms / 1e3):.0f} captions/s")


if __name__ == "__main__":
    main()
