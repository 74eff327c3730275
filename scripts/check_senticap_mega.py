"""Hardware check: SentiCap mega decode kernel vs the XLA device beam.

Runs on the real TPU (axon): token/length equality and score closeness at
the bench regime (V=8800, emb/hidden 512, visual 4096, beam 20, max_len 20),
then times both paths.  VERDICT r3 next-step #2's "token-exact on hardware"
evidence.

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
    params = sc_model.init_params(jax.random.PRNGKey(0), VOCAB, conf)
    rng = np.random.default_rng(0)
    v = jnp.asarray(rng.standard_normal((N, conf["visual_size"])),
                    jnp.float32)

    make = make_beam_step(params, conf, switched=False)
    dec = make_device_beam(make(0.0), conf["lstm_hidden_size"],
                           beam_size=BEAM, max_len=MAX_LEN)
    xla = jax.jit(jax.vmap(dec.run))

    t0 = time.time()
    w_sc, w_seq, w_len, _ = map(np.asarray, xla(v))
    print(f"xla compile+run {time.time()-t0:.1f}s")

    for nib in (8, 16, 32):
        t0 = time.time()
        try:
            g_sc, g_seq, g_len = map(np.asarray, mega_senticap_beam_decode(
                params, v, N, beam_size=BEAM, max_len=MAX_LEN,
                n_img_block=min(nib, N)))
        except Exception as e:  # noqa: BLE001 — report and try next block
            print(f"nib={nib}: FAILED {type(e).__name__}: {str(e)[:300]}")
            continue
        print(f"nib={nib}: compile+run {time.time()-t0:.1f}s")
        mism = 0
        for i in range(N):
            n = int(w_len[i])
            ok = (int(g_len[i]) == n
                  and g_seq[i][:n].tolist() == w_seq[i][:n].tolist()
                  and abs(float(g_sc[i]) - float(w_sc[i]))
                  <= 1e-5 * abs(float(w_sc[i])))
            mism += 0 if ok else 1
            if not ok and mism <= 3:
                print(f"  img {i}: want len {n} {w_seq[i][:n].tolist()[:8]} "
                      f"sc {w_sc[i]:.6f} | got len {int(g_len[i])} "
                      f"{g_seq[i][:int(g_len[i])].tolist()[:8]} "
                      f"sc {g_sc[i]:.6f}")
        print(f"nib={nib}: {N - mism}/{N} exact")

        # timing (median of 5)
        ts = []
        for _ in range(5):
            t0 = time.perf_counter()
            jax.block_until_ready(mega_senticap_beam_decode(
                params, v, N, beam_size=BEAM, max_len=MAX_LEN,
                n_img_block=min(nib, N)))
            ts.append(time.perf_counter() - t0)
        ms = float(np.median(ts)) * 1e3
        print(f"nib={nib}: {ms:.2f} ms for {N} imgs "
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
