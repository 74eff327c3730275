"""Cost attribution for the SentiCap mega decode kernel: time the kernel
with each phase stubbed (profile knob) to find the bottleneck on hardware.

Usage: python scripts/probe_senticap_mega.py [nib] [n_streams]
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from icee_tpu.ops.pallas_senticap_decode import mega_senticap_beam_decode
from icee_tpu.senticap import model as sc_model
from icee_tpu.senticap.config import senticap_conf

N, VOCAB, BEAM, MAX_LEN = 64, 8800, 20, 20
NIB = int(sys.argv[1]) if len(sys.argv) > 1 else 16
NS = int(sys.argv[2]) if len(sys.argv) > 2 else 1


def main():
    conf = senticap_conf(emb_size=512, lstm_hidden_size=512)
    rng = np.random.default_rng(0)
    unigram = 1.0 / np.arange(1, VOCAB + 1, dtype=np.float64)
    unigram /= unigram.sum()
    params = sc_model.init_params(jax.random.PRNGKey(0), VOCAB, conf,
                                  unigram=unigram[rng.permutation(VOCAB)])
    v = jnp.asarray(rng.standard_normal((N, conf["visual_size"])),
                    jnp.float32)

    import os
    only = os.environ.get("PROFILES")
    profiles = only.split(",") if only else ("full", "no_topk", "no_embed", "no_select")
    for profile in profiles:
        try:
            t0 = time.time()
            np.asarray(mega_senticap_beam_decode(
                params, v, N, beam_size=BEAM, max_len=MAX_LEN,
                n_img_block=NIB, n_streams=NS, _profile=profile)[1])
            compile_s = time.time() - t0
        except Exception as e:  # noqa: BLE001
            print(f"{profile}: FAILED {type(e).__name__}: {str(e)[:200]}")
            continue
        ts = []
        for _ in range(5):
            t0 = time.perf_counter()
            np.asarray(mega_senticap_beam_decode(
                params, v, N, beam_size=BEAM, max_len=MAX_LEN,
                n_img_block=NIB, n_streams=NS, _profile=profile)[1])
            ts.append(time.perf_counter() - t0)
        ms = float(np.median(ts)) * 1e3
        print(f"{profile}: {ms:.2f} ms (compile {compile_s:.0f}s)")


if __name__ == "__main__":
    main()
