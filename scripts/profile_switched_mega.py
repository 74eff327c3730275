"""Hardware stage-profile of the SWITCHED senticap mega decode kernel:
time the full kernel and versions with one stage stubbed to cheap junk;
the deltas attribute the per-step cost (same method as the base kernel's
``profile_mega.py``).

Stages: no_cell2 (second LSTM), no_mix (sentiment head + mixture),
no_head (both heads + mix + topk), no_topk (pass B), no_select (beam
bookkeeping), no_embed (one-hot embedding matmuls).

Usage: PYTHONPATH=/root/.axon_site:/root/repo \
        python scripts/profile_switched_mega.py [nib] [ns]
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from icee_tpu.ops.pallas_senticap_switched_decode import (
    mega_senticap_switched_decode,
)
from icee_tpu.senticap import model as sc_model
from icee_tpu.senticap import switched as sw_model
from icee_tpu.senticap.config import senticap_conf

N, VOCAB, BEAM, MAX_LEN = 64, 8800, 20, 20
NIB = int(sys.argv[1]) if len(sys.argv) > 1 else 16
NS = int(sys.argv[2]) if len(sys.argv) > 2 else 2


def main():
    print("devices:", jax.devices())
    conf = senticap_conf(emb_size=512, lstm_hidden_size=512)
    rng = np.random.default_rng(0)
    base = sc_model.init_params(jax.random.PRNGKey(0), VOCAB, conf)
    params = sw_model.init_params(jax.random.PRNGKey(1), VOCAB, conf,
                                  base=base)
    v = jnp.asarray(rng.standard_normal((N, conf["visual_size"])),
                    jnp.float32)

    results = {}
    for prof in ("full", "no_embed", "no_select", "no_topk", "no_mix",
                 "no_cell2", "no_head"):
        t0 = time.time()
        try:
            # np.asarray forces the transfer sync (block_until_ready alone
            # returned instantly through the relay in the first run)
            np.asarray(mega_senticap_switched_decode(
                params, v, N, beam_size=BEAM, max_len=MAX_LEN,
                n_img_block=NIB, n_streams=NS, _profile=prof)[1])
        except Exception as e:  # noqa: BLE001
            print(f"{prof}: FAILED {type(e).__name__}: {str(e)[:200]}")
            continue
        compile_s = time.time() - t0
        ts = []
        for _ in range(5):
            t0 = time.perf_counter()
            np.asarray(mega_senticap_switched_decode(
                params, v, N, beam_size=BEAM, max_len=MAX_LEN,
                n_img_block=NIB, n_streams=NS, _profile=prof)[1])
            ts.append(time.perf_counter() - t0)
        ms = float(np.median(ts)) * 1e3
        results[prof] = ms
        print(f"{prof:10s} {ms:7.2f} ms  (compile {compile_s:.0f}s)",
              flush=True)

    if "full" in results:
        full = results["full"]
        print(f"\nstage attribution (nib={NIB}, ns={NS}, {N} imgs):")
        for prof, ms in results.items():
            if prof == "full":
                continue
            print(f"  {prof:10s} saves {full - ms:6.2f} ms "
                  f"({100 * (full - ms) / full:5.1f}%)")


if __name__ == "__main__":
    main()
