"""Benchmark: flagship beam-decode throughput on one TPU chip.

Decodes a batch of images with the StyleNet FactoredLSTM at the flagship
configuration (V=8192, E=300, H=512, F=512, beam k=5, max 40 steps) using the
natively-batched masked beam search driven by the Pallas fused decode-step
kernel (cell + vocab-tiled output head + streaming exact top-k + logsumexp,
``icee_tpu/ops/pallas_decode.py``) — the TPU-native replacement for the
reference's one-image-at-a-time Python beam loop
(``stylenet/model.py:198-294``).  Falls back to the pure-XLA batched beam if
the kernel fails to compile on the local runtime.

Baseline: 7.779 captions/sec measured for the reference-style CPU PyTorch
decode at identical sizes (``scripts/baseline_torch.py``; the reference repo
publishes no throughput numbers, BASELINE.md).  BASELINE.json's target is
>=10x that.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import time

import numpy as np

TORCH_CPU_BASELINE_CPS = 7.779  # scripts/baseline_torch.py, single thread

V, E, H, F = 8192, 300, 512, 512
K, MAX_STEPS = 5, 40
BATCH = 1024  # throughput scales to ~1024 images/batch on one chip


def main():
    import jax
    import jax.numpy as jnp

    from icee_tpu.core.config import DecoderConfig
    from icee_tpu.decode.beam import beam_search_batched
    from icee_tpu.models import factored_lstm as fl
    from icee_tpu.ops.pallas_decode import fused_decode_step_topk

    cfg = DecoderConfig(vocab_size=V, embed_size=E, hidden_size=H,
                        factored_size=F, max_seq_length=MAX_STEPS)
    dec = fl.init_params(jax.random.PRNGKey(0), cfg)
    # bf16 weights: MXU-native precision for the decode path
    dec = jax.tree_util.tree_map(lambda x: x.astype(jnp.bfloat16), dec)

    rng = np.random.default_rng(0)
    feats = jnp.asarray(rng.standard_normal((BATCH, K, E)), jnp.bfloat16)
    style = jnp.asarray(1)
    zeros = jnp.zeros((BATCH * K, H), jnp.bfloat16)

    def topk_step(x, state):
        h, c = state
        vals, idx, h2, c2 = fused_decode_step_topk(
            dec, x, h, c, style, ktop=K, row_block=256, v_tile=2048)
        return vals, idx, (h2, c2)

    def run(feats, fused):
        return beam_search_batched(
            embed_fn=lambda t: fl.embed(dec, t),
            step_fn=(None if fused
                     else (lambda x, s: fl.decode_step(dec, x, s, style))),
            init_model_state=(zeros, zeros),
            start_token=1, end_token=2, k=K, max_seq_length=MAX_STEPS,
            vocab_size=V, batch=BATCH, first_input=feats,
            step_topk_fn=topk_step if fused else None)

    decode = None
    for fused in (True, False):
        try:
            f = jax.jit(lambda ft, fu=fused: run(ft, fu))
            jax.block_until_ready(f(feats).tokens)  # compile + warmup
            decode = f
            break
        except Exception as e:  # Pallas unavailable -> XLA fallback
            print(f"# fused path unavailable ({type(e).__name__}); falling back")
    assert decode is not None

    # median of per-call latencies: robust to transient tunnel/runtime noise
    times = []
    for _ in range(9):
        t0 = time.perf_counter()
        res = decode(feats)
        jax.block_until_ready(res.tokens)
        times.append(time.perf_counter() - t0)
    cps = BATCH / float(np.median(times))
    print(json.dumps({
        "metric": "beam_decode_captions_per_sec",
        "value": round(cps, 2),
        "unit": "captions/sec/chip",
        "vs_baseline": round(cps / TORCH_CPU_BASELINE_CPS, 2),
    }))


if __name__ == "__main__":
    main()
