"""Hardware probe (VERDICT r4 #5): attention-train MFU levers measured ON
THE FUSED KERNEL, not the XLA scan —

(a) bf16 operands for the kernel's score (``relu(att1+att2) @ full_w``)
    and context (``alpha @ feats``) matmuls with f32 accumulation: the
    kernel's matmul operand dtype follows the weight refs
    (``wdt = decw_ref.dtype``, ``ops/pallas_att_train.py:190,280``), so
    casting params + features to bf16 runs every in-kernel matmul on
    bf16 operands while all ``preferred_element_type=jnp.float32``
    accumulations stay f32.  The round-4 probe only measured bf16 on the
    XLA scan (31.0 -> 19.8 ms); the fused bf16 variant previously failed
    to lower on the remote-compile service.

(b) larger batch (256 / 512) to test whether amortizing per-step fixed
    cost over more row tiles moves the ~20% MFU.

Times the PRODUCTION step (make_attention_steps: fwd+bwd+chunked CE+Adam,
tf=0.8 sampled kernel) exactly as ``bench.py::bench_att_train`` does.

Usage: PYTHONPATH=/root/.axon_site:/root/repo \
        python scripts/probe_att_bf16_fused.py
"""

import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp
import optax

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from icee_tpu.core.config import AttentionDecoderConfig, TrainConfig
from icee_tpu.models import attention as att_mod
from icee_tpu.train.steps import make_attention_steps

V, E, H, F = 8192, 300, 512, 512
ATT_PIX, T = 196, 25
REPS = 5


def run_case(batch, dtype, fused=True, bf16_mm="0"):
    # ICEE_ATT_BF16_MM is read at kernel TRACE time (each run_case builds
    # and compiles fresh step fns), so toggling the env here is effective
    os.environ["ICEE_ATT_BF16_MM"] = bf16_mm
    cfg = AttentionDecoderConfig(
        vocab_size=V, embed_size=E, hidden_size=H, factored_size=F,
        attention_size=512, feature_size=2048, dropout=0.0)
    tcfg = TrainConfig(fused_scan=fused)
    opt = optax.adam(2e-4)
    fac_step, _, _ = make_attention_steps(cfg, tcfg, opt, opt, factored=True)

    dec = att_mod.init_factored_att_params(jax.random.PRNGKey(0), cfg)
    if dtype == jnp.bfloat16:
        dec = jax.tree_util.tree_map(lambda x: x.astype(dtype), dec)
    opt_state = opt.init(dec)
    rng = np.random.default_rng(0)
    feats = jnp.asarray(
        rng.standard_normal((batch, ATT_PIX, 2048)) * 0.1, dtype)
    captions = jnp.asarray(rng.integers(4, V, (batch, T + 1)), jnp.int32)
    lengths = jnp.full((batch,), T + 1, jnp.int32)
    mask = jnp.ones((batch,), bool)
    key = jax.random.PRNGKey(0)
    n_inner = 8

    @jax.jit
    def many(dec, opt_state, feats, captions, lengths, mask):
        # arrays enter as jit ARGUMENTS: closure-captured jax.Arrays are
        # baked into the program as constants, and the (B,196,2048) feats
        # blow the remote-compile upload limit (HTTP 413) at B>=256
        def body(carry, _):
            d, o = carry
            d, o, loss = fac_step(d, o, feats, captions, lengths, mask, key)
            return (d, o), loss
        _, losses = jax.lax.scan(body, (dec, opt_state), None,
                                 length=n_inner)
        return losses[-1]

    t0 = time.time()
    loss = float(np.asarray(many(dec, opt_state, feats, captions,
                                 lengths, mask)))
    compile_s = time.time() - t0
    times = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        np.asarray(many(dec, opt_state, feats, captions, lengths, mask))
        times.append((time.perf_counter() - t0) / n_inner)
    med = float(np.median(times)) * 1e3
    return med, loss, compile_s


def main():
    print("devices:", jax.devices())
    cases = [
        ("B=128 f32 fused   (baseline)", 128, jnp.float32, True, "0"),
        ("B=128 bf16 fused  (probe a)", 128, jnp.bfloat16, True, "0"),
        ("B=128 bf16-score-mm fused (a')", 128, jnp.float32, True, "all"),
        ("B=256 f32 fused   (probe b)", 256, jnp.float32, True, "0"),
        ("B=512 f32 fused   (probe b)", 512, jnp.float32, True, "0"),
        ("B=512 bf16-score-mm fused (a'+b)", 512, jnp.float32, True, "all"),
        ("B=512 bf16-ctx-only fused", 512, jnp.float32, True, "ctx"),
        ("B=512 bf16-score-only fused", 512, jnp.float32, True, "score"),
        ("B=128 bf16 XLA    (r4 comparator)", 128, jnp.bfloat16, False,
         "0"),
    ]
    only = os.environ.get("ICEE_PROBE_CASES", "")  # comma substring filter
    subs = [s for s in only.split(",") if s]
    base_ms = None
    for label, b, dt, fused, bf16_mm in cases:
        if subs and not any(s in label for s in subs):
            continue
        try:
            ms, loss, cs = run_case(b, dt, fused, bf16_mm)
        except Exception as e:  # noqa: BLE001
            print(f"{label:36s} FAILED {type(e).__name__}: {str(e)[:180]}",
                  flush=True)
            continue
        cps = b / (ms / 1e3)
        note = ""
        if base_ms is None and "baseline" in label:
            base_ms = ms
        if base_ms:
            note = f"  ({base_ms / ms * b / 128:.2f}x baseline cps/img)"
        print(f"{label:36s} {ms:8.2f} ms/step = {cps:8.1f} cps  "
              f"loss {loss:.4f}  (compile {cs:.0f}s){note}", flush=True)


if __name__ == "__main__":
    main()
