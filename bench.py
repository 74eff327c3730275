"""Benchmark: flagship decode + train throughput on one TPU chip.

Decode: a batch of images through the StyleNet FactoredLSTM at the flagship
configuration (V=8192, E=300, H=512, F=512, beam k=5, max 40 steps) using the
MEGA beam kernel — the ENTIRE beam search (cell, vocab-tiled head, streaming
exact top-k, beam select, state gather, next-token embedding) inside ONE
``pallas_call`` with all weights VMEM-resident across the 41 steps
(``icee_tpu/ops/pallas_beam.py``).  This replaces the reference's
one-image-at-a-time Python beam loop (``stylenet/model.py:198-294``).
Fallback chain if the mega kernel fails to compile: per-step fused kernel
(``ops/pallas_decode.py``) -> pure-XLA batched beam.

Train: the factual multitask train step (encoder head + teacher-forced
FactoredLSTM chain + masked CE + clip/Adam, ``train/steps.py``) with the
Pallas fused time-scan kernel (``ops/pallas_lstm.py``), reported as
``train_step_ms`` alongside the XLA-scan step for comparison.

Timing protocol (round-2 calibration): the axon relay imposes a ~27 ms
per-DISPATCH floor (measured: a trivial jitted scalar op costs the same as
a 20 ms kernel) plus 2-3x session variance.  All timed regions therefore
run their repetitions INSIDE one jitted program (``lax.map`` over stacked
batches / ``lax.scan`` over chained train steps): one dispatch, ``PIPELINE``
batches, so the floor is amortized to noise and the number reflects true
device throughput.  Reported: median over ``REPS`` dispatches (+ best in
``decode_ms_best``).

Baseline: 7.779 captions/sec for the reference-style CPU PyTorch decode at
identical sizes (``scripts/baseline_torch.py``; the reference publishes no
throughput numbers, BASELINE.md).  Prints ONE JSON line.
"""

import json
import time

import numpy as np

TORCH_CPU_BASELINE_CPS = 7.779  # scripts/baseline_torch.py, single thread

V, E, H, F = 8192, 300, 512, 512
K, MAX_STEPS = 5, 40
BATCH = 1024
# batches per timed dispatch: the ~27 ms relay floor divides by PIPELINE,
# so 4 left ~7 ms (14%) inside every 50 ms decode reading; 16 leaves <2 ms.
# The attention stack is 74 MB/batch of spatial features, so it uses a
# smaller pipeline (ATT_PIPELINE) to bound the one-time host->device haul.
PIPELINE = 16
ATT_PIPELINE = 8
REPS = 5
TRAIN_B, TRAIN_T = 64, 25  # reference multitask regime batch/caption length


def _median_per_batch(fn, stacked, n_inner):
    """Time ``fn(stacked)`` (one dispatch running ``n_inner`` batches
    in-program); return (median, best, per-rep times) seconds per batch."""
    times = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        np.asarray(fn(stacked))
        times.append((time.perf_counter() - t0) / n_inner)
    return float(np.median(times)), float(np.min(times)), times


def _spread_ms(times):
    """p10/p50/p90 of per-rep seconds -> milliseconds (VERDICT r3 #3: a
    single median per metric makes regressions indistinguishable from
    session drift; the spread answers it from one file)."""
    a = np.asarray(times) * 1e3
    return [round(float(np.percentile(a, q)), 3) for q in (10, 50, 90)]


def bench_calibration(jax, jnp):
    """Session-speed yardstick: a fixed 4096^3 bf16 matmul chain timed
    in-jit (lax.scan).  The v5e peak is 197 bf16 TFLOP/s; this chain
    measured 165 TFLOP/s (84% MFU) in the round-2 reference session, so
    the achieved TFLOP/s calibrates the shared chip's session speed and
    ``decode_ms_calibrated`` = decode_ms * (calib_tflops / 165) rescales
    decode time to what a nominal session would show (the relay varies
    2-3x between sessions)."""
    # 256 in-jit iterations: ~180 ms of MXU per dispatch, so the ~27 ms
    # relay floor contributes <15% (32 iters measured 83 TFLOP/s from the
    # floor alone; see the timing-protocol note above)
    n, iters = 4096, 256
    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.standard_normal((n, n)), jnp.bfloat16)
    b = jnp.asarray(rng.standard_normal((n, n)), jnp.bfloat16)

    @jax.jit
    def chain(a, b):
        def body(x, _):
            y = jnp.dot(x, b, preferred_element_type=jnp.bfloat16)
            # renormalize so the chain neither overflows nor denormals
            return y / jnp.float32(64.0).astype(jnp.bfloat16), ()
        out, _ = jax.lax.scan(body, a, None, length=iters)
        # reduce to a scalar: returning the (n, n) matrix would drag 32 MB
        # through the relay tunnel per rep and swamp the measurement
        return jnp.sum(out.astype(jnp.float32))

    np.asarray(chain(a, b))  # compile + warmup
    times = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        np.asarray(chain(a, b))
        times.append(time.perf_counter() - t0)
    sec = float(np.median(times))
    return 2 * n * n * n * iters / sec / 1e12


def bench_decode(jax, jnp, dec, feats_stack, style):
    from icee_tpu.decode.beam import beam_search_batched
    from icee_tpu.models import factored_lstm as fl

    zeros = jnp.zeros((BATCH * K, H), jnp.bfloat16)

    def run_mega(ft):
        from icee_tpu.ops.pallas_beam import mega_beam_decode
        return mega_beam_decode(dec, ft, style, BATCH, start_token=1,
                                end_token=2, k=K, max_seq_length=MAX_STEPS,
                                n_img_block=256, v_tile=2048, n_streams=2)

    def topk_step(x, state):
        from icee_tpu.ops.pallas_decode import fused_decode_step_topk
        h, c = state
        vals, idx, h2, c2 = fused_decode_step_topk(
            dec, x, h, c, style, ktop=K, row_block=256, v_tile=2048)
        return vals, idx, (h2, c2)

    def run_beam(ft, fused):
        return beam_search_batched(
            embed_fn=lambda t: fl.embed(dec, t),
            step_fn=(None if fused
                     else (lambda x, s: fl.decode_step(dec, x, s, style))),
            init_model_state=(zeros, zeros),
            start_token=1, end_token=2, k=K, max_seq_length=MAX_STEPS,
            vocab_size=V, batch=BATCH, first_input=ft,
            step_topk_fn=topk_step if fused else None)

    candidates = [
        ("mega", run_mega),
        ("fused-step", lambda ft: run_beam(ft, True)),
        ("xla", lambda ft: run_beam(ft, False)),
    ]
    for name, fn in candidates:
        # one dispatch decodes ALL stacked batches (lax.map), so the relay's
        # per-dispatch floor amortizes away
        many = jax.jit(lambda fs, f=fn: jax.lax.map(lambda ft: f(ft).tokens,
                                                    fs))
        try:
            np.asarray(many(feats_stack))  # compile + warmup
        except Exception as e:
            print(f"# decode path '{name}' unavailable "
                  f"({type(e).__name__}); falling back")
            continue
        med, best, times = _median_per_batch(many, feats_stack, PIPELINE)
        return name, med, best, times
    raise RuntimeError("no decode path compiled")


ATT_BATCH, ATT_PIX = 96, 196


def bench_att_decode(jax, jnp):
    """Attention-family decode via the attention MEGA kernel
    (``ops/pallas_att_decode.py``); returns ms/batch of ATT_BATCH images."""
    from icee_tpu.core.config import AttentionDecoderConfig
    from icee_tpu.models import attention as att_mod
    from icee_tpu.ops.pallas_att_decode import mega_att_beam_decode

    cfg = AttentionDecoderConfig(
        vocab_size=V, embed_size=E, hidden_size=H, factored_size=F,
        attention_size=512, feature_size=2048, max_seq_length=MAX_STEPS)
    params = att_mod.init_factored_att_params(jax.random.PRNGKey(0), cfg)
    params = jax.tree_util.tree_map(lambda x: x.astype(jnp.bfloat16), params)
    rng = np.random.default_rng(0)
    stack = jnp.asarray(
        rng.standard_normal((ATT_PIPELINE, ATT_BATCH, ATT_PIX, 2048)),
        jnp.bfloat16)
    style = jnp.asarray(1)

    def run(ft):
        return mega_att_beam_decode(
            params, ft, style, ATT_BATCH, k=K, max_seq_length=MAX_STEPS,
            n_img_block=24, v_tile=2048).tokens

    many = jax.jit(lambda fs: jax.lax.map(run, fs))
    np.asarray(many(stack))  # compile + warmup
    med, _, times = _median_per_batch(many, stack, ATT_PIPELINE)
    return med, times


ATT_TRAIN_B = 128


def bench_att_train(jax, jnp, fused=None, batch=None):
    """Attention captioner train step at the reference's production regime
    (B=128, 25 consumed steps, teacher_forcing_ratio=0.8 —
    ``model_att.py:242``): fwd+bwd+Adam through ``make_attention_steps``
    with the chunked CE and the fused whole-scan Pallas kernel auto-on
    (``ops/pallas_att_train.py``; tf<1 runs the scheduled-sampling variant
    with the head/argmax feedback in-kernel).  ``batch`` overrides B for
    the large-batch MFU figure (VERDICT r4 #5(b): B=512 amortizes the
    per-step fixed cost to ~1.27x the per-image throughput).  Returns
    seconds/step."""
    import optax

    from icee_tpu.core.config import AttentionDecoderConfig, TrainConfig
    from icee_tpu.models import attention as att_mod
    from icee_tpu.train.steps import make_attention_steps

    b = ATT_TRAIN_B if batch is None else batch
    cfg = AttentionDecoderConfig(
        vocab_size=V, embed_size=E, hidden_size=H, factored_size=F,
        attention_size=512, feature_size=2048, dropout=0.0)
    # teacher_forcing_ratio=0.8 (reference default); fused None = auto
    tcfg = TrainConfig(fused_scan=fused)
    opt = optax.adam(2e-4)
    fac_step, _, _ = make_attention_steps(cfg, tcfg, opt, opt, factored=True)

    dec = att_mod.init_factored_att_params(jax.random.PRNGKey(0), cfg)
    opt_state = opt.init(dec)
    rng = np.random.default_rng(0)
    feats = jnp.asarray(
        rng.standard_normal((b, ATT_PIX, 2048)) * 0.1, jnp.float32)
    captions = jnp.asarray(
        rng.integers(4, V, (b, TRAIN_T + 1)), jnp.int32)
    lengths = jnp.full((b,), TRAIN_T + 1, jnp.int32)
    mask = jnp.ones((b,), bool)
    key = jax.random.PRNGKey(0)
    n_inner = 8

    @jax.jit
    def many(dec, opt_state, feats, captions, lengths, mask):
        # arrays enter as jit ARGUMENTS: closure-captured jax.Arrays are
        # baked in as constants and the (512,196,2048) feats blow the
        # remote-compile upload limit (HTTP 413)
        def body(carry, _):
            d, o = carry
            d, o, loss = fac_step(d, o, feats, captions, lengths, mask, key)
            return (d, o), loss
        _, losses = jax.lax.scan(body, (dec, opt_state), None,
                                 length=n_inner)
        return losses[-1]

    args = (feats, captions, lengths, mask)
    np.asarray(many(dec, opt_state, *args))  # compile + warmup
    times = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        np.asarray(many(dec, opt_state, *args))
        times.append((time.perf_counter() - t0) / n_inner)
    return float(np.median(times)), times


BB_BATCH, BB_SIZE = 64, 224


def bench_backbone(jax, jnp):
    """ResNet-152 feature extraction (the serving/precompute hot path) in
    bf16 conv mode (``models/resnet.cast_conv_weights``); returns
    images/sec at batch BB_BATCH, eval-mode BN, 8 in-jit repetitions."""
    from icee_tpu.models import resnet

    params = resnet.cast_conv_weights(
        resnet.init_params(jax.random.PRNGKey(0)), jnp.bfloat16)
    rng = np.random.default_rng(0)
    imgs = jnp.asarray(
        rng.standard_normal((BB_BATCH, BB_SIZE, BB_SIZE, 3)), jnp.float32)
    n_inner = 8

    @jax.jit
    def many(imgs):
        def body(x, _):
            feats, _ = resnet.global_features(params, x, train_bn=False)
            # data-dependence between repetitions prevents CSE
            return x + (jnp.sum(feats) * 1e-30).astype(x.dtype), ()
        out, _ = jax.lax.scan(body, imgs, None, length=n_inner)
        return jnp.sum(out)

    np.asarray(many(imgs))  # compile + warmup
    times = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        np.asarray(many(imgs))
        times.append((time.perf_counter() - t0) / n_inner)
    return BB_BATCH / float(np.median(times))


def bench_train(jax, jnp, fused_scan, batch=TRAIN_B):
    import optax

    from icee_tpu.core.config import DecoderConfig, EncoderConfig, TrainConfig
    from icee_tpu.models import encoder as enc_mod
    from icee_tpu.models import factored_lstm as fl
    from icee_tpu.train.steps import make_caption_steps

    cfg = DecoderConfig(vocab_size=V, embed_size=E, hidden_size=H,
                        factored_size=F, dropout=0.0)
    tcfg = TrainConfig(teacher_forcing_ratio=1.0, fused_scan=fused_scan)
    opt = optax.adam(2e-4)
    fac_step, _, _ = make_caption_steps(cfg, tcfg, opt, opt, factored=True)

    dec = fl.init_params(jax.random.PRNGKey(0), cfg)
    head = enc_mod.init_head_params(
        jax.random.PRNGKey(1), EncoderConfig(embed_size=E))
    opt_state = opt.init((dec, head))
    rng = np.random.default_rng(0)
    pooled = jnp.asarray(rng.standard_normal((batch, 2048)), jnp.float32)
    captions = jnp.asarray(rng.integers(4, V, (batch, TRAIN_T)), jnp.int32)
    lengths = jnp.full((batch,), TRAIN_T, jnp.int32)
    mask = jnp.ones((batch,), bool)
    key = jax.random.PRNGKey(0)

    n_inner = 16

    @jax.jit
    def many(dec, head, opt_state):
        def body(carry, _):
            d, h, o = carry
            d, h, o, loss = fac_step(d, h, o, pooled, captions, lengths,
                                     mask, key)
            return (d, h, o), loss
        (_, _, _), losses = jax.lax.scan(body, (dec, head, opt_state),
                                         None, length=n_inner)
        return losses[-1]

    np.asarray(many(dec, head, opt_state))  # compile + warmup
    times = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        np.asarray(many(dec, head, opt_state))
        times.append((time.perf_counter() - t0) / n_inner)
    return float(np.median(times)), times


EPOCH_N, EPOCH_B = 4096, 512


def _epoch_examples(rng):
    """EPOCH_N synthetic caption examples + a 1024-image feature cache
    (shared by the host-loader and device-resident epoch benches)."""
    from icee_tpu.data.captions import CaptionExample

    examples, feats = [], {}
    for i in range(EPOCH_N):
        ln = int(rng.integers(8, TRAIN_T))
        ids = [1] + list(rng.integers(4, V, ln - 2)) + [2]
        name = f"img{i % 1024}.jpg"   # 1024 unique images, cached features
        examples.append(CaptionExample(image=name, caption_ids=ids,
                                       all_caption_ids=[ids]))
        if name not in feats:
            feats[name] = rng.standard_normal((2048,)).astype(np.float32)
    return examples, feats


def host_cpu_ref_ms():
    """Fixed single-threaded host work unit (gather + sort + reduce over a
    512x2048 array, 10 reps) — a load canary for the host-loader epoch
    metric (VERDICT r4 weak #6: that metric mixes host CPU contention into
    a TPU benchmark; 2,837-vs-5,383 swings were unattributable).  On an
    otherwise-idle host this reads ~a constant; a 2-3x elevated reading
    means the epoch figure is host-contended and should be discounted."""
    rng = np.random.default_rng(0)
    a = rng.standard_normal((512, 2048)).astype(np.float32)
    idx = rng.integers(0, 512, 1024)
    t0 = time.perf_counter()
    acc = 0.0
    for _ in range(5):
        g = a[idx]
        order = np.argsort(g.sum(axis=1))
        acc += float(g[order[:16]].mean())
    return (time.perf_counter() - t0) * 1e3 + 0.0 * acc


def bench_train_epoch(jax, jnp):
    """End-to-end EPOCH throughput (VERDICT r2 #6): the real host loader
    (threaded prefetch, C++ ragged batcher) feeding the jitted factual step
    at large batch, feature-cached.  Returns captions/sec through
    loader->step for a 4096-caption epoch.  NOTE: per-batch dispatches pay
    the relay's ~27 ms floor (8 batches/epoch at B=512), which a
    direct-attached TPU would not; the in-jit ``train_step_ms_b512`` figure
    isolates pure device throughput.  The metric is HOST-LOAD SENSITIVE —
    read it alongside ``host_cpu_ref_ms`` (the contention canary measured
    around the same run)."""
    import optax

    from icee_tpu.core.config import DecoderConfig, EncoderConfig, TrainConfig
    from icee_tpu.data.pipeline import caption_dataset_loader
    from icee_tpu.models import encoder as enc_mod
    from icee_tpu.models import factored_lstm as fl
    from icee_tpu.train.steps import make_caption_steps

    cfg = DecoderConfig(vocab_size=V, embed_size=E, hidden_size=H,
                        factored_size=F, dropout=0.0)
    tcfg = TrainConfig(teacher_forcing_ratio=1.0)
    opt = optax.adam(2e-4)
    fac_step, _, _ = make_caption_steps(cfg, tcfg, opt, opt, factored=True)

    rng = np.random.default_rng(0)
    examples, feats = _epoch_examples(rng)

    loader = caption_dataset_loader(
        examples, batch_size=EPOCH_B, max_len=TRAIN_T,
        image_provider=lambda n: feats[n], shuffle=True, seed=0, prefetch=4)

    dec = fl.init_params(jax.random.PRNGKey(0), cfg)
    head = enc_mod.init_head_params(
        jax.random.PRNGKey(1), EncoderConfig(embed_size=E))
    opt_state = opt.init((dec, head))
    key = jax.random.PRNGKey(0)

    def epoch():
        nonlocal dec, head, opt_state, key
        n = 0
        for b in loader:
            key, k = jax.random.split(key)
            dec, head, opt_state, loss = fac_step(
                dec, head, opt_state, jnp.asarray(b.images),
                jnp.asarray(b.captions), jnp.asarray(b.lengths),
                jnp.asarray(b.sample_mask), k)
            n += int(b.sample_mask.sum())
        jax.block_until_ready(loss)
        return n

    epoch()  # compile + warm
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        n = epoch()
        times.append(time.perf_counter() - t0)
    return n / float(np.median(times))


def bench_train_epoch_device(jax, jnp):
    """Device-resident whole-epoch training (``data/device.py`` +
    ``MultitaskTrainer._run_train_device``): the SAME 4096-caption epoch as
    ``bench_train_epoch`` but pinned in HBM and run as ONE jitted
    ``lax.scan`` dispatch per epoch (``icee-train --device_resident``) —
    captions/sec through the user-facing trainer.  The gap to
    ``train_epoch_captions_per_sec`` is the relay's per-batch dispatch cost
    that the device-resident formulation removes."""
    import tempfile

    from icee_tpu.core.config import DecoderConfig, EncoderConfig, TrainConfig
    from icee_tpu.data import device as device_data
    from icee_tpu.models import encoder as enc_mod
    from icee_tpu.models import factored_lstm as fl
    from icee_tpu.train.loops import MultitaskTrainer

    cfg = DecoderConfig(vocab_size=V, embed_size=E, hidden_size=H,
                        factored_size=F, dropout=0.0)
    tcfg = TrainConfig(teacher_forcing_ratio=1.0, log_step=10 ** 9)
    rng = np.random.default_rng(0)
    examples, feats = _epoch_examples(rng)
    ddata = device_data.from_examples(
        examples, batch_size=EPOCH_B, max_len=TRAIN_T,
        image_provider=lambda n: feats[n], shuffle=True, seed=0)

    dec = fl.init_params(jax.random.PRNGKey(0), cfg)
    head = enc_mod.init_head_params(
        jax.random.PRNGKey(1), EncoderConfig(embed_size=E))
    with tempfile.TemporaryDirectory(prefix="icee_bench_") as model_dir:
        trainer = MultitaskTrainer(
            cfg, tcfg, vocab=None, dec_params=dec, head_params=head,
            family="factored", sample_fn=lambda *a: [],
            model_dir=model_dir, data_name="bench")

        trainer._run_train(ddata, 0, 10 ** 9, "FAC")  # compile + warmup
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            trainer._run_train(ddata, 0, 10 ** 9, "FAC")
            times.append(time.perf_counter() - t0)
    return EPOCH_N / float(np.median(times))


def bench_train_epoch_streamed(jax, jnp):
    """Chunk-streamed whole-epoch training (``data/device.py::
    StreamedCaptionData`` + ``_run_train_streamed``, VERDICT r4 #3): the
    SAME 4096-caption epoch as the device-resident bench but with a feature
    budget that FORCES streaming (capacity 256 of 1024 unique images, so
    the epoch runs as fixed-capacity double-buffered chunks, the next
    buffer's host gather + device_put overlapping the current chunk's
    compute).  The gap to ``train_epoch_device_captions_per_sec`` is the
    streaming overhead; the gap to ``train_epoch_captions_per_sec`` is what
    streaming recovers over the per-batch host loader."""
    import tempfile

    from icee_tpu.core.config import DecoderConfig, EncoderConfig, TrainConfig
    from icee_tpu.data import device as device_data
    from icee_tpu.models import encoder as enc_mod
    from icee_tpu.models import factored_lstm as fl
    from icee_tpu.train.loops import MultitaskTrainer

    cfg = DecoderConfig(vocab_size=V, embed_size=E, hidden_size=H,
                        factored_size=F, dropout=0.0)
    tcfg = TrainConfig(teacher_forcing_ratio=1.0, log_step=10 ** 9)
    rng = np.random.default_rng(0)
    examples, feats = _epoch_examples(rng)
    per = 2048 * 4
    ddata = device_data.from_examples_streamed(
        examples, batch_size=EPOCH_B, max_len=TRAIN_T,
        image_provider=lambda n: feats[n], shuffle=True, seed=0,
        budget_bytes=2 * 256 * per)   # capacity 256 << 1024 unique: streams

    dec = fl.init_params(jax.random.PRNGKey(0), cfg)
    head = enc_mod.init_head_params(
        jax.random.PRNGKey(1), EncoderConfig(embed_size=E))
    with tempfile.TemporaryDirectory(prefix="icee_bench_") as model_dir:
        trainer = MultitaskTrainer(
            cfg, tcfg, vocab=None, dec_params=dec, head_params=head,
            family="factored", sample_fn=lambda *a: [],
            model_dir=model_dir, data_name="bench_stream")

        trainer._run_train(ddata, 0, 10 ** 9, "FAC")  # compile + warmup
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            trainer._run_train(ddata, 0, 10 ** 9, "FAC")
            times.append(time.perf_counter() - t0)
    return EPOCH_N / float(np.median(times))


SC_VOCAB, SC_BATCH = 8800, 128


def bench_senticap(jax, jnp, fused=None):
    """SentiCap base-mRNN train step at the reference COCO regime
    (``mrnn.py:30-111``: emb/hidden 512, visual 4096, batch 128, T=22,
    teacher-forced, RMSProp) over a device-resident dataset — returns
    ms/step, 16 in-jit steps per dispatch (``senticap/train.py``)."""
    from icee_tpu.senticap import model as sc_model
    from icee_tpu.senticap.config import senticap_conf
    from icee_tpu.senticap.solver import make_solver
    from icee_tpu.senticap.train import make_base_step

    conf = senticap_conf(emb_size=512, lstm_hidden_size=512)
    conf["FUSED_SCAN"] = fused
    t = conf["MAX_SENTENCE_LEN"] + 2
    params = sc_model.init_params(jax.random.PRNGKey(0), SC_VOCAB, conf)
    solver = make_solver(conf)
    opt_state = solver.init(params)
    step = make_base_step(conf, solver)

    rng = np.random.default_rng(0)
    n = SC_BATCH * 4
    data = {
        "X": jnp.asarray(rng.integers(2, SC_VOCAB, (n, t)), jnp.int32),
        "Y": jnp.asarray(rng.integers(2, SC_VOCAB, (n, t)), jnp.int32),
        "Xlen": jnp.asarray(
            (np.arange(t)[None, :] < rng.integers(5, t, (n, 1))), jnp.float32),
        "V": jnp.asarray(
            rng.standard_normal((n, conf["visual_size"])), jnp.float32),
    }
    idx = jnp.asarray(rng.integers(0, n, (16, SC_BATCH)), jnp.int32)
    key = jax.random.PRNGKey(0)

    @jax.jit
    def many(params, opt_state):
        def body(carry, ib):
            p, o = carry
            p, o, loss = step(p, o, data, ib, key)
            return (p, o), loss
        (_, _), losses = jax.lax.scan(body, (params, opt_state), idx)
        return losses[-1]

    np.asarray(many(params, opt_state))  # compile + warmup
    times = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        np.asarray(many(params, opt_state))
        times.append((time.perf_counter() - t0) / 16)
    return float(np.median(times)), times


def bench_senticap_switched(jax, jnp, fused=None):
    """SWITCHED SentiCap train step (the actual SentiCap method,
    ``mrnn_switched.py:780-890``) at the MTurk regime: double-LSTM
    recurrence, switch gate, LAMBDA_N/LAMBDA_GAM loss, RMSProp over the
    switch set — ms/step, 16 in-jit steps (VERDICT r2 weak #4)."""
    from icee_tpu.senticap import switched as sw_model
    from icee_tpu.senticap.config import senticap_conf
    from icee_tpu.senticap.solver import make_solver
    from icee_tpu.senticap.train import make_switched_step

    conf = senticap_conf(emb_size=512, lstm_hidden_size=512)
    conf["FUSED_SCAN"] = fused
    t = conf["MAX_SENTENCE_LEN"] + 2
    params = sw_model.init_params(jax.random.PRNGKey(0), SC_VOCAB, conf)
    solver = make_solver(conf, sw_model.switch_param_mask(params))
    opt_state = solver.init(params)
    step = make_switched_step(conf, solver)

    rng = np.random.default_rng(0)
    n = SC_BATCH * 4
    data = {
        "X": jnp.asarray(rng.integers(2, SC_VOCAB, (n, t)), jnp.int32),
        "Y": jnp.asarray(rng.integers(2, SC_VOCAB, (n, t)), jnp.int32),
        "Xlen": jnp.asarray(
            (np.arange(t)[None, :] < rng.integers(5, t, (n, 1))), jnp.float32),
        "V": jnp.asarray(
            rng.standard_normal((n, conf["visual_size"])), jnp.float32),
        "SW": jnp.asarray(rng.integers(0, 2, (n, t)), jnp.float32),
        "senti": jnp.ones((n,), jnp.float32),  # sentiment-pure batches
    }
    idx = jnp.asarray(rng.integers(0, n, (16, SC_BATCH)), jnp.int32)
    key = jax.random.PRNGKey(0)

    @jax.jit
    def many(params, opt_state):
        def body(carry, ib):
            p, o = carry
            p, o, loss = step(p, o, data, ib, key)
            return (p, o), loss
        (_, _), losses = jax.lax.scan(body, (params, opt_state), idx)
        return losses[-1]

    np.asarray(many(params, opt_state))  # compile + warmup
    times = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        np.asarray(many(params, opt_state))
        times.append((time.perf_counter() - t0) / 16)
    return float(np.median(times)), times


SC_DECODE_N = 64


def bench_senticap_decode(jax, jnp, mega=True):
    """SentiCap test-path decode throughput (beam 20, max len 20, base mRNN
    at the COCO regime), captions/sec over SC_DECODE_N images.

    ``mega=True``: the whole-search Pallas kernel
    (``ops/pallas_senticap_decode.py``, VERDICT r3 #2) — weights
    VMEM-resident across all steps.  ``mega=False``: the XLA comparator,
    the vmapped whole-search device beam
    (``senticap/beam.make_device_beam``).  The reference drives its
    compiled one_step per beam per token from Python
    (``mrnn_algorithms.py:159-209``)."""
    from icee_tpu.senticap import model as sc_model
    from icee_tpu.senticap.config import senticap_conf

    conf = senticap_conf(emb_size=512, lstm_hidden_size=512)
    params = sc_model.init_params(jax.random.PRNGKey(0), SC_VOCAB, conf)
    rng = np.random.default_rng(0)
    max_len = conf["MAX_SENTENCE_LEN"]

    if mega:
        from icee_tpu.ops.pallas_senticap_decode import (
            mega_senticap_beam_decode,
        )

        stack = jnp.asarray(
            rng.standard_normal((4, SC_DECODE_N, conf["visual_size"])),
            jnp.float32)
        # nib=32/ns=2 measured best on hardware across two sessions
        # (34.08 ms/64 imgs vs 37.71 at nib=8; re-sweep: 38.45 at ns=2 vs
        # 41.90 at nib=8, ns=4 within noise at 38.24 —
        # scripts/check_senticap_mega.py)
        many = jax.jit(lambda vs: jax.lax.map(
            lambda v: mega_senticap_beam_decode(
                params, v, SC_DECODE_N, beam_size=20, max_len=max_len,
                n_img_block=32, n_streams=2)[1], vs))
    else:
        from icee_tpu.senticap.beam import make_device_beam
        from icee_tpu.senticap.train import make_beam_step

        make = make_beam_step(params, conf, switched=False)
        dec = make_device_beam(make(-1.0), conf["lstm_hidden_size"],
                               beam_size=20, max_len=max_len)
        stack = jnp.asarray(
            rng.standard_normal((4, SC_DECODE_N, conf["visual_size"])),
            jnp.float32)
        many = jax.jit(lambda vs: jax.lax.map(
            lambda v: jax.vmap(dec.run)(v)[1], vs))

    np.asarray(many(stack))  # compile + warmup
    times = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        np.asarray(many(stack))
        times.append((time.perf_counter() - t0) / 4)
    return SC_DECODE_N / float(np.median(times)), times


def bench_senticap_switched_decode(jax, jnp, mega=True):
    """SWITCHED SentiCap test-path decode throughput — the reference's
    ACTUAL test workload (``run_load_gap_filler``,
    ``train_joint.py:170-173``: the two-LSTM gap-filler model with
    attention traces), captions/sec over SC_DECODE_N styled decodes.

    ``mega=True``: the whole-search switched kernel
    (``ops/pallas_senticap_switched_decode.py``, VERDICT r4 #1) — both
    weight sets VMEM-resident, gate mixture head, switch-gate trace.
    ``mega=False``: the XLA comparator (vmapped whole-search device beam
    with attention)."""
    from icee_tpu.senticap import model as sc_model
    from icee_tpu.senticap import switched as sw_scmodel
    from icee_tpu.senticap.config import senticap_conf

    conf = senticap_conf(emb_size=512, lstm_hidden_size=512)
    base = sc_model.init_params(jax.random.PRNGKey(0), SC_VOCAB, conf)
    params = sw_scmodel.init_params(jax.random.PRNGKey(1), SC_VOCAB, conf,
                                    base=base)
    k = jax.random.PRNGKey(2)
    for name in ("w_lstm_sw", "w_sw", "wemb_sw", "wvm_sw"):
        k, k2 = jax.random.split(k)
        params[name] = params[name] + 0.05 * jax.random.normal(
            k2, params[name].shape)
    rng = np.random.default_rng(0)
    max_len = conf["MAX_SENTENCE_LEN"]

    stack = jnp.asarray(
        rng.standard_normal((4, SC_DECODE_N, conf["visual_size"])),
        jnp.float32)
    if mega:
        from icee_tpu.ops.pallas_senticap_switched_decode import (
            mega_senticap_switched_decode,
        )

        many = jax.jit(lambda vs: jax.lax.map(
            lambda v: mega_senticap_switched_decode(
                params, v, SC_DECODE_N, beam_size=20, max_len=max_len,
                n_img_block=SC_SW_NIB, n_streams=SC_SW_NS)[1], vs))
    else:
        from icee_tpu.senticap.beam import make_device_beam
        from icee_tpu.senticap.train import make_beam_step

        make = make_beam_step(params, conf, switched=True)
        dec = make_device_beam(make(1.0), 2 * conf["lstm_hidden_size"],
                               beam_size=20, max_len=max_len,
                               with_attention=True)
        many = jax.jit(lambda vs: jax.lax.map(
            lambda v: jax.vmap(dec.run)(v)[1], vs))

    np.asarray(many(stack))  # compile + warmup
    times = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        np.asarray(many(stack))
        times.append((time.perf_counter() - t0) / 4)
    return SC_DECODE_N / float(np.median(times)), times


# switched-kernel block geometry (sweep: scripts/check_senticap_switched_mega
# — nib=16 best; nib>=24 exceeds VMEM with both weight sets resident; ns=1
# vs 2 within session noise after the combined-embedding merge)
SC_SW_NIB, SC_SW_NS = 16, 1

S2S_B = 64


def bench_seq2seq(jax, jnp):
    """Seq2Seq figures (VERDICT r2 weak #5): factual train step ms (B=64,
    T=25, teacher-forced autoencode + Adam) and batched greedy decode
    captions/sec (encoder rollout + emotion-decoder continuation, pure XLA
    scan — the model has no beam; ``seq2seq/model.py:285-301``)."""
    import optax

    from icee_tpu.core.config import Seq2SeqConfig, TrainConfig, EncoderConfig
    from icee_tpu.models import encoder as enc_mod
    from icee_tpu.models import seq2seq as s2s
    from icee_tpu.train.steps import make_seq2seq_steps

    cfg = Seq2SeqConfig(vocab_size=V, embed_size=E, hidden_size=H,
                        num_layers=1, dropout=0.0, max_seq_length=MAX_STEPS)
    tcfg = TrainConfig(teacher_forcing_ratio=1.0)
    opt = optax.adam(2e-4)
    fac_step, _, _, _ = make_seq2seq_steps(cfg, tcfg, opt, opt)

    params = s2s.init_params(jax.random.PRNGKey(0), cfg)
    head = enc_mod.init_head_params(
        jax.random.PRNGKey(1), EncoderConfig(embed_size=E))
    opt_state = opt.init((params["encoder"], head))
    rng = np.random.default_rng(0)
    pooled = jnp.asarray(rng.standard_normal((S2S_B, 2048)), jnp.float32)
    captions = jnp.asarray(rng.integers(4, V, (S2S_B, TRAIN_T)), jnp.int32)
    lengths = jnp.full((S2S_B,), TRAIN_T, jnp.int32)
    mask = jnp.ones((S2S_B,), bool)
    key = jax.random.PRNGKey(0)

    n_inner = 16

    @jax.jit
    def many(params, head, opt_state):
        def body(carry, _):
            p, h, o = carry
            p, h, o, loss = fac_step(p, h, o, pooled, captions, lengths,
                                     mask, key)
            return (p, h, o), loss
        (_, _, _), losses = jax.lax.scan(body, (params, head, opt_state),
                                         None, length=n_inner)
        return losses[-1]

    np.asarray(many(params, head, opt_state))
    step_times = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        np.asarray(many(params, head, opt_state))
        step_times.append((time.perf_counter() - t0) / n_inner)
    step_ms = float(np.median(step_times)) * 1e3

    # batched greedy decode: 8 in-jit batches via lax.map
    feats_emb, _ = enc_mod.encode_global_from_pooled(
        head, pooled, train=False)
    stack = jnp.broadcast_to(feats_emb, (8,) + feats_emb.shape)

    @jax.jit
    def decode_many(stack):
        return jax.lax.map(
            lambda f: s2s.greedy_sample(params, cfg, f, start_token=1,
                                        emotion=jnp.asarray(1)), stack)

    np.asarray(decode_many(stack))
    times = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        np.asarray(decode_many(stack))
        times.append((time.perf_counter() - t0) / 8)
    dec_cps = S2S_B / float(np.median(times))
    return step_ms, step_times, dec_cps


def _wait_for_backend(max_wait_s: float = 330.0) -> None:
    """Retry backend init with backoff for up to ~5.5 min (VERDICT r4 #2:
    BENCH_r04 was lost to ONE transient relay refusal at minute zero; the
    relay provably recovers on its own within minutes).  Raises only after
    the full window fails."""
    import jax
    import jax.numpy as jnp

    t0, attempt = time.time(), 0
    while True:
        attempt += 1
        try:
            jax.devices()
            np.asarray(jnp.ones((8, 8)) @ jnp.ones((8, 8)))
            return
        except Exception as e:
            waited = time.time() - t0
            if waited > max_wait_s:
                raise
            delay = min(10.0 * attempt, 60.0)
            print(f"# backend init failed (attempt {attempt}, "
                  f"{type(e).__name__}: {e}); retrying in {delay:.0f}s "
                  f"({waited:.0f}/{max_wait_s:.0f}s elapsed)", flush=True)
            time.sleep(delay)


PROGRESS_PATH = "bench_progress.json"


def _flush_progress(out: dict) -> None:
    """Atomically persist the metrics collected so far (VERDICT r4 #2b: a
    mid-run crash must preserve everything measured)."""
    import os

    tmp = PROGRESS_PATH + ".tmp"
    try:
        with open(tmp, "w") as f:
            json.dump(out, f)
        os.replace(tmp, PROGRESS_PATH)
    except OSError:
        pass


def main():
    import os
    import signal
    import jax
    import jax.numpy as jnp

    # soft wall-clock budget: the mega-kernel compile alone can take
    # ~15 min on the remote-compile service; once past the budget, the
    # remaining (secondary) metrics are skipped so the headline decode
    # number always reaches the final JSON line before any driver timeout
    budget_s = float(os.getenv("ICEE_BENCH_BUDGET_S", "3000"))
    t_start = time.time()

    def over_budget(label):
        if time.time() - t_start > budget_s:
            print(f"# skipping {label}: past the {budget_s:.0f}s soft budget")
            return True
        return False

    # the final JSON line always leads with the headline schema, populated
    # incrementally so a partial run still yields a valid record
    out = {"metric": "beam_decode_captions_per_sec", "value": None,
           "unit": "captions/sec/chip", "vs_baseline": None}
    _flush_progress(out)

    def die_with_partial(signum, frame):
        out["terminated_early"] = True
        _flush_progress(out)
        print(json.dumps(out), flush=True)
        os._exit(0)

    signal.signal(signal.SIGTERM, die_with_partial)

    _wait_for_backend()

    from icee_tpu.core.config import DecoderConfig
    from icee_tpu.models import factored_lstm as fl

    cfg = DecoderConfig(vocab_size=V, embed_size=E, hidden_size=H,
                        factored_size=F, max_seq_length=MAX_STEPS)
    dec = fl.init_params(jax.random.PRNGKey(0), cfg)
    # bf16 weights: MXU-native precision for the decode path
    dec = jax.tree_util.tree_map(lambda x: x.astype(jnp.bfloat16), dec)

    rng = np.random.default_rng(0)
    feats_stack = jnp.asarray(
        rng.standard_normal((PIPELINE, BATCH, K, E)), jnp.bfloat16)
    style = jnp.asarray(1)

    try:
        path, med, best, dec_times = bench_decode(jax, jnp, dec, feats_stack,
                                                  style)
        cps = BATCH / med
        out.update({
            "value": round(cps, 2),
            "vs_baseline": round(cps / TORCH_CPU_BASELINE_CPS, 2),
            "decode_path": path,
            "decode_ms": round(med * 1e3, 2),
            "decode_ms_best": round(best * 1e3, 2),
            "decode_ms_spread": _spread_ms(dec_times),
        })
    except Exception as e:
        print(f"# headline decode failed ({type(e).__name__}: {e}); "
              "continuing with secondary metrics")
        med = None
    _flush_progress(out)

    try:
        calib_tflops = bench_calibration(jax, jnp)
    except Exception as e:
        print(f"# calibration matmul failed ({type(e).__name__})")
        calib_tflops = None
    out["calib_matmul_tflops"] = (None if calib_tflops is None
                                  else round(calib_tflops, 1))
    # nominal = 165 TFLOP/s (84% of v5e bf16 peak), the calibration reading
    # in the round-2 session that set the reference decode numbers
    out["decode_ms_calibrated"] = (
        None if calib_tflops is None or med is None
        else round(med * 1e3 * calib_tflops / 165, 2))
    _flush_progress(out)

    def rec(**kw):
        out.update(kw)
        _flush_progress(out)

    # cheap (seconds-compile) metrics run BEFORE the attention mega kernel,
    # whose compile time varies 1-20 min on the remote-compile service —
    # under a tight driver timeout only the most expensive figure is lost
    train_fused_ms, train_fused_times = None, None
    if not over_budget("fused train"):
        try:
            tm, train_fused_times = bench_train(jax, jnp, fused_scan=True)
            train_fused_ms = tm * 1e3
        except Exception as e:
            print(f"# fused train scan unavailable ({type(e).__name__})")
    rec(train_step_ms_fused=(None if train_fused_ms is None
                             else round(train_fused_ms, 2)),
        train_step_ms_spread=(None if train_fused_times is None
                              else _spread_ms(train_fused_times)))
    train_xla_ms = None
    if not over_budget("xla train"):
        try:
            train_xla_ms = bench_train(jax, jnp, fused_scan=False)[0] * 1e3
        except Exception as e:
            print(f"# xla train step failed ({type(e).__name__})")
    rec(train_step_ms_xla=(None if train_xla_ms is None
                           else round(train_xla_ms, 2)))
    train_b512_ms = None
    if not over_budget("b512 train"):
        try:
            train_b512_ms = bench_train(jax, jnp, fused_scan=None,
                                        batch=512)[0] * 1e3
        except Exception as e:
            print(f"# b512 train step failed ({type(e).__name__})")
    rec(train_step_ms_b512=(None if train_b512_ms is None
                            else round(train_b512_ms, 2)),
        train_captions_per_sec_b512=(
            None if train_b512_ms is None
            else round(512 / (train_b512_ms / 1e3), 1)))
    epoch_cps, host_ref = None, None
    if not over_budget("epoch train"):
        try:
            ref_before = host_cpu_ref_ms()
            epoch_cps = bench_train_epoch(jax, jnp)
            host_ref = round(min(ref_before, host_cpu_ref_ms()), 1)
        except Exception as e:
            print(f"# epoch train failed ({type(e).__name__})")
    rec(train_epoch_captions_per_sec=(None if epoch_cps is None
                                      else round(epoch_cps, 1)),
        host_cpu_ref_ms=host_ref)
    epoch_dev_cps = None
    if not over_budget("device epoch train"):
        try:
            epoch_dev_cps = bench_train_epoch_device(jax, jnp)
        except Exception as e:
            print(f"# device epoch train failed ({type(e).__name__})")
    rec(train_epoch_device_captions_per_sec=(
        None if epoch_dev_cps is None else round(epoch_dev_cps, 1)))
    epoch_stream_cps = None
    if not over_budget("streamed epoch train"):
        try:
            epoch_stream_cps = bench_train_epoch_streamed(jax, jnp)
        except Exception as e:
            print(f"# streamed epoch train failed ({type(e).__name__})")
    rec(train_epoch_streamed_captions_per_sec=(
        None if epoch_stream_cps is None else round(epoch_stream_cps, 1)))
    att_train_ms, att_train_times, att_train_xla_ms = None, None, None
    if not over_budget("attention train"):
        # auto = the sampled whole-scan kernel at tf=0.8; if its hardware
        # compile fails, the XLA-scan retry keeps the metric alive
        try:
            tm, att_train_times = bench_att_train(jax, jnp)
            att_train_ms = tm * 1e3
        except Exception as e:
            print(f"# att-train fused failed ({type(e).__name__}); XLA retry")
            try:
                tm, att_train_times = bench_att_train(jax, jnp, fused=False)
                att_train_ms = tm * 1e3
            except Exception as e2:
                print(f"# attention train step failed ({type(e2).__name__})")
    if att_train_ms is not None and not over_budget("attention train xla"):
        # always-on XLA comparator (VERDICT r3 #3): the 16.65-vs-12.71
        # question answers itself when both paths sit in one JSON
        try:
            att_train_xla_ms = bench_att_train(jax, jnp,
                                               fused=False)[0] * 1e3
        except Exception as e:
            print(f"# attention train XLA comparator failed "
                  f"({type(e).__name__})")
    att_train_b512_ms = None
    if att_train_ms is not None and not over_budget("attention train b512"):
        # large-batch MFU figure (VERDICT r4 #5(b)): B=512 amortizes the
        # per-step fixed cost — 1.27x the per-image throughput on hardware
        try:
            att_train_b512_ms = bench_att_train(jax, jnp,
                                                batch=512)[0] * 1e3
        except Exception as e:
            print(f"# attention train b512 failed ({type(e).__name__})")
    rec(att_train_step_ms=(None if att_train_ms is None
                           else round(att_train_ms, 2)),
        att_train_step_ms_xla=(None if att_train_xla_ms is None
                               else round(att_train_xla_ms, 2)),
        att_train_step_ms_spread=(None if att_train_times is None
                                  else _spread_ms(att_train_times)),
        att_train_captions_per_sec=(
            None if att_train_ms is None
            else round(ATT_TRAIN_B / (att_train_ms / 1e3), 1)),
        att_train_b512_captions_per_sec=(
            None if att_train_b512_ms is None
            else round(512 / (att_train_b512_ms / 1e3), 1)))
    senticap_ms, senticap_times, senticap_xla_ms = None, None, None
    if not over_budget("senticap train"):
        # first try the whole-scan kernel (auto default); if its hardware
        # compile fails, fall back to the XLA scan so the metric survives
        try:
            tm, senticap_times = bench_senticap(jax, jnp)
            senticap_ms = tm * 1e3
        except Exception as e:
            print(f"# senticap fused failed ({type(e).__name__}); XLA retry")
            try:
                tm, senticap_times = bench_senticap(jax, jnp, fused=False)
                senticap_ms = tm * 1e3
            except Exception as e2:
                print(f"# senticap train step failed ({type(e2).__name__})")
    if senticap_ms is not None and not over_budget("senticap train xla"):
        try:
            senticap_xla_ms = bench_senticap(jax, jnp, fused=False)[0] * 1e3
        except Exception as e:
            print(f"# senticap XLA comparator failed ({type(e).__name__})")
    rec(senticap_train_step_ms=(None if senticap_ms is None
                                else round(senticap_ms, 2)),
        senticap_train_step_ms_xla=(None if senticap_xla_ms is None
                                    else round(senticap_xla_ms, 2)),
        senticap_train_step_ms_spread=(None if senticap_times is None
                                       else _spread_ms(senticap_times)))
    senticap_sw_ms, senticap_sw_times, senticap_sw_xla_ms = None, None, None
    if not over_budget("senticap switched train"):
        try:
            tm, senticap_sw_times = bench_senticap_switched(jax, jnp)
            senticap_sw_ms = tm * 1e3
        except Exception as e:
            print(f"# switched fused failed ({type(e).__name__}); XLA retry")
            try:
                tm, senticap_sw_times = bench_senticap_switched(
                    jax, jnp, fused=False)
                senticap_sw_ms = tm * 1e3
            except Exception as e2:
                print("# senticap switched step failed "
                      f"({type(e2).__name__})")
    if senticap_sw_ms is not None and not over_budget("switched xla"):
        try:
            senticap_sw_xla_ms = bench_senticap_switched(
                jax, jnp, fused=False)[0] * 1e3
        except Exception as e:
            print(f"# switched XLA comparator failed ({type(e).__name__})")
    rec(senticap_switched_step_ms=(None if senticap_sw_ms is None
                                   else round(senticap_sw_ms, 2)),
        senticap_switched_step_ms_xla=(None if senticap_sw_xla_ms is None
                                       else round(senticap_sw_xla_ms, 2)),
        senticap_switched_step_ms_spread=(
            None if senticap_sw_times is None
            else _spread_ms(senticap_sw_times)))
    senticap_dec_cps, senticap_dec_times = None, None
    senticap_dec_xla_cps = None
    if not over_budget("senticap decode"):
        # the mega kernel (ops/pallas_senticap_decode.py) is primary; the
        # XLA device beam falls in as the metric if the kernel fails
        try:
            senticap_dec_cps, senticap_dec_times = bench_senticap_decode(
                jax, jnp, mega=True)
        except Exception as e:
            print(f"# senticap mega decode failed ({type(e).__name__}); "
                  "XLA device-beam fallback")
            try:
                senticap_dec_cps, senticap_dec_times = bench_senticap_decode(
                    jax, jnp, mega=False)
            except Exception as e2:
                print(f"# senticap decode failed ({type(e2).__name__})")
    if senticap_dec_cps is not None and not over_budget(
            "senticap decode xla comparator"):
        try:
            senticap_dec_xla_cps = bench_senticap_decode(
                jax, jnp, mega=False)[0]
        except Exception as e:
            print(f"# senticap decode XLA comparator failed "
                  f"({type(e).__name__})")
    rec(senticap_decode_captions_per_sec=(
            None if senticap_dec_cps is None
            else round(senticap_dec_cps, 1)),
        senticap_decode_captions_per_sec_xla=(
            None if senticap_dec_xla_cps is None
            else round(senticap_dec_xla_cps, 1)),
        senticap_decode_ms_spread=(
            None if senticap_dec_times is None
            else _spread_ms(senticap_dec_times)))
    # the reference's REAL test workload: the switched gap-filler decode
    # with attention traces (train_joint.py:170-173; VERDICT r4 #1)
    sc_sw_dec_cps, sc_sw_dec_times, sc_sw_dec_xla_cps = None, None, None
    if not over_budget("senticap switched decode"):
        try:
            sc_sw_dec_cps, sc_sw_dec_times = bench_senticap_switched_decode(
                jax, jnp, mega=True)
        except Exception as e:
            print(f"# switched mega decode failed ({type(e).__name__}); "
                  "XLA device-beam fallback")
            try:
                sc_sw_dec_cps, sc_sw_dec_times = (
                    bench_senticap_switched_decode(jax, jnp, mega=False))
            except Exception as e2:
                print(f"# switched decode failed ({type(e2).__name__})")
    if sc_sw_dec_cps is not None and not over_budget(
            "senticap switched decode xla comparator"):
        try:
            sc_sw_dec_xla_cps = bench_senticap_switched_decode(
                jax, jnp, mega=False)[0]
        except Exception as e:
            print(f"# switched decode XLA comparator failed "
                  f"({type(e).__name__})")
    rec(senticap_switched_decode_captions_per_sec=(
            None if sc_sw_dec_cps is None else round(sc_sw_dec_cps, 1)),
        senticap_switched_decode_captions_per_sec_xla=(
            None if sc_sw_dec_xla_cps is None
            else round(sc_sw_dec_xla_cps, 1)),
        senticap_switched_decode_ms_spread=(
            None if sc_sw_dec_times is None
            else _spread_ms(sc_sw_dec_times)))
    s2s_step_ms = s2s_dec_cps = s2s_step_times = None
    if not over_budget("seq2seq"):
        try:
            s2s_step_ms, s2s_step_times, s2s_dec_cps = bench_seq2seq(jax, jnp)
        except Exception as e:
            print(f"# seq2seq bench failed ({type(e).__name__})")
    rec(seq2seq_train_step_ms=(None if s2s_step_ms is None
                               else round(s2s_step_ms, 2)),
        seq2seq_train_step_ms_spread=(None if s2s_step_times is None
                                      else _spread_ms(s2s_step_times)),
        seq2seq_decode_captions_per_sec=(
            None if s2s_dec_cps is None else round(s2s_dec_cps, 1)))

    backbone_ips = None
    if not over_budget("backbone"):
        try:
            backbone_ips = bench_backbone(jax, jnp)
        except Exception as e:
            print(f"# backbone bench failed ({type(e).__name__})")
    rec(backbone_bf16_img_per_sec=(None if backbone_ips is None
                                   else round(backbone_ips, 1)))

    att_cps, att_dec_times = None, None
    if not over_budget("attention decode"):
        try:
            att_med, att_dec_times = bench_att_decode(jax, jnp)
            att_cps = ATT_BATCH / att_med
        except Exception as e:
            print(f"# attention mega decode unavailable ({type(e).__name__})")
    rec(att_decode_captions_per_sec=(None if att_cps is None
                                     else round(att_cps, 2)),
        att_decode_ms_spread=(None if att_dec_times is None
                              else _spread_ms(att_dec_times)))

    print(json.dumps(out))


def run_with_recovery(body=None) -> int:
    """Run the bench; on a crash after ANY metric landed, emit whatever
    ``bench_progress.json`` collected and return 0 (VERDICT r4 #2c: one
    transient failure must not lose the round's record).  Returns the
    process exit code."""
    import traceback

    try:
        (body or main)()
        return 0
    except Exception as e:
        traceback.print_exc()
        try:
            with open(PROGRESS_PATH) as f:
                partial = json.load(f)
        except (OSError, ValueError):
            partial = None
        if partial is not None and any(
                v is not None for k, v in partial.items()
                if k not in ("metric", "unit")):
            partial["crashed"] = f"{type(e).__name__}: {e}"
            print(json.dumps(partial))
            return 0
        return 1


if __name__ == "__main__":
    raise SystemExit(run_with_recovery())
