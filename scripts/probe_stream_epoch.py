"""Hardware probe: chunk-streamed device epoch vs host loader vs pinned
(attention family, TPU).

The motivating workload for ``data/device.StreamedCaptionData``: a spatial-
attention split whose (U, 196, 2048) features exceed the HBM pin budget.
The probe builds a synthetic split that DOES fit (so the pinned epoch can be
measured as the ceiling), then forces streaming with a small budget and
compares three epochs through the same user-facing trainer
(``MultitaskTrainer._run_train``):

  host    : per-batch host loader (2 dispatches + a float(loss) sync/batch)
  stream  : fixed-capacity feature chunks, R batch rows per dispatch,
            next buffer's gather+transfer overlapping the current compute
  pinned  : whole split in HBM, ONE dispatch per epoch (ceiling)

Usage: python scripts/probe_stream_epoch.py  [ICEE_PROBE_U=768]

Knobs (env): ICEE_PROBE_U unique images (design point: 6000 ≈ full
Flickr8k train-split scale, 9.2 GiB of (196,2048) f32 features on a
16 GiB chip); ICEE_PROBE_REFS captions/image; ICEE_PROBE_REPS timed
epochs per kind (the host epoch at U=6000 runs minutes — 1 is enough);
ICEE_PROBE_KINDS comma-list subset of host,stream,pinned.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

V, T, E, H, A = 8192, 20, 300, 512, 512
P, FEAT = 196, 2048
U = int(os.environ.get("ICEE_PROBE_U", "768"))   # unique images
REFS = int(os.environ.get("ICEE_PROBE_REFS", "2"))  # captions per image
REPS = int(os.environ.get("ICEE_PROBE_REPS", "2"))  # timed epochs/kind
KINDS = os.environ.get("ICEE_PROBE_KINDS", "host,stream,pinned").split(",")
B = 128
CAP_FEATURES = int(os.environ.get("ICEE_PROBE_CAP", "512"))  # buffer rows


def main():
    import jax
    import tempfile

    from icee_tpu.core.config import AttentionDecoderConfig, TrainConfig
    from icee_tpu.data import device as device_data
    from icee_tpu.data.captions import CaptionExample
    from icee_tpu.data.pipeline import caption_dataset_loader
    from icee_tpu.models import attention as att_mod
    from icee_tpu.train.loops import MultitaskTrainer

    rng = np.random.default_rng(0)
    feats = rng.standard_normal((U, P, FEAT)).astype(np.float32)
    per = feats[0].nbytes
    print(f"split: {U} unique images x {per / 2**20:.1f} MB = "
          f"{U * per / 2**30:.2f} GiB features, {U * REFS} captions")
    examples = []
    for u in range(U):
        for r in range(REFS):
            ids = [1] + rng.integers(4, V, (T - 4,)).tolist() + [2]
            examples.append(CaptionExample(image=f"i{u}.jpg",
                                           caption_ids=ids,
                                           all_caption_ids=[ids]))
    provider = lambda n: feats[int(n[1:].split(".")[0])]  # noqa: E731

    cfg = AttentionDecoderConfig(
        vocab_size=V, embed_size=E, hidden_size=H, factored_size=H,
        attention_size=A, feature_size=FEAT, dropout=0.0, max_seq_length=T)
    tcfg = TrainConfig(teacher_forcing_ratio=1.0, log_step=10 ** 9)
    dec = att_mod.init_factored_att_params(jax.random.PRNGKey(0), cfg)

    def mk_src(kind):
        if kind == "host":
            return caption_dataset_loader(
                examples, batch_size=B, max_len=T, image_provider=provider,
                shuffle=True, seed=0)
        if kind == "stream":
            sd = device_data.from_examples_streamed(
                examples, batch_size=B, max_len=T, image_provider=provider,
                shuffle=True, seed=0, budget_bytes=3 * CAP_FEATURES * per)
            print(f"stream: capacity {sd.capacity} features "
                  f"({sd.capacity * per / 2**30:.2f} GiB/buffer), "
                  f"{sd.rows_per_chunk} rows/chunk, "
                  f"{-(-len(sd) // sd.rows_per_chunk)} dispatches/epoch")
            return sd
        # "pinned" = whole-epoch scan (program needs ~2x feature bytes);
        # "pinned_pb" = the per-batch tier (features resident, no scan,
        # no copy — pin_plan's middle tier, round 5); ICEE_PROBE_FDT=bf16
        # stores features in bfloat16 (halves every wall)
        fdt = None
        if os.environ.get("ICEE_PROBE_FDT", "") == "bf16":
            import ml_dtypes

            fdt = ml_dtypes.bfloat16
        return device_data.from_examples(
            examples, batch_size=B, max_len=T, image_provider=provider,
            shuffle=True, seed=0, per_batch=(kind == "pinned_pb"),
            feature_dtype=fdt)

    n_caps = len(examples)
    with tempfile.TemporaryDirectory(prefix="icee_probe_") as model_dir:
        for kind in KINDS:
            src = mk_src(kind)
            tr = MultitaskTrainer(
                cfg, tcfg, vocab=None, dec_params=dec, head_params=None,
                family="factored_att", sample_fn=lambda *a: [],
                model_dir=model_dir, data_name=f"probe_{kind}")
            t0 = time.perf_counter()
            st = tr._run_train(src, 0, 10 ** 9, "FAC")
            print(f"{kind:7s} compile+epoch0 {time.perf_counter() - t0:.1f}s"
                  f"  loss {st.loss:.4f}", flush=True)
            times = []
            for _ in range(REPS):
                t0 = time.perf_counter()
                tr._run_train(src, 0, 10 ** 9, "FAC")
                times.append(time.perf_counter() - t0)
            sec = float(np.median(times))
            print(f"{kind:7s} epoch {sec:6.2f}s = {n_caps / sec:8.1f} "
                  "captions/s", flush=True)


if __name__ == "__main__":
    main()
