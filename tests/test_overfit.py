"""Functional learning proof: the full multitask pipeline must OVERFIT a
4-image corpus until beam decode reproduces every training caption EXACTLY —
the strongest end-to-end correctness check available without real data.

Note on validation BLEU: the reference's val path runs the decoder with
``teacher_forcing_ratio=0``, whose free-running rollout never consumes the
image feature OR the ground truth (``stylenet/model.py:180-191``: step-0
input is ``embed(<start>)``) — every image in a batch gets the identical
hypothesis, so val BLEU is a degenerate metric *by reference construction*
and cannot reach 1 even on a memorized corpus.  We reproduce that quirk
faithfully; the image-conditioned signal lives in the BEAM decode (serving
semantics feed the feature at step 1), which is what this test asserts on.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from icee_tpu.core.config import DecoderConfig, EncoderConfig, TrainConfig
from icee_tpu.data import build_vocab, load_caption_dataset
from icee_tpu.data.pipeline import caption_dataset_loader
from icee_tpu.models import encoder as enc_mod
from icee_tpu.models import factored_lstm as fl
from icee_tpu.train.loops import MultitaskTrainer

CORPUS = (
    "i1.jpg#0\tseorang anak bermain bola di lapangan\n"
    "i2.jpg#0\tseekor anjing coklat berlari cepat\n"
    "i3.jpg#0\tdua orang tua duduk di bangku\n"
    "i4.jpg#0\tseorang wanita muda membaca buku\n"
)

FEAT = 16


def test_multitask_overfits_to_exact_beam_reproduction(tmp_path):
    (tmp_path / "train.txt").write_text(CORPUS)
    vocab = build_vocab(str(tmp_path / "train.txt"), threshold=1)
    ds = load_caption_dataset(str(tmp_path / "train.txt"), vocab)

    rng = np.random.default_rng(0)
    feats = {e.image: rng.standard_normal((FEAT,)).astype(np.float32)
             for e in ds}

    def loader():
        return caption_dataset_loader(
            ds, batch_size=4, max_len=12,
            image_provider=lambda n: feats[n], shuffle=True, seed=0,
            prefetch=0)

    cfg = DecoderConfig(vocab_size=len(vocab), embed_size=32, hidden_size=48,
                        factored_size=48, dropout=0.0, max_seq_length=10)
    tcfg = TrainConfig(mode="happy", lr_caption=5e-3,
                       teacher_forcing_ratio=0.8, log_step=10_000)
    trainer = MultitaskTrainer(
        cfg, tcfg, vocab,
        fl.init_params(jax.random.PRNGKey(0), cfg),
        enc_mod.init_head_params(jax.random.PRNGKey(1),
                                 EncoderConfig(embed_size=32,
                                               feature_size=FEAT)),
        model_dir=str(tmp_path / "m"), data_name="overfit")

    last = None
    for _ in range(300):
        last = trainer._run_train(loader(), 0, 10_000, "FAC")
    assert last.loss < 0.05, f"train loss stuck at {last.loss}"

    # beam decode (feature at step 1) must reproduce each caption exactly
    for e in ds:
        words = trainer._default_sample_fn(
            trainer.dec, trainer.head,
            jnp.asarray(feats[e.image])[None, :], 0)
        got = " ".join(w for w in words if w not in ("<start>", "<end>"))
        want = " ".join(vocab.idx2word[i] for i in e.caption_ids[1:-1])
        assert got == want, f"{e.image}: {got!r} != {want!r}"
