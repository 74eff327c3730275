"""Regression tests for the round-1 code-review findings."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from icee_tpu.core.config import DecoderConfig, EncoderConfig, TrainConfig


def test_trainer_full_resume_roundtrip(tmp_path, tiny_vocab):
    """MultitaskTrainer.restore must bring back params, both optimizer
    states (incl. decayed LR), epoch and plateau counters."""
    from icee_tpu.models import encoder as enc_mod
    from icee_tpu.models import factored_lstm as fl
    from icee_tpu.train import optim
    from icee_tpu.train.loops import MultitaskTrainer

    cfg = DecoderConfig(vocab_size=len(tiny_vocab), embed_size=8,
                        hidden_size=12, factored_size=12, dropout=0.0)
    tcfg = TrainConfig(mode="sad", max_caption_len=10)

    def make():
        return MultitaskTrainer(
            cfg, tcfg, tiny_vocab,
            fl.init_params(jax.random.PRNGKey(0), cfg),
            enc_mod.init_head_params(jax.random.PRNGKey(1),
                                     EncoderConfig(embed_size=8)),
            model_dir=str(tmp_path), data_name="resume")

    t1 = make()
    t1.dec["B"] = t1.dec["B"] + 1.25  # make params distinguishable
    optim.decay_lr(t1.opt_state, 0.8)
    t1.epochs_since_improvement = {"factual": 3, "emotion": 1}
    t1.best_bleu4 = {"factual": 0.31, "emotion": 0.07}
    t1.save(epoch=5, is_best=False)

    t2 = make()
    t2.restore(os.path.join(tmp_path, "SAD_checkpoint_resume"))
    np.testing.assert_allclose(np.asarray(t2.dec["B"]),
                               np.asarray(t1.dec["B"]))
    assert t2.start_epoch == 6
    assert t2.epochs_since_improvement == {"factual": 3, "emotion": 1}
    assert abs(t2.best_bleu4["factual"] - 0.31) < 1e-6
    assert abs(optim.get_lr(t2.opt_state) - 2e-4 * 0.8) < 1e-9


def test_engine_loads_distinct_checkpoints_per_mode(tmp_path, tiny_vocab):
    """Review finding: the engine must honor the reference's per-(variant,
    mode) checkpoint registry, not collapse to one checkpoint."""
    from icee_tpu.checkpoint.ckpt import CheckpointState, save_checkpoint
    from icee_tpu.core.config import AttentionDecoderConfig
    from icee_tpu.models import encoder as enc_mod
    from icee_tpu.models import factored_lstm as fl
    from icee_tpu.serve.config import ServeConfig
    from icee_tpu.serve.engine import CaptionEngine

    cfg = DecoderConfig(vocab_size=len(tiny_vocab), embed_size=8,
                        hidden_size=12, factored_size=12)
    head = enc_mod.init_head_params(jax.random.PRNGKey(9),
                                    EncoderConfig(embed_size=8))

    paths = {}
    for i, mode in enumerate(["factual", "happy"]):
        dec = fl.init_params(jax.random.PRNGKey(i), cfg)
        state = CheckpointState(
            epoch=0, epochs_since_improvement={}, best_bleu4={},
            params={"decoder": dec, "head": head}, opt_states={})
        paths[mode] = save_checkpoint(str(tmp_path), f"m{i}", "X", state,
                                      False)

    tiny_vocab.save(str(tmp_path / "vocab.pkl"))
    sc = ServeConfig(vocab_path=str(tmp_path / "vocab.pkl"))
    sc.checkpoint_paths["stylenet"]["factual"] = paths["factual"]
    sc.checkpoint_paths["stylenet"]["happy"] = paths["happy"]
    engine = CaptionEngine(
        sc, smoke_mode=False, image_size=32,
        dec_cfg=cfg,
        att_cfg=AttentionDecoderConfig(vocab_size=len(tiny_vocab),
                                       embed_size=8, hidden_size=12,
                                       factored_size=12, attention_size=8),
        enc_cfg=EncoderConfig(embed_size=8))

    assert "stylenet" in engine.models
    modes = engine.models["stylenet"]
    assert set(modes) == {"factual", "happy"}  # sad/angry unconfigured
    b_fac = np.asarray(modes["factual"]["decoder"]["B"])
    b_hap = np.asarray(modes["happy"]["decoder"]["B"])
    assert not np.allclose(b_fac, b_hap)


def test_train_augment_reaches_all_offsets_and_nonsquare(rng):
    """Review finding: crop offsets must cover [0, dim-crop] inclusive and
    use per-axis bounds (torchvision RandomCrop semantics)."""
    from icee_tpu.data.transforms import train_augment

    h, w, crop = 12, 20, 8
    img = np.zeros((1, h, w, 3), np.uint8)
    # mark the bottom-right crop region so only offset (4, 12) sees value 255
    img[0, h - 1, w - 1, :] = 255
    seen_max_y = seen_max_x = False
    for i in range(200):
        out = train_augment(jnp.asarray(img), jax.random.PRNGKey(i),
                            crop_size=crop)
        # the bottom-right pixel is visible iff off_y==4 and off_x==12
        if float(out[0].max()) > 1.0:
            seen_max_y = seen_max_x = True
            break
    assert seen_max_y and seen_max_x, \
        "maximal crop offsets never sampled (off-by-one or wrong axis bound)"


def test_senticap_sentiment_homogeneous_batches(rng):
    from icee_tpu.senticap.train import _epoch_indices_by_sentiment

    senti = np.asarray([1.0] * 10 + [-1.0] * 14)
    batches = _epoch_indices_by_sentiment(senti, 4, np.random.default_rng(0))
    assert len(batches) == 2 + 3  # 10//4 + 14//4
    for b in batches:
        vals = senti[b]
        assert np.all(vals == vals[0]), "mixed-sentiment batch"


def test_seq2seq_emotion_sample_continues_from_encoder_state(rng):
    """After the de-duplication refactor the emotion rollout must still be
    conditioned on the image (different features -> different captions)."""
    from icee_tpu.core.config import Seq2SeqConfig
    from icee_tpu.models import seq2seq as s2s

    cfg = Seq2SeqConfig(vocab_size=30, embed_size=10, hidden_size=12,
                        num_layers=1, dropout=0.0, max_seq_length=6)
    params = s2s.init_params(jax.random.PRNGKey(0), cfg)
    f1 = jnp.asarray(rng.standard_normal((1, 10)).astype(np.float32))
    f2 = jnp.asarray(rng.standard_normal((1, 10)).astype(np.float32))
    a = s2s.greedy_sample(params, cfg, f1, start_token=1, emotion=1)
    b = s2s.greedy_sample(params, cfg, f2, start_token=1, emotion=1)
    assert a.shape == (1, 6)
    assert not np.array_equal(np.asarray(a), np.asarray(b))


def test_nic_transfer_masks_to_cell_only(tmp_path, tiny_vocab):
    """NIC transfer fine-tune optimizes only the LSTM cell
    (nic/train_transfer.py:92-96)."""
    import jax.numpy as jnp

    from icee_tpu.data.pipeline import make_batch
    from icee_tpu.models import encoder as enc_mod
    from icee_tpu.models import lstm as nic_mod
    from icee_tpu.train.loops import TransferTrainer

    cfg = DecoderConfig(vocab_size=len(tiny_vocab), embed_size=8,
                        hidden_size=12, factored_size=12, dropout=0.0,
                        factored=False)
    tcfg = TrainConfig(mode="happy", lr_language=1e-2,
                       teacher_forcing_ratio=1.0)
    trainer = TransferTrainer(
        cfg, tcfg, tiny_vocab,
        nic_mod.init_params(jax.random.PRNGKey(0), cfg),
        enc_mod.init_head_params(jax.random.PRNGKey(1),
                                 EncoderConfig(embed_size=8,
                                               feature_size=10)),
        family="nic", model_dir=str(tmp_path), data_name="nic_t")

    rng = np.random.default_rng(0)
    batch = make_batch([[1, 4, 5, 2], [1, 6, 2]], max_len=8, batch_size=2)
    pooled = jnp.asarray(rng.standard_normal((2, 10)).astype(np.float32))
    emb_before = np.asarray(trainer.dec["embed"]).copy()
    cell_before = np.asarray(trainer.dec["cell"]["W_ih"]).copy()
    head_before = np.asarray(trainer.head["linear_w"]).copy()

    trainer.dec, trainer.head, trainer.lang_opt_state, loss = \
        trainer.emotion_step(
            trainer.dec, trainer.head, trainer.lang_opt_state, pooled,
            jnp.asarray(batch.captions), jnp.asarray(batch.lengths),
            jnp.asarray(batch.sample_mask), jnp.asarray(1),
            jax.random.PRNGKey(0))

    np.testing.assert_array_equal(np.asarray(trainer.dec["embed"]),
                                  emb_before)
    np.testing.assert_array_equal(np.asarray(trainer.head["linear_w"]),
                                  head_before)
    assert not np.allclose(np.asarray(trainer.dec["cell"]["W_ih"]),
                           cell_before)
