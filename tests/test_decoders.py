"""Decoder forward semantics: teacher forcing, feature prepend, free-running
feedback, attention plumbing, seq2seq routing."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from icee_tpu.core.config import (
    AttentionDecoderConfig,
    DecoderConfig,
    Seq2SeqConfig,
)
from icee_tpu.models import attention as att_mod
from icee_tpu.models import factored_lstm as fl
from icee_tpu.models import lstm as nic
from icee_tpu.models import seq2seq as s2s
from icee_tpu.ops.cells import factored_lstm_cell

CFG = DecoderConfig(vocab_size=30, embed_size=12, hidden_size=16,
                    factored_size=16, dropout=0.0)


def test_factored_forward_teacher_forced_matches_manual_loop(rng):
    params = fl.init_params(jax.random.PRNGKey(0), CFG)
    b, t = 3, 6
    captions = jnp.asarray(rng.integers(0, 30, (b, t)), jnp.int32)
    features = jnp.asarray(rng.standard_normal((b, 12)).astype(np.float32))
    logits = fl.forward(params, CFG, captions, features, style=0,
                        teacher_forcing_ratio=1.0, train=False)
    assert logits.shape == (b, t, 30)

    # manual loop: step0 input = feature, step t input = emb(caption[t-1])
    h = jnp.zeros((b, 16)); c = jnp.zeros((b, 16))
    for step in range(t):
        x = features if step == 0 else fl.embed(params, captions[:, step - 1])
        h, c = factored_lstm_cell(params, x, h, c, jnp.asarray(0))
        ref = fl.output_logits(params, h)
        np.testing.assert_allclose(np.asarray(logits[:, step]), np.asarray(ref),
                                   rtol=1e-5, atol=1e-5)


def test_factored_forward_free_running_feedback(rng):
    """ratio=0: step t>=1 consumes the argmax of step t-1's logits
    (the reference's scheduled-sampling free path, model.py:183-191)."""
    params = fl.init_params(jax.random.PRNGKey(1), CFG)
    b, t = 2, 5
    captions = jnp.asarray(rng.integers(0, 30, (b, t)), jnp.int32)
    features = jnp.asarray(rng.standard_normal((b, 12)).astype(np.float32))
    logits = fl.forward(params, CFG, captions, features, style=2,
                        teacher_forcing_ratio=0.0, train=False)
    h = jnp.zeros((b, 16)); c = jnp.zeros((b, 16))
    prev = captions[:, 0]
    for step in range(t):
        x = fl.embed(params, prev)  # free path ignores features entirely at t=0
        h, c = factored_lstm_cell(params, x, h, c, jnp.asarray(2))
        ref = fl.output_logits(params, h)
        np.testing.assert_allclose(np.asarray(logits[:, step]), np.asarray(ref),
                                   rtol=1e-5, atol=1e-5)
        prev = jnp.argmax(ref, axis=-1)


def test_factored_forward_text_only_no_features(rng):
    params = fl.init_params(jax.random.PRNGKey(2), CFG)
    captions = jnp.asarray(rng.integers(0, 30, (2, 4)), jnp.int32)
    logits = fl.forward(params, CFG, captions, None, style=1,
                        teacher_forcing_ratio=1.0, train=False)
    assert logits.shape == (2, 4, 30)


def test_style_param_mask_covers_only_style_tensors():
    params = fl.init_params(jax.random.PRNGKey(0), CFG)
    mask = fl.style_param_mask(params)
    assert mask["S_w"] and mask["S_b"] and mask["C_w"] and mask["C_b"]
    assert not mask["B"] and not mask["V_w"] and not mask["U_w"]


def test_nic_forward_shapes_and_determinism(rng):
    cfg = DecoderConfig(vocab_size=25, embed_size=10, hidden_size=12, dropout=0.0,
                        factored=False)
    params = nic.init_params(jax.random.PRNGKey(0), cfg)
    captions = jnp.asarray(rng.integers(0, 25, (4, 7)), jnp.int32)
    features = jnp.asarray(rng.standard_normal((4, 10)).astype(np.float32))
    l1 = nic.forward(params, cfg, captions, features, 1.0, train=False)
    l2 = nic.forward(params, cfg, captions, features, 1.0, train=False)
    np.testing.assert_array_equal(np.asarray(l1), np.asarray(l2))
    assert l1.shape == (4, 7, 25)


def test_attention_matches_torch_module(rng):
    import torch

    enc_d, dec_d, att_d, b, p = 8, 6, 5, 3, 7

    class TorchAttention(torch.nn.Module):
        # torch transcription of the reference Attention (model_att.py:32-70)
        def __init__(self):
            super().__init__()
            self.encoder_att = torch.nn.Linear(enc_d, att_d)
            self.decoder_att = torch.nn.Linear(dec_d, att_d)
            self.full_att = torch.nn.Linear(att_d, 1)

        def forward(self, enc, h):
            a1 = self.encoder_att(enc)
            a2 = self.decoder_att(h)
            e = self.full_att(torch.relu(a1 + a2.unsqueeze(1))).squeeze(2)
            alpha = torch.softmax(e, dim=1)
            ctx = (enc * alpha.unsqueeze(2)).sum(dim=1)
            return ctx, alpha

    tm = TorchAttention()
    att = {
        "enc_w": jnp.asarray(tm.encoder_att.weight.detach().numpy().T),
        "enc_b": jnp.asarray(tm.encoder_att.bias.detach().numpy()),
        "dec_w": jnp.asarray(tm.decoder_att.weight.detach().numpy().T),
        "dec_b": jnp.asarray(tm.decoder_att.bias.detach().numpy()),
        "full_w": jnp.asarray(tm.full_att.weight.detach().numpy().T),
        "full_b": jnp.asarray(tm.full_att.bias.detach().numpy()),
    }
    enc = rng.standard_normal((b, p, enc_d)).astype(np.float32)
    h = rng.standard_normal((b, dec_d)).astype(np.float32)
    with torch.no_grad():
        ctx_t, alpha_t = tm(torch.tensor(enc), torch.tensor(h))
    ctx_j, alpha_j = att_mod.attend(att, jnp.asarray(enc), jnp.asarray(h))
    np.testing.assert_allclose(np.asarray(ctx_j), ctx_t.numpy(), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(alpha_j), alpha_t.numpy(), rtol=1e-5,
                               atol=1e-6)


def test_factored_att_forward_shapes(rng):
    cfg = AttentionDecoderConfig(vocab_size=20, embed_size=8, hidden_size=12,
                                 factored_size=12, attention_size=10,
                                 feature_size=16, dropout=0.0)
    params = att_mod.init_factored_att_params(jax.random.PRNGKey(0), cfg)
    captions = jnp.asarray(rng.integers(0, 20, (2, 5)), jnp.int32)
    feats = jnp.asarray(rng.standard_normal((2, 9, 16)).astype(np.float32))
    logits, alphas = att_mod.factored_att_forward(
        params, cfg, captions, feats, style=3, teacher_forcing_ratio=1.0,
        train=False)
    assert logits.shape == (2, 5, 20)
    assert alphas.shape == (2, 5, 9)
    # attention weights sum to one over pixels
    np.testing.assert_allclose(np.asarray(alphas.sum(-1)), 1.0, rtol=1e-5)
    # different styles use different attention nets + S factors
    logits2, _ = att_mod.factored_att_forward(
        params, cfg, captions, feats, style=1, teacher_forcing_ratio=1.0,
        train=False)
    assert not np.allclose(np.asarray(logits), np.asarray(logits2))


def test_rnn_att_forward_shapes(rng):
    cfg = AttentionDecoderConfig(vocab_size=20, embed_size=8, hidden_size=12,
                                 attention_size=10, feature_size=16, dropout=0.0,
                                 factored=False)
    params = att_mod.init_rnn_att_params(jax.random.PRNGKey(0), cfg)
    captions = jnp.asarray(rng.integers(0, 20, (2, 5)), jnp.int32)
    feats = jnp.asarray(rng.standard_normal((2, 9, 16)).astype(np.float32))
    logits, alphas = att_mod.rnn_att_forward(params, cfg, captions, feats,
                                             1.0, train=False)
    assert logits.shape == (2, 5, 20) and alphas.shape == (2, 5, 9)


def test_seq2seq_routing_and_sample(rng):
    cfg = Seq2SeqConfig(vocab_size=18, embed_size=8, hidden_size=10,
                        num_layers=2, dropout=0.0, max_seq_length=6)
    params = s2s.init_params(jax.random.PRNGKey(0), cfg)
    b, t = 2, 5
    src = jnp.asarray(rng.integers(0, 18, (b, t)), jnp.int32)
    dst = jnp.asarray(rng.integers(0, 18, (b, t)), jnp.int32)
    feats = jnp.asarray(rng.standard_normal((b, 8)).astype(np.float32))

    fac = s2s.forward(params, cfg, feats, (src, None), teacher_forcing_ratio=1.0,
                      train=False)
    assert fac.shape == (b, t, 18)
    happy = s2s.forward(params, cfg, feats, (src, None), (dst, None), emotion=0,
                        teacher_forcing_ratio=1.0, train=False)
    sad = s2s.forward(params, cfg, feats, (src, None), (dst, None), emotion=1,
                      teacher_forcing_ratio=1.0, train=False)
    assert happy.shape == (b, t, 18)
    assert not np.allclose(np.asarray(happy), np.asarray(sad))

    ids_fac = s2s.greedy_sample(params, cfg, feats, start_token=1)
    assert ids_fac.shape == (b, cfg.max_seq_length)
    ids_emo = s2s.greedy_sample(params, cfg, feats, start_token=1, emotion=2)
    assert ids_emo.shape == (b, cfg.max_seq_length)
