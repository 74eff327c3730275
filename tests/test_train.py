"""Training-layer tests: jitted steps learn, parameter-group masking matches
the reference's optimizer structure, and the E2E slice (train -> decode ->
BLEU) overfits a tiny synthetic corpus on CPU."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from icee_tpu.core.config import (
    AttentionDecoderConfig,
    DecoderConfig,
    EncoderConfig,
    Seq2SeqConfig,
    TrainConfig,
)
from icee_tpu.data.pipeline import make_batch
from icee_tpu.models import encoder as enc_mod
from icee_tpu.models import factored_lstm as fl
from icee_tpu.models import lstm as nic
from icee_tpu.models import attention as att_mod
from icee_tpu.models import seq2seq as s2s
from icee_tpu.train import optim
from icee_tpu.train.steps import (
    make_attention_steps,
    make_caption_steps,
    make_seq2seq_steps,
)

V, E, H, F = 30, 16, 24, 24
CFG = DecoderConfig(vocab_size=V, embed_size=E, hidden_size=H, factored_size=F,
                    dropout=0.0)
TCFG = TrainConfig(teacher_forcing_ratio=1.0, grad_clip=0.5)
ECFG = EncoderConfig(embed_size=E, feature_size=32)


def _toy_batch(rng, b=4, t=8):
    caps = [[1] + list(rng.integers(4, V, t - 2)) + [2] for _ in range(b)]
    batch = make_batch(caps, max_len=t, batch_size=b)
    pooled = rng.standard_normal((b, 32)).astype(np.float32)
    return batch, pooled


def _setup():
    dec = fl.init_params(jax.random.PRNGKey(0), CFG)
    head = enc_mod.init_head_params(jax.random.PRNGKey(1), ECFG)
    opt = optim.make_adam(1e-2, TCFG)
    lang = optim.make_adam(1e-2, TCFG)
    steps = make_caption_steps(CFG, TCFG, opt, lang, factored=True)
    return dec, head, opt, lang, steps


def test_factual_step_learns(rng):
    dec, head, opt, lang, (fac, emo, val) = _setup()
    batch, pooled = _toy_batch(rng)
    opt_state = opt.init((dec, head))
    args = (jnp.asarray(pooled), jnp.asarray(batch.captions),
            jnp.asarray(batch.lengths), jnp.asarray(batch.sample_mask))
    losses = []
    key = jax.random.PRNGKey(0)
    for i in range(30):
        key, k = jax.random.split(key)
        dec, head, opt_state, loss = fac(dec, head, opt_state, *args, k)
        losses.append(float(loss))
    assert losses[-1] < losses[0] * 0.5, losses[::10]


def test_emotion_step_only_updates_decoder(rng):
    dec, head, opt, lang, (fac, emo, val) = _setup()
    batch, pooled = _toy_batch(rng)
    lang_state = lang.init(dec)
    head_before = jax.tree_util.tree_map(np.asarray, head)
    dec2, head2, lang_state, loss = emo(
        dec, head, lang_state, jnp.asarray(pooled),
        jnp.asarray(batch.captions), jnp.asarray(batch.lengths),
        jnp.asarray(batch.sample_mask), jnp.asarray(1), jax.random.PRNGKey(0))
    # head weights untouched (lang optimizer covers decoder only)
    np.testing.assert_array_equal(np.asarray(head2["linear_w"]),
                                  head_before["linear_w"])
    np.testing.assert_array_equal(np.asarray(head2["bn"]["weight"]),
                                  head_before["bn"]["weight"])
    # but BN running stats advanced (encoder stays in train mode)
    assert not np.allclose(np.asarray(head2["bn"]["running_mean"]),
                           head_before["bn"]["running_mean"])
    # decoder moved
    assert not np.allclose(np.asarray(dec2["S_w"]), np.asarray(dec["S_w"]))


def test_transfer_mask_limits_updates_to_style_and_head(rng):
    dec = fl.init_params(jax.random.PRNGKey(0), CFG)
    mask = fl.style_param_mask(dec)
    tx = optim.make_adam(1e-2, TCFG, param_mask=mask)
    head = enc_mod.init_head_params(jax.random.PRNGKey(1), ECFG)
    steps = make_caption_steps(CFG, TCFG, optim.make_adam(1e-2, TCFG), tx, True)
    _, emo, _ = steps
    batch, pooled = _toy_batch(rng)
    state = tx.init(dec)
    dec2, _, state, _ = emo(
        dec, head, state, jnp.asarray(pooled), jnp.asarray(batch.captions),
        jnp.asarray(batch.lengths), jnp.asarray(batch.sample_mask),
        jnp.asarray(2), jax.random.PRNGKey(0))
    assert not np.allclose(np.asarray(dec2["S_w"]), np.asarray(dec["S_w"]))
    assert not np.allclose(np.asarray(dec2["C_w"]), np.asarray(dec["C_w"]))
    np.testing.assert_array_equal(np.asarray(dec2["B"]), np.asarray(dec["B"]))
    np.testing.assert_array_equal(np.asarray(dec2["U_w"]), np.asarray(dec["U_w"]))


def test_style_slice_optimizer_touches_one_style(rng):
    """Paper-regime (T1) per-emotion Adam touches only that style's S slice."""
    dec = fl.init_params(jax.random.PRNGKey(0), CFG)
    sid = 2  # sad
    tx = optim.make_style_adam(1e-2, sid, TCFG)
    state = tx.init(dec)

    def loss_fn(d):
        caps = jnp.asarray(rng.integers(0, V, (3, 6)), jnp.int32)
        logits = fl.forward(d, CFG, caps, None, jnp.asarray(sid), 1.0,
                            train=False)
        return jnp.mean(logits ** 2)

    grads = jax.grad(loss_fn)(dec)
    updates, state = tx.update(grads, state, dec)
    dec2 = jax.tree_util.tree_map(lambda p, u: p + u, dec, updates)
    s_w_delta = np.asarray(dec2["S_w"]) - np.asarray(dec["S_w"])
    assert np.abs(s_w_delta[sid]).max() > 0
    for other in range(4):
        if other != sid:
            assert np.abs(s_w_delta[other]).max() == 0
    # non-S leaves moved too? paper regime masks to S only through
    # style_slice_zero + adam over all leaves; the reference's per-emotion
    # optimizer covers ONLY that style's S matrices -> other leaves must not
    # move under make_style_adam either
    np.testing.assert_array_equal(np.asarray(dec2["B"]), np.asarray(dec["B"]))


def test_attention_steps_run_and_learn(rng):
    acfg = AttentionDecoderConfig(vocab_size=V, embed_size=E, hidden_size=H,
                                  factored_size=F, attention_size=16,
                                  feature_size=20, dropout=0.0)
    dec = att_mod.init_factored_att_params(jax.random.PRNGKey(0), acfg)
    opt = optim.make_adam(1e-2, TCFG)
    lang = optim.make_adam(1e-2, TCFG)
    fac, emo, val = make_attention_steps(acfg, TCFG, opt, lang, True)
    batch, _ = _toy_batch(rng, b=3, t=7)
    feats = jnp.asarray(rng.standard_normal((3, 9, 20)).astype(np.float32))
    opt_state = opt.init(dec)
    losses = []
    key = jax.random.PRNGKey(0)
    for _ in range(25):
        key, k = jax.random.split(key)
        dec, opt_state, loss = fac(
            dec, opt_state, feats, jnp.asarray(batch.captions),
            jnp.asarray(batch.lengths), jnp.asarray(batch.sample_mask), k)
        losses.append(float(loss))
    assert losses[-1] < losses[0]
    loss, top5, preds = val(dec, feats, jnp.asarray(batch.captions),
                            jnp.asarray(batch.lengths),
                            jnp.asarray(batch.sample_mask), jnp.asarray(0))
    assert preds.shape == (3, 6)  # shifted: T-1


def test_seq2seq_steps_run(rng):
    scfg = Seq2SeqConfig(vocab_size=V, embed_size=E, hidden_size=H,
                         num_layers=1, dropout=0.0)
    params = s2s.init_params(jax.random.PRNGKey(0), scfg)
    head = enc_mod.init_head_params(jax.random.PRNGKey(1), ECFG)
    opt = optim.make_adam(1e-2, TCFG)
    eopt = optim.make_adam(1e-2, TCFG)
    fac, emo, valf, vale = make_seq2seq_steps(scfg, TCFG, opt, eopt)
    batch, pooled = _toy_batch(rng)
    opt_state = opt.init((params["encoder"], head))
    e_state = eopt.init(params["decoders"])
    args = (jnp.asarray(pooled), jnp.asarray(batch.captions),
            jnp.asarray(batch.lengths))
    params, head, opt_state, loss1 = fac(
        params, head, opt_state, *args, jnp.asarray(batch.sample_mask),
        jax.random.PRNGKey(0))
    dec_before = jax.tree_util.tree_map(np.asarray, params["decoders"])
    params, e_state, loss2 = emo(
        params, head, e_state, jnp.asarray(pooled),
        jnp.asarray(batch.captions), jnp.asarray(batch.lengths),
        jnp.asarray(batch.captions), jnp.asarray(batch.lengths),
        jnp.asarray(batch.sample_mask), jnp.asarray(0), jax.random.PRNGKey(1))
    # emotion 0 (happy) slice moved; sad/angry untouched
    delta = np.asarray(params["decoders"]["linear_w"]) - dec_before["linear_w"]
    assert np.abs(delta[0]).max() > 0
    assert np.abs(delta[1]).max() == 0 and np.abs(delta[2]).max() == 0
    assert np.isfinite(loss1) and np.isfinite(loss2)


def test_lr_decay_mutates_hyperparam():
    tx = optim.make_adam(1e-3, TCFG)
    dec = fl.init_params(jax.random.PRNGKey(0), CFG)
    state = tx.init(dec)
    assert abs(optim.get_lr(state) - 1e-3) < 1e-9
    optim.decay_lr(state, 0.8)
    assert abs(optim.get_lr(state) - 8e-4) < 1e-9
