"""Fused attention decode-step kernel vs the XLA attention oracles
(interpret mode on CPU; compiled on TPU by cli/evaluate.py)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from icee_tpu.core.config import AttentionDecoderConfig
from icee_tpu.models import attention as att_mod
from icee_tpu.models import factored_lstm as fl
from icee_tpu.ops.pallas_att_decode import fused_att_decode_step_topk

CFG = AttentionDecoderConfig(vocab_size=300, embed_size=16, hidden_size=24,
                             factored_size=24, attention_size=20,
                             feature_size=32)
B, K, P = 6, 4, 9  # images, beam width, spatial positions


def _rows(rng, shape):
    return jnp.asarray(rng.standard_normal(shape).astype(np.float32))


@pytest.mark.parametrize("style", [0, 3])
def test_factored_att_step_matches_oracle(rng, style):
    params = att_mod.init_factored_att_params(jax.random.PRNGKey(0), CFG)
    style = jnp.asarray(style)
    rows = B * K
    x = _rows(rng, (rows, CFG.embed_size))
    h = _rows(rng, (rows, CFG.hidden_size))
    c = _rows(rng, (rows, CFG.hidden_size))
    feats = _rows(rng, (B, P, CFG.feature_size))

    att = att_mod._select_attention(params["attention"], style)
    att1 = feats @ att["enc_w"] + att["enc_b"]

    # oracle: per-row features (each image's beams share features)
    feats_rows = jnp.repeat(feats, K, axis=0)
    att1_rows = jnp.repeat(att1, K, axis=0)
    logits, alpha_o, (h_o, c_o) = att_mod.factored_att_decode_step(
        params, x, feats_rows, (h, c), style, att1=att1_rows)
    logp_o = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    want_v, want_i = jax.lax.top_k(logp_o, K)

    cell = {k_: params[k_] for k_ in
            ("V_w", "V_b", "U_w", "U_b", "W_w", "W_b", "C_w", "C_b")}
    cell["S_w"] = params["S_w"][style]
    cell["S_b"] = params["S_b"][style]
    gate = {"f_beta_w": params["f_beta_w"], "f_beta_b": params["f_beta_b"]}
    got_v, got_i, got_h, got_c, got_a = fused_att_decode_step_topk(
        cell, att, gate, x, h, c, feats, att1, kind="factored", k=K,
        ktop=K, n_img_block=3, v_tile=128, interpret=True)

    np.testing.assert_array_equal(np.asarray(got_i), np.asarray(want_i))
    np.testing.assert_allclose(np.asarray(got_v), np.asarray(want_v),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(got_h), np.asarray(h_o),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(got_c), np.asarray(c_o),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(got_a), np.asarray(alpha_o),
                               rtol=1e-4, atol=1e-5)


def test_rnn_att_step_matches_oracle(rng):
    params = att_mod.init_rnn_att_params(jax.random.PRNGKey(1), CFG)
    rows = B * K
    x = _rows(rng, (rows, CFG.embed_size))
    h = _rows(rng, (rows, CFG.hidden_size))
    c = _rows(rng, (rows, CFG.hidden_size))
    feats = _rows(rng, (B, P, CFG.feature_size))

    att = params["attention"]
    att1 = feats @ att["enc_w"] + att["enc_b"]
    feats_rows = jnp.repeat(feats, K, axis=0)
    att1_rows = jnp.repeat(att1, K, axis=0)
    logits, alpha_o, (h_o, c_o) = att_mod.rnn_att_decode_step(
        params, x, feats_rows, (h, c), att1=att1_rows)
    logp_o = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    want_v, want_i = jax.lax.top_k(logp_o, K)

    cell = dict(params["cell"])
    cell["C_w"] = params["linear_w"]
    cell["C_b"] = params["linear_b"]
    gate = {"f_beta_w": params["f_beta_w"], "f_beta_b": params["f_beta_b"]}
    got_v, got_i, got_h, got_c, got_a = fused_att_decode_step_topk(
        cell, att, gate, x, h, c, feats, att1, kind="lstm", k=K,
        ktop=K, n_img_block=2, v_tile=128, interpret=True)

    np.testing.assert_array_equal(np.asarray(got_i), np.asarray(want_i))
    np.testing.assert_allclose(np.asarray(got_v), np.asarray(want_v),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(got_h), np.asarray(h_o),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(got_a), np.asarray(alpha_o),
                               rtol=1e-4, atol=1e-5)


def test_fused_att_beam_matches_xla_beam(rng):
    """End-to-end: beam_search_batched with the fused att step produces the
    same captions as the pure-XLA attention beam."""
    from icee_tpu.decode.beam import beam_search_batched

    params = att_mod.init_factored_att_params(jax.random.PRNGKey(2), CFG)
    style = jnp.asarray(1)
    steps = 6
    feats = _rows(rng, (B, P, CFG.feature_size))
    att = att_mod._select_attention(params["attention"], style)
    att1 = feats @ att["enc_w"] + att["enc_b"]
    feats_k = jnp.repeat(feats, K, axis=0)
    att1_k = jnp.repeat(att1, K, axis=0)

    def xla_step(x, s):
        logits, _, s2 = att_mod.factored_att_decode_step(
            params, x, feats_k, s, style, att1=att1_k)
        return logits, s2

    want = beam_search_batched(
        embed_fn=lambda t: fl.embed(params, t),
        step_fn=xla_step,
        init_model_state=att_mod.init_hidden_state(params, feats_k),
        start_token=1, end_token=2, k=K, max_seq_length=steps,
        vocab_size=CFG.vocab_size, batch=B)

    cell = {k_: params[k_] for k_ in
            ("V_w", "V_b", "U_w", "U_b", "W_w", "W_b", "C_w", "C_b")}
    cell["S_w"] = params["S_w"][style]
    cell["S_b"] = params["S_b"][style]
    gate = {"f_beta_w": params["f_beta_w"], "f_beta_b": params["f_beta_b"]}

    def fused_step(x, s):
        h, c = s
        v, i, h2, c2, _ = fused_att_decode_step_topk(
            cell, att, gate, x, h, c, feats, att1, kind="factored", k=K,
            ktop=K, n_img_block=3, v_tile=128, interpret=True)
        return v, i, (h2, c2)

    got = beam_search_batched(
        embed_fn=lambda t: fl.embed(params, t),
        step_fn=None,
        init_model_state=att_mod.init_hidden_state(params, feats_k),
        start_token=1, end_token=2, k=K, max_seq_length=steps,
        vocab_size=CFG.vocab_size, batch=B, step_topk_fn=fused_step)

    np.testing.assert_array_equal(np.asarray(got.tokens),
                                  np.asarray(want.tokens))
    np.testing.assert_array_equal(np.asarray(got.length),
                                  np.asarray(want.length))


@pytest.mark.filterwarnings("ignore:mega_att_beam_decode")
@pytest.mark.parametrize("nib,n_streams,topk_fold",
                         [(3, 1, False), (2, 2, False), (3, 1, True)])
def test_mega_att_beam_matches_xla_beam(rng, nib, n_streams, topk_fold):
    """The whole-search attention kernel must match the XLA attention beam
    token-exactly (research semantics, batch padding exercised; with
    ``n_streams=2`` the block splits into interleaved image streams)."""
    from icee_tpu.decode.beam import beam_search_batched
    from icee_tpu.ops.pallas_att_decode import mega_att_beam_decode

    params = att_mod.init_factored_att_params(jax.random.PRNGKey(4), CFG)
    style = jnp.asarray(2)
    steps, batch = 7, 5          # batch 5 with block 3 -> padded to 6
    feats = _rows(rng, (batch, P, CFG.feature_size))

    att = att_mod._select_attention(params["attention"], style)
    att1 = feats @ att["enc_w"] + att["enc_b"]
    feats_k = jnp.repeat(feats, K, axis=0)
    att1_k = jnp.repeat(att1, K, axis=0)

    def xla_step(x, s):
        logits, _, s2 = att_mod.factored_att_decode_step(
            params, x, feats_k, s, style, att1=att1_k)
        return logits, s2

    want = beam_search_batched(
        embed_fn=lambda t: fl.embed(params, t),
        step_fn=xla_step,
        init_model_state=att_mod.init_hidden_state(params, feats_k),
        start_token=1, end_token=2, k=K, max_seq_length=steps,
        vocab_size=CFG.vocab_size, batch=batch)

    got = mega_att_beam_decode(
        params, feats, style, batch, start_token=1, end_token=2, k=K,
        max_seq_length=steps, n_img_block=nib,
        v_tile=256 if topk_fold else 128, n_streams=n_streams,
        topk_fold=topk_fold, interpret=True)

    np.testing.assert_array_equal(np.asarray(got.tokens),
                                  np.asarray(want.tokens))
    np.testing.assert_array_equal(np.asarray(got.length),
                                  np.asarray(want.length))
    np.testing.assert_allclose(np.asarray(got.score), np.asarray(want.score),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.filterwarnings("ignore:mega_att_beam_decode")
def test_mega_att_nic_lstm_matches_xla_beam(rng):
    """kind="lstm": NIC+Att through the attention mega kernel must match
    the XLA rnn_att beam token-exactly."""
    from icee_tpu.decode.beam import beam_search_batched
    from icee_tpu.ops.pallas_att_decode import mega_att_beam_decode

    params = att_mod.init_rnn_att_params(jax.random.PRNGKey(6), CFG)
    steps, batch = 6, 4
    feats = _rows(rng, (batch, P, CFG.feature_size))
    att = params["attention"]
    att1 = feats @ att["enc_w"] + att["enc_b"]
    feats_k = jnp.repeat(feats, K, axis=0)
    att1_k = jnp.repeat(att1, K, axis=0)

    def xla_step(x, s):
        logits, _, s2 = att_mod.rnn_att_decode_step(
            params, x, feats_k, s, att1=att1_k)
        return logits, s2

    want = beam_search_batched(
        embed_fn=lambda t: jnp.take(params["embed"], t, axis=0),
        step_fn=xla_step,
        init_model_state=att_mod.init_hidden_state(params, feats_k),
        start_token=1, end_token=2, k=K, max_seq_length=steps,
        vocab_size=CFG.vocab_size, batch=batch)

    got = mega_att_beam_decode(
        params, feats, jnp.asarray(0), batch, start_token=1, end_token=2,
        k=K, max_seq_length=steps, n_img_block=2, v_tile=128, kind="lstm",
        n_streams=2, interpret=True)
    np.testing.assert_array_equal(np.asarray(got.tokens),
                                  np.asarray(want.tokens))
    np.testing.assert_array_equal(np.asarray(got.length),
                                  np.asarray(want.length))


@pytest.mark.filterwarnings("ignore:mega_att_beam_decode")
@pytest.mark.parametrize("kind,nib,p_tile,ns",
                         [("factored", 3, 3, 1), ("factored", 2, 3, 2),
                          ("lstm", 2, 3, 1), ("factored", 5, 9, 1),
                          ("factored", 3, 4, 1),   # P=9 pads to 12 (mask)
                          ("lstm", 2, 8, 1)])      # P=9 pads to 16 (mask)
def test_mega_att_streamed_matches_xla_beam(rng, kind, nib, p_tile, ns):
    """The P-STREAMED attention mega kernel (VERDICT r2 #2: features/att1
    streamed from HBM in P tiles, two-pass exact softmax, hoisted h0/c0)
    must match the XLA attention beam token-exactly — batch padding,
    multi-block, multi-tile P, and stream-interleaved tail all exercised."""
    from icee_tpu.decode.beam import beam_search_batched
    from icee_tpu.ops.pallas_att_decode import mega_att_beam_decode

    steps, batch = 7, 5
    if kind == "factored":
        params = att_mod.init_factored_att_params(jax.random.PRNGKey(4), CFG)
        style = jnp.asarray(2)
        embed_fn = lambda t: fl.embed(params, t)  # noqa: E731
        att = att_mod._select_attention(params["attention"], style)
    else:
        params = att_mod.init_rnn_att_params(jax.random.PRNGKey(4), CFG)
        style = jnp.asarray(0)
        embed_fn = lambda t: jnp.take(params["embed"], t, axis=0)  # noqa: E731
        att = params["attention"]
    feats = _rows(rng, (batch, P, CFG.feature_size))
    att1 = feats @ att["enc_w"] + att["enc_b"]
    feats_k = jnp.repeat(feats, K, axis=0)
    att1_k = jnp.repeat(att1, K, axis=0)

    def xla_step(x, s):
        if kind == "factored":
            logits, _, s2 = att_mod.factored_att_decode_step(
                params, x, feats_k, s, style, att1=att1_k)
        else:
            logits, _, s2 = att_mod.rnn_att_decode_step(
                params, x, feats_k, s, att1=att1_k)
        return logits, s2

    want = beam_search_batched(
        embed_fn=embed_fn, step_fn=xla_step,
        init_model_state=att_mod.init_hidden_state(params, feats_k),
        start_token=1, end_token=2, k=K, max_seq_length=steps,
        vocab_size=CFG.vocab_size, batch=batch)

    got = mega_att_beam_decode(
        params, feats, style, batch, start_token=1, end_token=2, k=K,
        max_seq_length=steps, n_img_block=nib, v_tile=128, kind=kind,
        n_streams=ns, p_stream=True, p_tile=p_tile, interpret=True)
    np.testing.assert_array_equal(np.asarray(got.tokens),
                                  np.asarray(want.tokens))
    np.testing.assert_array_equal(np.asarray(got.length),
                                  np.asarray(want.length))
    np.testing.assert_allclose(np.asarray(got.score), np.asarray(want.score),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.filterwarnings("ignore:mega_att_beam_decode")
def test_mega_att_fuzz_random_configs(rng):
    """Randomized (dims, k, P, vocab, batch, blocks, streams, kind, fold)
    fuzz: the attention mega kernel must match the XLA attention beam
    token-exactly on every draw (mirrors
    test_pallas_beam.test_mega_fuzz_random_configs)."""
    from icee_tpu.decode.beam import beam_search_batched
    from icee_tpu.ops.pallas_att_decode import mega_att_beam_decode

    for trial in range(4):
        vocab = int(rng.integers(140, 520))
        e = int(rng.integers(8, 32))
        h = int(rng.integers(16, 56))
        a = int(rng.integers(8, 40))
        fs = int(rng.integers(16, 48))
        p_pix = int(rng.integers(4, 14))
        k = int(rng.integers(2, 6))
        batch = int(rng.integers(2, 7))
        steps = int(rng.integers(3, 8))
        nib = int(rng.integers(1, batch + 1))
        ns = 2 if (nib % 2 == 0 and rng.random() < 0.5) else 1
        kind = "factored" if rng.random() < 0.6 else "lstm"
        fold = bool(rng.random() < 0.4)
        cfg = AttentionDecoderConfig(
            vocab_size=vocab, embed_size=e, hidden_size=h, factored_size=h,
            attention_size=a, feature_size=fs, max_seq_length=steps)
        if kind == "factored":
            params = att_mod.init_factored_att_params(
                jax.random.PRNGKey(trial), cfg)
            style = jnp.asarray(int(rng.integers(0, 4)))
            att = att_mod._select_attention(params["attention"], style)
            embed_fn = lambda t, p=params: fl.embed(p, t)  # noqa: E731
        else:
            params = att_mod.init_rnn_att_params(
                jax.random.PRNGKey(trial), cfg)
            style = jnp.asarray(0)
            att = params["attention"]
            embed_fn = lambda t, p=params: jnp.take(  # noqa: E731
                p["embed"], t, axis=0)
        feats = _rows(rng, (batch, p_pix, fs))
        att1 = feats @ att["enc_w"] + att["enc_b"]
        feats_k = jnp.repeat(feats, k, axis=0)
        att1_k = jnp.repeat(att1, k, axis=0)

        if kind == "factored":
            def xla_step(x, s, params=params, feats_k=feats_k,
                         att1_k=att1_k, style=style):
                logits, _, s2 = att_mod.factored_att_decode_step(
                    params, x, feats_k, s, style, att1=att1_k)
                return logits, s2
        else:
            def xla_step(x, s, params=params, feats_k=feats_k,
                         att1_k=att1_k):
                logits, _, s2 = att_mod.rnn_att_decode_step(
                    params, x, feats_k, s, att1=att1_k)
                return logits, s2

        want = beam_search_batched(
            embed_fn=embed_fn, step_fn=xla_step,
            init_model_state=att_mod.init_hidden_state(params, feats_k),
            start_token=1, end_token=2, k=k, max_seq_length=steps,
            vocab_size=vocab, batch=batch)
        got = mega_att_beam_decode(
            params, feats, style, batch, start_token=1, end_token=2, k=k,
            max_seq_length=steps, n_img_block=nib,
            v_tile=256 if fold else 128, kind=kind, n_streams=ns,
            topk_fold=fold, interpret=True)
        ctx = dict(trial=trial, vocab=vocab, e=e, h=h, a=a, fs=fs,
                   p=p_pix, k=k, batch=batch, steps=steps, nib=nib, ns=ns,
                   kind=kind, fold=fold)
        np.testing.assert_array_equal(np.asarray(got.tokens),
                                      np.asarray(want.tokens),
                                      err_msg=str(ctx))
        np.testing.assert_array_equal(np.asarray(got.length),
                                      np.asarray(want.length),
                                      err_msg=str(ctx))
