"""Beam-search equivalence: the shape-stable masked beam must reproduce the
reference's dynamic shrinking-beam algorithm (stylenet/model.py:198-294)
exactly — same winning sequence and score — on arbitrary models."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from icee_tpu.core.config import DecoderConfig
from icee_tpu.decode.beam import beam_search
from icee_tpu.decode.greedy import greedy_decode
from icee_tpu.models import factored_lstm as fl


def oracle_beam(embed_fn, step_fn, init_state, start, end, k, max_seq_length,
                first_input=None):
    """Python transcription of the reference's beam loop semantics
    (dynamic shrinking, step-1 row-0 special case, completion set-aside,
    raw-score selection, [end] fallback)."""
    prev_words = np.full((k,), start, np.int64)
    seqs = prev_words[:, None].copy()
    top_scores = np.zeros((k,), np.float64)
    state = init_state
    complete_seqs, complete_scores = [], []
    step = 1
    while True:
        if step == 1 and first_input is not None:
            x = first_input[:k]
        else:
            x = embed_fn(prev_words)
        logits, state = step_fn(x, state)
        logp = logits - np.log(np.exp(logits - logits.max(-1, keepdims=True))
                               .sum(-1, keepdims=True)) - logits.max(-1, keepdims=True)
        scores = top_scores[:, None] + logp
        V = scores.shape[1]
        if step == 1:
            flat = scores[0]
            idx = np.argsort(-flat, kind="stable")[:k]
            top_scores = flat[idx]
            prev_idx = np.zeros((k,), np.int64)
            words = idx
        else:
            flat = scores.reshape(-1)
            idx = np.argsort(-flat, kind="stable")[: len(top_scores)]
            top_scores = flat[idx]
            prev_idx = idx // V
            words = idx % V
        seqs = np.concatenate([seqs[prev_idx], words[:, None]], axis=1)
        incomplete = [i for i, w in enumerate(words) if w != end]
        complete = [i for i in range(len(words)) if i not in incomplete]
        if complete:
            complete_seqs.extend(seqs[complete].tolist())
            complete_scores.extend(top_scores[complete].tolist())
        if len(incomplete) == 0:
            break
        seqs = seqs[incomplete]
        state = tuple(s[prev_idx[incomplete]] for s in state)
        top_scores = top_scores[incomplete]
        prev_words = words[incomplete]
        if step > max_seq_length:
            break
        step += 1
    if not complete_scores:
        return [end], float("-inf")
    best = int(np.argmax(complete_scores))
    return complete_seqs[best], complete_scores[best]


def _make_model(seed, vocab=40):
    cfg = DecoderConfig(vocab_size=vocab, embed_size=16, hidden_size=24,
                        factored_size=24, dropout=0.0, max_seq_length=12)
    params = fl.init_params(jax.random.PRNGKey(seed), cfg)
    return cfg, params


def _np_step(params, style=0):
    """NumPy twin of the factored decode step for the oracle."""
    p = {k: np.asarray(v) for k, v in params.items()}

    def sig(a):
        return 1.0 / (1.0 + np.exp(-a))

    def embed_fn(tokens):
        return p["B"][tokens]

    def step_fn(x, state):
        h, c = state
        f = p["U_w"].shape[1]
        v = (x @ p["V_w"]).reshape(x.shape[0], 4, f) + p["V_b"]
        s = np.einsum("bgf,gfk->bgk", v, p["S_w"][style]) + p["S_b"][style]
        u = np.einsum("bgf,gfh->bgh", s, p["U_w"]) + p["U_b"]
        hd = h.shape[-1]
        w = (h @ p["W_w"]).reshape(h.shape[0], 4, hd) + p["W_b"]
        z = u + w
        i_t, f_t, o_t, g_t = sig(z[:, 0]), sig(z[:, 1]), sig(z[:, 2]), np.tanh(z[:, 3])
        c2 = f_t * c + i_t * g_t
        h2 = o_t * c2
        return h2 @ p["C_w"] + p["C_b"], (h2, c2)

    return embed_fn, step_fn


@pytest.mark.parametrize("seed", [0, 1, 2, 3, 4])
@pytest.mark.parametrize("feed_feature", [True, False])
def test_beam_matches_reference_algorithm(seed, feed_feature, rng):
    cfg, params = _make_model(seed)
    k, start, end = 5, 1, 2
    style = seed % 4
    embed_np, step_np = _np_step(params, style)
    h0 = np.zeros((k, cfg.hidden_size), np.float32)
    c0 = np.zeros((k, cfg.hidden_size), np.float32)
    feat = rng.standard_normal((k, cfg.embed_size)).astype(np.float32) \
        if feed_feature else None

    ref_seq, ref_score = oracle_beam(
        embed_np, step_np, (h0, c0), start, end, k, cfg.max_seq_length,
        first_input=feat,
    )

    style_j = jnp.asarray(style)

    def step_jax(x, state):
        return fl.decode_step(params, x, state, style_j)

    res = beam_search(
        embed_fn=lambda toks: fl.embed(params, toks),
        step_fn=step_jax,
        init_model_state=(jnp.asarray(h0), jnp.asarray(c0)),
        start_token=start,
        end_token=end,
        k=k,
        max_seq_length=cfg.max_seq_length,
        vocab_size=cfg.vocab_size,
        first_input=jnp.asarray(feat) if feat is not None else None,
    )
    got = np.asarray(res.tokens)[: int(res.length)].tolist()
    if ref_score == float("-inf"):
        assert got == [end]
    else:
        assert got == ref_seq, f"beam mismatch: {got} vs {ref_seq}"
        assert np.isclose(float(res.score), ref_score, rtol=1e-4, atol=1e-4)


def test_beam_no_completion_fallback():
    """A model that never emits <end> must return the bare [<end>] sequence
    (model.py:288-289)."""
    cfg, params = _make_model(7, vocab=30)
    # make <end> (=2) impossible
    params = dict(params)
    params["C_b"] = params["C_b"].at[2].set(-1e9)
    k = 3

    def step_jax(x, state):
        return fl.decode_step(params, x, state, jnp.asarray(0))

    res = beam_search(
        embed_fn=lambda toks: fl.embed(params, toks),
        step_fn=step_jax,
        init_model_state=fl.initial_state(k, cfg),
        start_token=1, end_token=2, k=k,
        max_seq_length=6, vocab_size=cfg.vocab_size,
    )
    assert int(res.length) == 1
    assert int(res.tokens[0]) == 2


def test_beam_is_jittable_and_vmappable(rng):
    cfg, params = _make_model(3)
    k = 5
    feats = jnp.asarray(rng.standard_normal((4, k, cfg.embed_size)).astype(np.float32))

    def one(feat):
        return beam_search(
            embed_fn=lambda toks: fl.embed(params, toks),
            step_fn=lambda x, s: fl.decode_step(params, x, s, jnp.asarray(1)),
            init_model_state=fl.initial_state(k, cfg),
            start_token=1, end_token=2, k=k,
            max_seq_length=cfg.max_seq_length, vocab_size=cfg.vocab_size,
            first_input=feat,
        )

    res = jax.jit(jax.vmap(one))(feats)
    assert res.tokens.shape == (4, cfg.max_seq_length + 2)
    assert res.length.shape == (4,)


def test_greedy_decode_matches_manual(rng):
    cfg, params = _make_model(5)
    b = 3
    feats = jnp.asarray(rng.standard_normal((b, cfg.embed_size)).astype(np.float32))

    ids = greedy_decode(
        embed_fn=lambda t: fl.embed(params, t),
        step_fn=lambda x, s: fl.decode_step(params, x, s, jnp.asarray(0)),
        init_state=fl.initial_state(b, cfg),
        first_input=feats,
        max_steps=8,
    )
    # manual
    h, c = fl.initial_state(b, cfg)
    x = feats
    for t in range(8):
        logits, (h, c) = fl.decode_step(params, x, (h, c), jnp.asarray(0))
        tok = jnp.argmax(logits, -1)
        np.testing.assert_array_equal(np.asarray(ids[:, t]), np.asarray(tok))
        x = fl.embed(params, tok)
