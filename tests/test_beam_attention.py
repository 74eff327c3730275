"""Beam equivalence for the ATTENTION decoder: the masked beam over
factored_att_decode_step must reproduce the reference's shrinking-beam
algorithm (model_att.py:307-426: re-attention each step, h/c init from the
mean feature, no feature input at step 1)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from icee_tpu.core.config import AttentionDecoderConfig
from icee_tpu.decode.beam import beam_search
from icee_tpu.models import attention as att_mod
from icee_tpu.models import factored_lstm as fl
from tests.test_beam import oracle_beam


def _np_att_step(params, features_np, style):
    """NumPy twin of factored_att_decode_step for the oracle."""
    p = jax.tree_util.tree_map(np.asarray, params)

    def sig(a):
        return 1.0 / (1.0 + np.exp(-a))

    att = {k: v[style] for k, v in p["attention"].items()}

    def embed_fn(tokens):
        return p["B"][tokens]

    def step_fn(emb, state):
        h, c = state
        feats = features_np[: h.shape[0]]
        a1 = feats @ att["enc_w"] + att["enc_b"]
        a2 = h @ att["dec_w"] + att["dec_b"]
        e = (np.maximum(a1 + a2[:, None, :], 0.0) @ att["full_w"])[..., 0] \
            + att["full_b"]
        ex = np.exp(e - e.max(axis=1, keepdims=True))
        alpha = ex / ex.sum(axis=1, keepdims=True)
        ctx = (feats * alpha[..., None]).sum(axis=1)
        gate = sig(h @ p["f_beta_w"] + p["f_beta_b"])
        x = np.concatenate([emb, gate * ctx], axis=-1)
        f_dim = p["U_w"].shape[1]
        hd = h.shape[-1]
        v = (x @ p["V_w"]).reshape(x.shape[0], 4, f_dim) + p["V_b"]
        s = np.einsum("bgf,gfk->bgk", v, p["S_w"][style]) + p["S_b"][style]
        u = np.einsum("bgf,gfh->bgh", s, p["U_w"]) + p["U_b"]
        w = (h @ p["W_w"]).reshape(h.shape[0], 4, hd) + p["W_b"]
        z = u + w
        c2 = sig(z[:, 1]) * c + sig(z[:, 0]) * np.tanh(z[:, 3])
        h2 = sig(z[:, 2]) * c2
        return h2 @ p["C_w"] + p["C_b"], (h2, c2)

    return embed_fn, step_fn


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_attention_beam_matches_reference_algorithm(rng, seed):
    cfg = AttentionDecoderConfig(vocab_size=40, embed_size=12, hidden_size=16,
                                 factored_size=16, attention_size=10,
                                 feature_size=14, max_seq_length=10)
    params = att_mod.init_factored_att_params(jax.random.PRNGKey(seed), cfg)
    k, start, end = 5, 1, 2
    style = seed % 4
    spatial = rng.standard_normal((6, 14)).astype(np.float32)  # (P, enc)
    feats_k = np.tile(spatial[None], (k, 1, 1))

    # oracle: mean-feature init + reference shrinking beam over the numpy step
    embed_np, step_np = _np_att_step(params, feats_k, style)
    mean = spatial.mean(0)
    h0 = np.tile(mean @ np.asarray(params["init_h_w"])
                 + np.asarray(params["init_h_b"]), (k, 1)).astype(np.float32)
    c0 = np.tile(mean @ np.asarray(params["init_c_w"])
                 + np.asarray(params["init_c_b"]), (k, 1)).astype(np.float32)
    ref_seq, ref_score = oracle_beam(embed_np, step_np, (h0, c0), start, end,
                                     k, cfg.max_seq_length, first_input=None)

    feats_j = jnp.tile(jnp.asarray(spatial)[None], (k, 1, 1))
    style_j = jnp.asarray(style)

    def step_jax(x, state):
        logits, _, s2 = att_mod.factored_att_decode_step(
            params, x, feats_j, state, style_j)
        return logits, s2

    res = beam_search(
        embed_fn=lambda t: fl.embed(params, t),
        step_fn=step_jax,
        init_model_state=att_mod.init_hidden_state(params, feats_j),
        start_token=start, end_token=end, k=k,
        max_seq_length=cfg.max_seq_length, vocab_size=cfg.vocab_size)

    got = np.asarray(res.tokens)[: int(res.length)].tolist()
    if ref_score == float("-inf"):
        assert got == [end]
    else:
        assert got == ref_seq, f"attention beam mismatch: {got} vs {ref_seq}"
        assert np.isclose(float(res.score), ref_score, rtol=1e-4, atol=1e-4)
