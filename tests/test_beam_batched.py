"""beam_search_batched (native batch, fused-kernel layout) must equal
vmap(beam_search) — XLA path and Pallas interpret path."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from icee_tpu.core.config import DecoderConfig
from icee_tpu.decode.beam import beam_search, beam_search_batched
from icee_tpu.models import factored_lstm as fl
from icee_tpu.ops.pallas_decode import fused_decode_step_topk

K = 5


def _model(seed, vocab=64):
    cfg = DecoderConfig(vocab_size=vocab, embed_size=16, hidden_size=32,
                        factored_size=32, max_seq_length=10)
    return cfg, fl.init_params(jax.random.PRNGKey(seed), cfg)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_batched_matches_vmap(rng, seed):
    cfg, dec = _model(seed)
    batch = 6
    feats = jnp.asarray(
        rng.standard_normal((batch, K, cfg.embed_size)).astype(np.float32))
    style = jnp.asarray(seed % 4)

    def one(feat):
        return beam_search(
            embed_fn=lambda t: fl.embed(dec, t),
            step_fn=lambda x, s: fl.decode_step(dec, x, s, style),
            init_model_state=fl.initial_state(K, cfg),
            start_token=1, end_token=2, k=K,
            max_seq_length=cfg.max_seq_length, vocab_size=cfg.vocab_size,
            first_input=feat)

    want = jax.vmap(one)(feats)

    got = beam_search_batched(
        embed_fn=lambda t: fl.embed(dec, t),
        step_fn=lambda x, s: fl.decode_step(dec, x, s, style),
        init_model_state=fl.initial_state(batch * K, cfg),
        start_token=1, end_token=2, k=K,
        max_seq_length=cfg.max_seq_length, vocab_size=cfg.vocab_size,
        batch=batch, first_input=feats)

    np.testing.assert_array_equal(np.asarray(got.length),
                                  np.asarray(want.length))
    for b in range(batch):
        L = int(want.length[b])
        np.testing.assert_array_equal(np.asarray(got.tokens[b, :L]),
                                      np.asarray(want.tokens[b, :L]))
    np.testing.assert_allclose(np.asarray(got.score), np.asarray(want.score),
                               rtol=1e-5, atol=1e-5)


def test_batched_fused_kernel_matches_xla(rng):
    cfg, dec = _model(3, vocab=128)
    batch = 4
    feats = jnp.asarray(
        rng.standard_normal((batch, K, cfg.embed_size)).astype(np.float32))
    style = jnp.asarray(1)

    xla = beam_search_batched(
        embed_fn=lambda t: fl.embed(dec, t),
        step_fn=lambda x, s: fl.decode_step(dec, x, s, style),
        init_model_state=fl.initial_state(batch * K, cfg),
        start_token=1, end_token=2, k=K,
        max_seq_length=cfg.max_seq_length, vocab_size=cfg.vocab_size,
        batch=batch, first_input=feats)

    def topk_step(x, state):
        h, c = state
        vals, idx, h2, c2 = fused_decode_step_topk(
            dec, x, h, c, style, ktop=K, row_block=batch * K, v_tile=64,
            interpret=True)
        return vals, idx, (h2, c2)

    fused = beam_search_batched(
        embed_fn=lambda t: fl.embed(dec, t),
        step_fn=None,
        init_model_state=fl.initial_state(batch * K, cfg),
        start_token=1, end_token=2, k=K,
        max_seq_length=cfg.max_seq_length, vocab_size=cfg.vocab_size,
        batch=batch, first_input=feats, step_topk_fn=topk_step)

    np.testing.assert_array_equal(np.asarray(fused.length),
                                  np.asarray(xla.length))
    np.testing.assert_array_equal(np.asarray(fused.tokens),
                                  np.asarray(xla.tokens))
    np.testing.assert_allclose(np.asarray(fused.score), np.asarray(xla.score),
                               rtol=1e-4, atol=1e-4)
