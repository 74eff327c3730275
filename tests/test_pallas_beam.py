"""Mega beam kernel (whole search in one pallas_call) vs the XLA beam.

All runs use interpret mode on CPU; the identical kernel compiles on TPU in
``bench.py``.  Equivalence chain:

- vs the XLA ``beam_search_batched`` driven by the per-step fused kernel
  (``fused_decode_step_topk`` in interpret mode): the streaming
  logsumexp/top-k math is shared code, so tokens/lengths/scores must match
  exactly,
- vs the pure-XLA ``beam_search_batched`` (``log_softmax`` + ``lax.top_k``):
  token-exact on the test seeds (float-order differs only in ulps).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from icee_tpu.core.config import DecoderConfig
from icee_tpu.decode.beam import beam_search_batched
from icee_tpu.models import factored_lstm as fl
from icee_tpu.ops.pallas_beam import mega_beam_decode
from icee_tpu.ops.pallas_decode import fused_decode_step_topk


def _make(vocab=512, e=32, h=64, f=64, seed=0):
    cfg = DecoderConfig(vocab_size=vocab, embed_size=e, hidden_size=h,
                        factored_size=f, max_seq_length=8)
    return cfg, fl.init_params(jax.random.PRNGKey(seed), cfg)


def _xla_beam(params, cfg, feats, style, batch, k, steps, fused,
              feed_feature=True):
    zeros = jnp.zeros((batch * k, cfg.hidden_size), jnp.float32)

    def topk_step(x, state):
        h, c = state
        vals, idx, h2, c2 = fused_decode_step_topk(
            params, x, h, c, style, ktop=k, row_block=batch * k,
            v_tile=128, interpret=True)
        return vals, idx, (h2, c2)

    return beam_search_batched(
        embed_fn=lambda t: fl.embed(params, t),
        step_fn=(None if fused
                 else (lambda x, s: fl.decode_step(params, x, s, style))),
        init_model_state=(zeros, zeros),
        start_token=1, end_token=2, k=k, max_seq_length=steps,
        vocab_size=cfg.vocab_size, batch=batch,
        first_input=feats if feed_feature else None,
        step_topk_fn=topk_step if fused else None)


@pytest.mark.parametrize("fused_ref,n_streams,topk_fold",
                         [(True, 1, False), (False, 1, False),
                          (False, 2, False), (False, 1, True)])
@pytest.mark.parametrize("style", [0, 2])
def test_mega_matches_xla_beam(rng, fused_ref, n_streams, topk_fold, style):
    cfg, params = _make()
    batch, k, steps = 6, 5, 8
    feats = jnp.asarray(
        rng.standard_normal((batch, k, cfg.embed_size)).astype(np.float32))
    style = jnp.asarray(style)

    want = _xla_beam(params, cfg, feats, style, batch, k, steps,
                     fused=fused_ref)
    got = mega_beam_decode(
        params, feats, style, batch, start_token=1, end_token=2, k=k,
        max_seq_length=steps, n_img_block=3 if n_streams == 1 else 2,
        n_streams=n_streams, v_tile=256 if topk_fold else 128,
        topk_fold=topk_fold, interpret=True)

    np.testing.assert_array_equal(np.asarray(got.tokens),
                                  np.asarray(want.tokens))
    np.testing.assert_array_equal(np.asarray(got.length),
                                  np.asarray(want.length))
    np.testing.assert_allclose(np.asarray(got.score), np.asarray(want.score),
                               rtol=1e-5, atol=1e-5)


def test_mega_research_mode_and_batch_padding(rng):
    """feed_feature=False (research semantics) + batch not divisible by the
    image block -> padded internally, outputs sliced back."""
    cfg, params = _make(seed=3)
    batch, k, steps = 5, 4, 7
    style = jnp.asarray(1)

    want = _xla_beam(params, cfg, None, style, batch, k, steps, fused=False,
                     feed_feature=False)
    got = mega_beam_decode(
        params, None, style, batch, start_token=1, end_token=2, k=k,
        max_seq_length=steps, n_img_block=4, v_tile=128,
        feed_feature=False, interpret=True)
    np.testing.assert_array_equal(np.asarray(got.tokens),
                                  np.asarray(want.tokens))
    np.testing.assert_array_equal(np.asarray(got.length),
                                  np.asarray(want.length))


def test_mega_ragged_vocab(rng):
    """vocab not a multiple of v_tile: padded head columns must never win."""
    cfg, params = _make(vocab=520, seed=5)
    batch, k, steps = 4, 3, 6
    feats = jnp.asarray(
        rng.standard_normal((batch, k, cfg.embed_size)).astype(np.float32))
    style = jnp.asarray(3)

    want = _xla_beam(params, cfg, feats, style, batch, k, steps, fused=False)
    got = mega_beam_decode(
        params, feats, style, batch, start_token=1, end_token=2, k=k,
        max_seq_length=steps, n_img_block=4, v_tile=128, interpret=True)
    np.testing.assert_array_equal(np.asarray(got.tokens),
                                  np.asarray(want.tokens))
    assert int(np.max(np.asarray(got.tokens))) < 520


def test_mega_early_termination(rng):
    """Bias the head hard toward <end>: every beam completes at step 1 and
    the done flag skips the rest of the grid without corrupting outputs."""
    cfg, params = _make(seed=7)
    params = dict(params)
    params["C_b"] = params["C_b"].at[2].set(50.0)  # <end> dominates
    batch, k, steps = 4, 5, 8
    feats = jnp.asarray(
        rng.standard_normal((batch, k, cfg.embed_size)).astype(np.float32))
    style = jnp.asarray(0)

    want = _xla_beam(params, cfg, feats, style, batch, k, steps, fused=False)
    got = mega_beam_decode(
        params, feats, style, batch, start_token=1, end_token=2, k=k,
        max_seq_length=steps, n_img_block=4, v_tile=128, interpret=True)
    np.testing.assert_array_equal(np.asarray(got.tokens),
                                  np.asarray(want.tokens))
    np.testing.assert_array_equal(np.asarray(got.length),
                                  np.asarray(want.length))
    assert np.all(np.asarray(got.length) == 2)  # <start> <end>


def test_mega_block_size_independence(rng):
    """Tokens must not depend on the image-block partitioning."""
    cfg, params = _make(seed=9)
    batch, k, steps = 6, 4, 6
    feats = jnp.asarray(
        rng.standard_normal((batch, k, cfg.embed_size)).astype(np.float32))
    style = jnp.asarray(1)
    outs = [
        mega_beam_decode(params, feats, style, batch, k=k,
                         max_seq_length=steps, n_img_block=nib,
                         n_streams=ns, v_tile=128, interpret=True)
        for nib, ns in ((2, 1), (6, 1), (6, 2), (3, 1))
    ]
    for o in outs[1:]:
        np.testing.assert_array_equal(np.asarray(o.tokens),
                                      np.asarray(outs[0].tokens))
        np.testing.assert_array_equal(np.asarray(o.length),
                                      np.asarray(outs[0].length))


def test_mega_nic_lstm_cell_matches_xla_beam(rng):
    """cell="lstm": the NIC (torch LSTMCell, h=o*tanh(c)) decoder through
    the mega kernel must match the XLA beam token-exactly."""
    from icee_tpu.models import lstm as nic

    cfg = DecoderConfig(vocab_size=512, embed_size=32, hidden_size=64,
                        factored_size=64, max_seq_length=8)
    params = nic.init_params(jax.random.PRNGKey(11), cfg)
    batch, k, steps = 6, 5, 8
    feats = jnp.asarray(
        rng.standard_normal((batch, k, cfg.embed_size)).astype(np.float32))
    zeros = jnp.zeros((batch * k, cfg.hidden_size), jnp.float32)

    want = beam_search_batched(
        embed_fn=lambda t: nic.embed(params, t),
        step_fn=lambda x, s: nic.decode_step(params, x, s),
        init_model_state=(zeros, zeros),
        start_token=1, end_token=2, k=k, max_seq_length=steps,
        vocab_size=cfg.vocab_size, batch=batch, first_input=feats)

    got = mega_beam_decode(
        params, feats, jnp.asarray(0), batch, start_token=1, end_token=2,
        k=k, max_seq_length=steps, n_img_block=3, v_tile=128, cell="lstm",
        interpret=True)
    np.testing.assert_array_equal(np.asarray(got.tokens),
                                  np.asarray(want.tokens))
    np.testing.assert_array_equal(np.asarray(got.length),
                                  np.asarray(want.length))
    np.testing.assert_allclose(np.asarray(got.score), np.asarray(want.score),
                               rtol=1e-5, atol=1e-5)


def test_mega_fuzz_random_configs(rng):
    """Randomized (dims, k, vocab, batch, blocks, streams) fuzz: the mega
    kernel must match the XLA beam token-exactly on every draw."""
    for trial in range(5):
        vocab = int(rng.integers(130, 700))
        e = int(rng.integers(8, 40))
        h = int(rng.integers(16, 80))
        k = int(rng.integers(2, 6))
        batch = int(rng.integers(2, 9))
        steps = int(rng.integers(3, 9))
        nib = int(rng.integers(1, batch + 1))
        ns = 2 if (nib % 2 == 0 and rng.random() < 0.5) else 1
        feed = bool(rng.random() < 0.7)
        cfg = DecoderConfig(vocab_size=vocab, embed_size=e, hidden_size=h,
                            factored_size=h, max_seq_length=steps)
        params = fl.init_params(jax.random.PRNGKey(trial), cfg)
        feats = jnp.asarray(
            rng.standard_normal((batch, k, e)).astype(np.float32))
        style = jnp.asarray(int(rng.integers(0, 4)))

        want = _xla_beam(params, cfg, feats if feed else None, style, batch,
                         k, steps, fused=False, feed_feature=feed)
        got = mega_beam_decode(
            params, feats if feed else None, style, batch, start_token=1,
            end_token=2, k=k, max_seq_length=steps, n_img_block=nib,
            n_streams=ns, v_tile=128, feed_feature=feed, interpret=True)
        ctx = dict(trial=trial, vocab=vocab, e=e, h=h, k=k, batch=batch,
                   steps=steps, nib=nib, ns=ns, feed=feed)
        np.testing.assert_array_equal(np.asarray(got.tokens),
                                      np.asarray(want.tokens), err_msg=str(ctx))
        np.testing.assert_array_equal(np.asarray(got.length),
                                      np.asarray(want.length), err_msg=str(ctx))


def test_mega_all_tied_logits(rng):
    """Degenerate tie storm: zero output head (every vocab word exactly
    tied every step) must still match the XLA beam token-exactly — the
    in-kernel candidate merge, streaming top-k and best-completed tracking
    all resolve ties by lowest index, like lax.top_k."""
    cfg, params = _make(seed=9)
    params = dict(params)
    params["C_w"] = jnp.zeros_like(params["C_w"])
    params["C_b"] = jnp.zeros_like(params["C_b"])
    batch, k, steps = 4, 4, 6
    feats = jnp.asarray(
        rng.standard_normal((batch, k, cfg.embed_size)).astype(np.float32))
    style = jnp.asarray(1)

    want = _xla_beam(params, cfg, feats, style, batch, k, steps, fused=False)
    for fold, vt in ((False, 128), (True, 256)):
        got = mega_beam_decode(
            params, feats, style, batch, start_token=1, end_token=2, k=k,
            max_seq_length=steps, n_img_block=2, v_tile=vt,
            topk_fold=fold, interpret=True)
        np.testing.assert_array_equal(np.asarray(got.tokens),
                                      np.asarray(want.tokens))
        np.testing.assert_array_equal(np.asarray(got.length),
                                      np.asarray(want.length))
