"""Pallas fused decode-step kernel vs the XLA reference path (interpret mode
on CPU; the same kernel compiles on TPU for bench.py)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from icee_tpu.core.config import DecoderConfig
from icee_tpu.models import factored_lstm as fl
from icee_tpu.ops.pallas_decode import fused_decode_step_topk, reference_step_topk


@pytest.mark.parametrize("style", [0, 3])
@pytest.mark.parametrize("vocab,v_tile", [(512, 128), (640, 256)])
def test_fused_step_matches_reference(rng, style, vocab, v_tile):
    cfg = DecoderConfig(vocab_size=vocab, embed_size=32, hidden_size=64,
                        factored_size=64)
    params = fl.init_params(jax.random.PRNGKey(0), cfg)
    rows = 16
    x = jnp.asarray(rng.standard_normal((rows, 32)).astype(np.float32))
    h = jnp.asarray(rng.standard_normal((rows, 64)).astype(np.float32))
    c = jnp.asarray(rng.standard_normal((rows, 64)).astype(np.float32))

    want_v, want_i, want_h, want_c = reference_step_topk(
        params, x, h, c, jnp.asarray(style))
    got_v, got_i, got_h, got_c = fused_decode_step_topk(
        params, x, h, c, jnp.asarray(style), ktop=5, row_block=16,
        v_tile=v_tile, interpret=True)

    np.testing.assert_array_equal(np.asarray(got_i), np.asarray(want_i))
    np.testing.assert_allclose(np.asarray(got_v), np.asarray(want_v),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(got_h), np.asarray(want_h),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(got_c), np.asarray(want_c),
                               rtol=1e-5, atol=1e-5)


def test_fused_step_tie_breaking(rng):
    """Duplicate logits rows must resolve ties to the lowest vocab index,
    like lax.top_k."""
    cfg = DecoderConfig(vocab_size=256, embed_size=16, hidden_size=32,
                        factored_size=32)
    params = fl.init_params(jax.random.PRNGKey(1), cfg)
    # force massive ties: zero C so all logits equal C_b; set C_b constant
    params = dict(params)
    params["C_w"] = jnp.zeros_like(params["C_w"])
    params["C_b"] = jnp.zeros_like(params["C_b"])
    rows = 8
    x = jnp.asarray(rng.standard_normal((rows, 16)).astype(np.float32))
    h = jnp.zeros((rows, 32))
    c = jnp.zeros((rows, 32))
    got_v, got_i, _, _ = fused_decode_step_topk(
        params, x, h, c, jnp.asarray(0), ktop=5, row_block=8, v_tile=64,
        interpret=True)
    want_v, want_i, _, _ = reference_step_topk(params, x, h, c, jnp.asarray(0))
    np.testing.assert_array_equal(np.asarray(got_i), np.asarray(want_i))
    # ties at uniform distribution: logp = -log(256)
    np.testing.assert_allclose(np.asarray(got_v), -np.log(256.0), rtol=1e-5)
