"""Fused SentiCap training scan (ops/pallas_senticap_train.py) vs XLA.

Interpret-mode exact-f32 parity for values AND gradients (incl. the
GradClip-on-h backward semantics, ``mrnn_util.py:78-98``), one- and
multi-tile batches, plus model-glue equivalence through the real
``forward(return_hiddens=True)`` paths.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from icee_tpu.ops.pallas_senticap_train import (fused_senticap_scan,
                                                reference_senticap_scan)

B, T, E, H = 16, 5, 12, 8


def _mk(key):
    ks = jax.random.split(key, 2)
    w = jax.random.normal(ks[0], (E + H, 4 * H), jnp.float32) * 0.4
    x = jax.random.normal(ks[1], (B, T, E), jnp.float32)
    return w, x


@pytest.mark.parametrize("tile_b", [None, 8])
def test_forward_matches_oracle(tile_b):
    w, x = _mk(jax.random.PRNGKey(0))
    h_k = fused_senticap_scan(w, x, 5.0, tile_b, True)
    h_r = reference_senticap_scan(w, x)
    np.testing.assert_allclose(np.asarray(h_k), np.asarray(h_r),
                               rtol=1e-6, atol=1e-6)


@pytest.mark.parametrize("gclip", [5.0, 0.01])
def test_grads_match_oracle(gclip):
    """gclip=0.01 forces the clamp to actually bind so a wrong clip
    placement cannot pass."""
    w, x = _mk(jax.random.PRNGKey(1))
    # larger weights so recurrent grads exceed 0.01
    w = w * 3.0
    kh = jax.random.normal(jax.random.PRNGKey(2), (B, T, H), jnp.float32)

    def loss_k(w, x):
        return jnp.sum(fused_senticap_scan(w, x, gclip, 8, True) * kh)

    def loss_r(w, x):
        return jnp.sum(reference_senticap_scan(w, x, gclip) * kh)

    gk = jax.grad(loss_k, argnums=(0, 1))(w, x)
    gr = jax.grad(loss_r, argnums=(0, 1))(w, x)
    for a, b in zip(gk, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-5, atol=1e-6)


def test_clip_actually_binds():
    """Sanity that the gclip=0.01 case above exercises the clamp: the
    unclipped recurrent gradient must exceed the bound somewhere."""
    w, x = _mk(jax.random.PRNGKey(1))
    w = w * 3.0
    kh = jax.random.normal(jax.random.PRNGKey(2), (B, T, H), jnp.float32)
    g_tight = jax.grad(lambda w: jnp.sum(
        reference_senticap_scan(w, x, 0.01) * kh))(w)
    g_loose = jax.grad(lambda w: jnp.sum(
        reference_senticap_scan(w, x, 1e9) * kh))(w)
    assert not np.allclose(np.asarray(g_tight), np.asarray(g_loose))


@pytest.mark.parametrize("switched", [False, True])
def test_model_glue(switched):
    """forward(return_hiddens=True, fused) == the XLA scan through the real
    params: values and grads (visual step-0 pseudo-word, both dropout
    masks, the switch gate and both heads downstream)."""
    from icee_tpu.senticap import model as M
    from icee_tpu.senticap import switched as SW
    from icee_tpu.senticap.config import senticap_conf

    conf = senticap_conf(emb_size=E, lstm_hidden_size=H, visual_size=10)
    vocab = 30
    rng = np.random.default_rng(0)
    base = M.init_params(jax.random.PRNGKey(0), vocab, conf)
    words = jnp.asarray(rng.integers(0, vocab, (B, T)), jnp.int32)
    v = jnp.asarray(rng.standard_normal((B, 10)).astype(np.float32))
    x_drop = jnp.asarray(rng.integers(0, 2, (B, T, E)).astype(np.float32)) * 2
    y_drop = jnp.asarray(rng.integers(0, 2, (B, T, H)).astype(np.float32)) * 2
    kh = jax.random.normal(jax.random.PRNGKey(3), (B, T, H), jnp.float32)

    if switched:
        params = SW.init_params(jax.random.PRNGKey(1), vocab, conf,
                                base=base)
        params["w_lstm_sw"] = params["w_lstm_sw"] + 0.2 * jax.random.normal(
            jax.random.PRNGKey(9), params["w_lstm_sw"].shape)

        def loss(p, fused):
            c = dict(conf, FUSED_SCAN=fused)
            (hh_o, hh_n, att), la, l1a = SW.forward(
                p, c, words, v, jnp.asarray(1.0), x_drop, y_drop,
                return_hiddens=True)
            return (jnp.sum(hh_o * kh) + jnp.sum(hh_n * kh)
                    + jnp.sum(att) + jnp.sum(la))
    else:
        params = base

        def loss(p, fused):
            c = dict(conf, FUSED_SCAN=fused)
            hh = M.forward(p, c, words, v, True, x_drop, y_drop,
                           return_hiddens=True)
            return jnp.sum(hh * kh)

    vk, gk = jax.value_and_grad(lambda p: loss(p, True))(params)
    vr, gr = jax.value_and_grad(lambda p: loss(p, False))(params)
    np.testing.assert_allclose(float(vk), float(vr), rtol=1e-6)
    flat_k, _ = jax.tree_util.tree_flatten_with_path(gk)
    flat_r, _ = jax.tree_util.tree_flatten_with_path(gr)
    for (path, a), (_, b_) in zip(flat_k, flat_r):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b_), rtol=2e-5, atol=1e-6,
            err_msg=f"grad mismatch at {jax.tree_util.keystr(path)}")
