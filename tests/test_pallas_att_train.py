"""Fused attention training scan (ops/pallas_att_train.py) vs XLA oracle.

Interpret-mode parity for values AND gradients, both cell kinds, one- and
multi-tile batches.  The features cotangent is zero by design (frozen
spatial encoder) and excluded from the gradient comparison.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from icee_tpu.ops.pallas_att_train import (fused_att_scan,
                                           reference_att_scan)

B, T, P, A, FS, E, F, H = 16, 4, 5, 8, 12, 6, 8, 8


def _mk_params(kind, key):
    ks = jax.random.split(key, 16)
    n = lambda k, *s: jax.random.normal(k, s, jnp.float32) * 0.3  # noqa: E731
    att = {
        "dec_w": n(ks[0], H, A), "dec_b": n(ks[1], A),
        "full_w": n(ks[2], A, 1), "full_b": n(ks[3], 1),
        "fb_w": n(ks[4], H, FS), "fb_b": n(ks[5], FS),
    }
    if kind == "factored":
        cell = {
            "V_we": n(ks[6], E, 4 * F), "V_wc": n(ks[7], FS, 4 * F),
            "V_b": n(ks[8], 4, F),
            "S_w": n(ks[9], 4, F, F), "S_b": n(ks[10], 4, F),
            "U_w": n(ks[11], 4, F, H), "U_b": n(ks[12], 4, H),
            "W_w": n(ks[13], H, 4 * H), "W_b": n(ks[14], 4, H),
        }
    else:
        cell = {
            "W_ihe": n(ks[6], E, 4 * H), "W_ihc": n(ks[7], FS, 4 * H),
            "W_hh": n(ks[8], H, 4 * H),
            "b_ih": n(ks[9], 4 * H), "b_hh": n(ks[10], 4 * H),
        }
    return cell, att


def _mk_inputs(key):
    ks = jax.random.split(key, 5)
    emb = jax.random.normal(ks[0], (B, T, E), jnp.float32)
    att1 = jax.random.normal(ks[1], (B, P, A), jnp.float32)
    feats = jax.random.normal(ks[2], (B, P, FS), jnp.float32)
    h0 = jax.random.normal(ks[3], (B, H), jnp.float32) * 0.5
    c0 = jax.random.normal(ks[4], (B, H), jnp.float32) * 0.5
    return emb, att1, feats, h0, c0


@pytest.mark.parametrize("kind", ["factored", "lstm"])
@pytest.mark.parametrize("tile_b", [8, 16])
def test_forward_matches_oracle(kind, tile_b):
    cell, att = _mk_params(kind, jax.random.PRNGKey(0))
    emb, att1, feats, h0, c0 = _mk_inputs(jax.random.PRNGKey(1))
    h_k, a_k = fused_att_scan(cell, att, emb, att1, feats, h0, c0,
                              kind, tile_b, True)
    h_r, a_r = reference_att_scan(cell, att, emb, att1, feats, h0, c0, kind)
    np.testing.assert_allclose(np.asarray(h_k), np.asarray(h_r),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(a_k), np.asarray(a_r),
                               rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("kind", ["factored", "lstm"])
def test_grads_match_oracle(kind):
    cell, att = _mk_params(kind, jax.random.PRNGKey(2))
    emb, att1, feats, h0, c0 = _mk_inputs(jax.random.PRNGKey(3))
    kh = jax.random.normal(jax.random.PRNGKey(4), (B, T, H), jnp.float32)
    ka = jax.random.normal(jax.random.PRNGKey(5), (B, T, P), jnp.float32)

    def loss_kernel(cell, att, emb, att1, h0, c0):
        h, a = fused_att_scan(cell, att, emb, att1, feats, h0, c0,
                              kind, 8, True)
        return jnp.sum(h * kh) + jnp.sum(a * ka)

    def loss_ref(cell, att, emb, att1, h0, c0):
        h, a = reference_att_scan(cell, att, emb, att1, feats, h0, c0, kind)
        return jnp.sum(h * kh) + jnp.sum(a * ka)

    gk = jax.grad(loss_kernel, argnums=(0, 1, 2, 3, 4, 5))(
        cell, att, emb, att1, h0, c0)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2, 3, 4, 5))(
        cell, att, emb, att1, h0, c0)
    flat_k, _ = jax.tree_util.tree_flatten_with_path(gk)
    flat_r, _ = jax.tree_util.tree_flatten_with_path(gr)
    for (path, vk), (_, vr) in zip(flat_k, flat_r):
        np.testing.assert_allclose(
            np.asarray(vk), np.asarray(vr), rtol=2e-4, atol=2e-4,
            err_msg=f"grad mismatch at {jax.tree_util.keystr(path)}")


def test_features_cotangent_is_zero():
    cell, att = _mk_params("factored", jax.random.PRNGKey(6))
    emb, att1, feats, h0, c0 = _mk_inputs(jax.random.PRNGKey(7))

    def loss(feats):
        h, _ = fused_att_scan(cell, att, emb, att1, feats, h0, c0,
                              "factored", 8, True)
        return jnp.sum(h)

    g = jax.grad(loss)(feats)
    assert float(jnp.max(jnp.abs(g))) == 0.0


def test_bad_tile_raises():
    cell, att = _mk_params("factored", jax.random.PRNGKey(8))
    emb, att1, feats, h0, c0 = _mk_inputs(jax.random.PRNGKey(9))
    with pytest.raises(ValueError, match="divisible"):
        fused_att_scan(cell, att, emb, att1, feats, h0, c0,
                       "factored", 7, True)


def test_model_glue_factored():
    """factored_att_forward_hiddens(fused_scan=True) == XLA branch, values
    and grads through the REAL model params (V split + style slicing)."""
    from icee_tpu.core.config import AttentionDecoderConfig
    from icee_tpu.models import attention as att_mod

    cfg = AttentionDecoderConfig(
        vocab_size=30, embed_size=E, hidden_size=H, factored_size=F,
        feature_size=FS, attention_size=A, dropout=0.0, num_styles=2)
    params = att_mod.init_factored_att_params(jax.random.PRNGKey(0), cfg)
    caps = jax.random.randint(jax.random.PRNGKey(1), (B, T), 0, 30)
    feats = jax.random.normal(jax.random.PRNGKey(2), (B, P, FS), jnp.float32)
    kh = jax.random.normal(jax.random.PRNGKey(3), (B, T, H), jnp.float32)
    ka = jax.random.normal(jax.random.PRNGKey(4), (B, T, P), jnp.float32)

    def loss(params, fused):
        h, a = att_mod.factored_att_forward_hiddens(
            params, cfg, caps, feats, 1, teacher_forcing_ratio=1.0,
            train=False, fused_scan=fused)
        return jnp.sum(h * kh) + jnp.sum(a * ka)

    vk, gk = jax.value_and_grad(lambda p: loss(p, True))(params)
    vr, gr = jax.value_and_grad(lambda p: loss(p, False))(params)
    np.testing.assert_allclose(float(vk), float(vr), rtol=1e-5)
    flat_k, _ = jax.tree_util.tree_flatten_with_path(gk)
    flat_r, _ = jax.tree_util.tree_flatten_with_path(gr)
    for (path, a_), (_, b_) in zip(flat_k, flat_r):
        np.testing.assert_allclose(
            np.asarray(a_), np.asarray(b_), rtol=2e-4, atol=2e-4,
            err_msg=f"grad mismatch at {jax.tree_util.keystr(path)}")


def test_model_glue_lstm():
    from icee_tpu.core.config import AttentionDecoderConfig
    from icee_tpu.models import attention as att_mod

    cfg = AttentionDecoderConfig(
        vocab_size=30, embed_size=E, hidden_size=H, factored_size=F,
        feature_size=FS, attention_size=A, dropout=0.0)
    params = att_mod.init_rnn_att_params(jax.random.PRNGKey(5), cfg)
    caps = jax.random.randint(jax.random.PRNGKey(6), (B, T), 0, 30)
    feats = jax.random.normal(jax.random.PRNGKey(7), (B, P, FS), jnp.float32)
    kh = jax.random.normal(jax.random.PRNGKey(8), (B, T, H), jnp.float32)

    def loss(params, fused):
        h, a = att_mod.rnn_att_forward_hiddens(
            params, cfg, caps, feats, teacher_forcing_ratio=1.0,
            train=False, fused_scan=fused)
        return jnp.sum(h * kh) + jnp.sum(a)

    vk, gk = jax.value_and_grad(lambda p: loss(p, True))(params)
    vr, gr = jax.value_and_grad(lambda p: loss(p, False))(params)
    np.testing.assert_allclose(float(vk), float(vr), rtol=1e-5)
    flat_k, _ = jax.tree_util.tree_flatten_with_path(gk)
    flat_r, _ = jax.tree_util.tree_flatten_with_path(gr)
    for (path, a_), (_, b_) in zip(flat_k, flat_r):
        np.testing.assert_allclose(
            np.asarray(a_), np.asarray(b_), rtol=2e-4, atol=2e-4,
            err_msg=f"grad mismatch at {jax.tree_util.keystr(path)}")


# --- scheduled-sampling variant ------------------------------------------

V = 30


def _mk_head(kind, key):
    ks = jax.random.split(key, 3)
    n = lambda k, *s: jax.random.normal(k, s, jnp.float32) * 0.3  # noqa: E731
    return {"C_w": n(ks[0], H, V), "C_b": n(ks[1], V), "B": n(ks[2], V, E)}


def _mk_sampled_inputs(key):
    ks = jax.random.split(key, 3)
    caps = jax.random.randint(ks[0], (B, T), 0, V)
    coins = jax.random.bernoulli(ks[1], 0.5, (T,)).astype(jnp.float32)
    return caps, coins


@pytest.mark.parametrize("kind", ["factored", "lstm"])
def test_sampled_forward_matches_oracle(kind):
    from icee_tpu.ops.pallas_att_train import (fused_att_scan_sampled,
                                               reference_att_scan_sampled)

    cell, att = _mk_params(kind, jax.random.PRNGKey(0))
    emb, att1, feats, h0, c0 = _mk_inputs(jax.random.PRNGKey(1))
    head = _mk_head(kind, jax.random.PRNGKey(2))
    caps, coins = _mk_sampled_inputs(jax.random.PRNGKey(3))
    emb_raw = jnp.take(head["B"], caps, axis=0)
    emb_drop = emb_raw * 1.25  # stand-in for the dropout-scaled teacher emb
    h_k, a_k = fused_att_scan_sampled(cell, att, head, emb_drop, emb_raw,
                                      att1, feats, h0, c0, coins,
                                      kind, 8, True)
    h_r, a_r = reference_att_scan_sampled(cell, att, head, emb_drop,
                                          emb_raw, att1, feats, h0, c0,
                                          coins, kind)
    np.testing.assert_allclose(np.asarray(h_k), np.asarray(h_r),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(a_k), np.asarray(a_r),
                               rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("kind", ["factored", "lstm"])
def test_sampled_grads_match_oracle(kind):
    from icee_tpu.ops.pallas_att_train import (fused_att_scan_sampled,
                                               reference_att_scan_sampled)

    cell, att = _mk_params(kind, jax.random.PRNGKey(4))
    emb, att1, feats, h0, c0 = _mk_inputs(jax.random.PRNGKey(5))
    head = _mk_head(kind, jax.random.PRNGKey(6))
    caps, coins = _mk_sampled_inputs(jax.random.PRNGKey(7))
    kh = jax.random.normal(jax.random.PRNGKey(8), (B, T, H), jnp.float32)
    ka = jax.random.normal(jax.random.PRNGKey(9), (B, T, P), jnp.float32)

    def loss_kernel(cell, att, head, emb_drop, emb_raw, att1, h0, c0):
        h, a = fused_att_scan_sampled(cell, att, head, emb_drop, emb_raw,
                                      att1, feats, h0, c0, coins,
                                      kind, 8, True)
        return jnp.sum(h * kh) + jnp.sum(a * ka)

    def loss_ref(cell, att, head, emb_drop, emb_raw, att1, h0, c0):
        h, a = reference_att_scan_sampled(cell, att, head, emb_drop,
                                          emb_raw, att1, feats, h0, c0,
                                          coins, kind)
        return jnp.sum(h * kh) + jnp.sum(a * ka)

    def mk_args(key):
        emb_raw = jnp.take(head["B"], caps, axis=0)
        return (cell, att, head, emb_raw * 1.25, emb_raw, att1, h0, c0)

    args = mk_args(None)
    gk = jax.grad(loss_kernel, argnums=tuple(range(8)))(*args)
    gr = jax.grad(loss_ref, argnums=tuple(range(8)))(*args)
    flat_k, _ = jax.tree_util.tree_flatten_with_path(gk)
    flat_r, _ = jax.tree_util.tree_flatten_with_path(gr)
    assert len(flat_k) == len(flat_r)
    for (path, vk), (_, vr) in zip(flat_k, flat_r):
        np.testing.assert_allclose(
            np.asarray(vk), np.asarray(vr), rtol=2e-4, atol=2e-4,
            err_msg=f"grad mismatch at {jax.tree_util.keystr(path)}")


@pytest.mark.parametrize("factored", [True, False])
def test_sampled_model_glue(factored):
    """forward_hiddens at tf<1 with fused_scan=True == XLA branch: values
    and grads through the real model params (argmax feedback + coin RNG)."""
    from icee_tpu.core.config import AttentionDecoderConfig
    from icee_tpu.models import attention as att_mod

    cfg = AttentionDecoderConfig(
        vocab_size=V, embed_size=E, hidden_size=H, factored_size=F,
        feature_size=FS, attention_size=A, dropout=0.3, num_styles=2)
    if factored:
        params = att_mod.init_factored_att_params(jax.random.PRNGKey(0), cfg)
        fwd = lambda p, fused: att_mod.factored_att_forward_hiddens(  # noqa: E731
            p, cfg, caps, feats, 1, teacher_forcing_ratio=0.5,
            rng=jax.random.PRNGKey(11), train=True, fused_scan=fused)
    else:
        params = att_mod.init_rnn_att_params(jax.random.PRNGKey(0), cfg)
        fwd = lambda p, fused: att_mod.rnn_att_forward_hiddens(  # noqa: E731
            p, cfg, caps, feats, teacher_forcing_ratio=0.5,
            rng=jax.random.PRNGKey(11), train=True, fused_scan=fused)
    caps = jax.random.randint(jax.random.PRNGKey(1), (B, T), 0, V)
    feats = jax.random.normal(jax.random.PRNGKey(2), (B, P, FS), jnp.float32)
    kh = jax.random.normal(jax.random.PRNGKey(3), (B, T, H), jnp.float32)
    ka = jax.random.normal(jax.random.PRNGKey(4), (B, T, P), jnp.float32)

    def loss(params, fused):
        h, a = fwd(params, fused)
        return jnp.sum(h * kh) + jnp.sum(a * ka)

    vk, gk = jax.value_and_grad(lambda p: loss(p, True))(params)
    vr, gr = jax.value_and_grad(lambda p: loss(p, False))(params)
    np.testing.assert_allclose(float(vk), float(vr), rtol=1e-5)
    flat_k, _ = jax.tree_util.tree_flatten_with_path(gk)
    flat_r, _ = jax.tree_util.tree_flatten_with_path(gr)
    for (path, a_), (_, b_) in zip(flat_k, flat_r):
        np.testing.assert_allclose(
            np.asarray(a_), np.asarray(b_), rtol=3e-4, atol=3e-4,
            err_msg=f"grad mismatch at {jax.tree_util.keystr(path)}")
