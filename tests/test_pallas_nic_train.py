"""Fused NIC training scan (ops/pallas_nic_train.py) vs XLA.

Interpret-mode exact-f32 parity for values AND gradients (torch [i,f,g,o]
gate order, tanh cell/h, shared b_ih/b_hh cotangent), one- and multi-tile
batches, plus model-glue equivalence through the real
``lstm.forward_hiddens``/``forward`` teacher-forced paths.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from icee_tpu.ops.pallas_nic_train import fused_nic_scan, reference_nic_scan

B, T, E, H = 16, 5, 12, 8


def _mk(key):
    ks = jax.random.split(key, 5)
    cell = {
        "W_ih": jax.random.normal(ks[0], (E, 4 * H), jnp.float32) * 0.4,
        "W_hh": jax.random.normal(ks[1], (H, 4 * H), jnp.float32) * 0.4,
        "b_ih": jax.random.normal(ks[2], (4 * H,), jnp.float32) * 0.1,
        "b_hh": jax.random.normal(ks[3], (4 * H,), jnp.float32) * 0.1,
    }
    x = jax.random.normal(ks[4], (B, T, E), jnp.float32)
    return cell, x


@pytest.mark.parametrize("tile_b", [None, 8])
def test_forward_matches_oracle(tile_b):
    cell, x = _mk(jax.random.PRNGKey(0))
    h_k = fused_nic_scan(cell, x, tile_b, True)
    h_r = reference_nic_scan(cell, x)
    np.testing.assert_allclose(np.asarray(h_k), np.asarray(h_r),
                               rtol=1e-6, atol=1e-6)


def test_grads_match_oracle():
    cell, x = _mk(jax.random.PRNGKey(1))
    kh = jax.random.normal(jax.random.PRNGKey(2), (B, T, H), jnp.float32)

    def loss_k(cell, x):
        return jnp.sum(fused_nic_scan(cell, x, 8, True) * kh)

    def loss_r(cell, x):
        return jnp.sum(reference_nic_scan(cell, x) * kh)

    gk = jax.grad(loss_k, argnums=(0, 1))(cell, x)
    gr = jax.grad(loss_r, argnums=(0, 1))(cell, x)
    for name in ("W_ih", "W_hh", "b_ih", "b_hh"):
        np.testing.assert_allclose(
            np.asarray(gk[0][name]), np.asarray(gr[0][name]),
            rtol=2e-5, atol=1e-6, err_msg=name)
    np.testing.assert_allclose(np.asarray(gk[1]), np.asarray(gr[1]),
                               rtol=2e-5, atol=1e-6)


def test_bias_grads_shared():
    """b_ih and b_hh must carry the identical cotangent (z sees their sum)."""
    cell, x = _mk(jax.random.PRNGKey(3))
    g = jax.grad(lambda c: jnp.sum(fused_nic_scan(c, x, None, True) ** 2))(
        cell)
    np.testing.assert_allclose(np.asarray(g["b_ih"]), np.asarray(g["b_hh"]))


def test_model_glue():
    """lstm.forward_hiddens/forward (fused) == the XLA scan through the real
    NIC params: feature step-0 input, dropout, head downstream — values and
    grads."""
    from icee_tpu.core.config import DecoderConfig
    from icee_tpu.models import lstm as nic

    cfg = DecoderConfig(vocab_size=40, embed_size=E, hidden_size=H,
                        factored_size=H, dropout=0.3)
    params = nic.init_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    captions = jnp.asarray(rng.integers(0, 40, (B, T)), jnp.int32)
    feats = jnp.asarray(rng.standard_normal((B, E)), jnp.float32)
    key = jax.random.PRNGKey(7)

    def run(fused):
        def loss(p):
            h = nic.forward_hiddens(p, cfg, captions, feats, 1.0, key,
                                    train=True, fused_scan=fused,
                                    interpret=True)
            logits = h @ p["linear_w"] + p["linear_b"]
            return jnp.sum(jax.nn.log_softmax(logits) ** 2) * 1e-3
        return loss(params), jax.grad(loss)(params)

    (v_f, g_f), (v_x, g_x) = run(True), run(False)
    np.testing.assert_allclose(np.asarray(v_f), np.asarray(v_x),
                               rtol=1e-6, atol=1e-7)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-5, atol=1e-6),
        g_f, g_x)


def test_forward_logits_glue():
    """nic.forward (tf=1, fused) returns the identical logits."""
    from icee_tpu.core.config import DecoderConfig
    from icee_tpu.models import lstm as nic

    cfg = DecoderConfig(vocab_size=40, embed_size=E, hidden_size=H,
                        factored_size=H, dropout=0.0)
    params = nic.init_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(1)
    captions = jnp.asarray(rng.integers(0, 40, (B, T)), jnp.int32)
    feats = jnp.asarray(rng.standard_normal((B, E)), jnp.float32)
    lf = nic.forward(params, cfg, captions, feats, 1.0, None, train=False,
                     fused_scan=True, interpret=True)
    lx = nic.forward(params, cfg, captions, feats, 1.0, None, train=False,
                     fused_scan=False)
    np.testing.assert_allclose(np.asarray(lf), np.asarray(lx),
                               rtol=1e-6, atol=1e-6)
