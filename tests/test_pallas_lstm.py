"""Fused training-scan kernel vs the XLA scan + jax.grad oracle
(interpret mode on CPU; the same kernels compile on TPU in bench.py)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from icee_tpu.core.config import DecoderConfig
from icee_tpu.models import factored_lstm as fl
from icee_tpu.ops.pallas_lstm import fused_factored_scan, reference_scan

CELL_KEYS = ("V_w", "V_b", "S_w", "S_b", "U_w", "U_b", "W_w", "W_b")


def _sliced_params(seed=0, vocab=128, e=24, h=40, f=32, style=1):
    cfg = DecoderConfig(vocab_size=vocab, embed_size=e, hidden_size=h,
                        factored_size=f)
    params = fl.init_params(jax.random.PRNGKey(seed), cfg)
    sliced = {k: params[k] for k in CELL_KEYS}
    sliced["S_w"] = params["S_w"][style]
    sliced["S_b"] = params["S_b"][style]
    return sliced


def test_forward_matches_xla_scan(rng):
    p = _sliced_params()
    x = jnp.asarray(rng.standard_normal((6, 7, 24)).astype(np.float32))
    got = fused_factored_scan(p, x, True)
    want = reference_scan(p, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_gradients_match_autodiff(rng):
    p = _sliced_params(seed=2)
    x = jnp.asarray(rng.standard_normal((4, 5, 24)).astype(np.float32))
    tgt = jnp.asarray(rng.standard_normal((4, 5, 40)).astype(np.float32))

    def loss_fused(p, x):
        h = fused_factored_scan(p, x, True)
        return jnp.sum((h - tgt) ** 2) + 0.1 * jnp.sum(h[:, -1] ** 3)

    def loss_ref(p, x):
        h = reference_scan(p, x)
        return jnp.sum((h - tgt) ** 2) + 0.1 * jnp.sum(h[:, -1] ** 3)

    (gp_f, gx_f) = jax.grad(loss_fused, argnums=(0, 1))(p, x)
    (gp_r, gx_r) = jax.grad(loss_ref, argnums=(0, 1))(p, x)

    np.testing.assert_allclose(np.asarray(gx_f), np.asarray(gx_r),
                               rtol=2e-4, atol=2e-4)
    for k in CELL_KEYS:
        np.testing.assert_allclose(
            np.asarray(gp_f[k]), np.asarray(gp_r[k]), rtol=2e-4, atol=2e-4,
            err_msg=f"grad mismatch for {k}")


def test_style_slice_gradient_scatters(rng):
    """Slicing S outside the custom_vjp must scatter grads back to only the
    selected style row of the stacked tensors."""
    cfg = DecoderConfig(vocab_size=64, embed_size=16, hidden_size=24,
                        factored_size=16)
    params = fl.init_params(jax.random.PRNGKey(3), cfg)
    x = jnp.asarray(rng.standard_normal((3, 4, 16)).astype(np.float32))
    style = 2

    def loss(params):
        p = {k: params[k] for k in CELL_KEYS}
        p["S_w"] = params["S_w"][style]
        p["S_b"] = params["S_b"][style]
        h = fused_factored_scan(p, x, True)
        return jnp.sum(h ** 2)

    g = jax.grad(loss)(params)
    sw = np.asarray(g["S_w"])
    assert np.all(sw[style] != 0.0) or np.any(sw[style] != 0.0)
    for s in range(sw.shape[0]):
        if s != style:
            assert np.all(sw[s] == 0.0)
    assert np.all(np.asarray(g["B"]) == 0.0)  # embedding untouched


@pytest.mark.parametrize("steps", [1, 3])
def test_short_sequences(rng, steps):
    p = _sliced_params(seed=4)
    x = jnp.asarray(rng.standard_normal((2, steps, 24)).astype(np.float32))
    got = fused_factored_scan(p, x, True)
    want = reference_scan(p, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_train_step_with_fused_scan_matches_xla(rng):
    """Full factual train step (encoder head + scan + loss + Adam) with
    fused_scan=True must match the XLA-scan step."""
    import optax
    from icee_tpu.core.config import EncoderConfig, TrainConfig
    from icee_tpu.models import encoder as enc_mod
    from icee_tpu.train.steps import make_caption_steps

    cfg = DecoderConfig(vocab_size=64, embed_size=16, hidden_size=24,
                        factored_size=16, dropout=0.0)
    b, t = 4, 6
    pooled = jnp.asarray(rng.standard_normal((b, 32)).astype(np.float32))
    captions = jnp.asarray(rng.integers(0, 64, (b, t)).astype(np.int32))
    lengths = jnp.asarray([6, 5, 4, 6], jnp.int32)
    mask = jnp.ones((b,), bool)
    key = jax.random.PRNGKey(0)

    outs = {}
    for fused in (False, True):
        tcfg = TrainConfig(teacher_forcing_ratio=1.0, fused_scan=fused)
        opt = optax.adam(1e-3)
        fac_step, _, _ = make_caption_steps(cfg, tcfg, opt, opt,
                                            factored=True)
        dec = fl.init_params(jax.random.PRNGKey(1), cfg)
        head = enc_mod.init_head_params(
            jax.random.PRNGKey(2),
            EncoderConfig(embed_size=cfg.embed_size, feature_size=32))
        opt_state = opt.init((dec, head))
        dec2, head2, _, loss = fac_step(
            dec, head, opt_state, pooled, captions, lengths, mask, key)
        outs[fused] = (loss, dec2)

    np.testing.assert_allclose(float(outs[True][0]), float(outs[False][0]),
                               rtol=1e-5)
    for k in CELL_KEYS + ("C_w", "B"):
        np.testing.assert_allclose(
            np.asarray(outs[True][1][k]), np.asarray(outs[False][1][k]),
            rtol=1e-4, atol=1e-5, err_msg=f"param {k} diverged")
