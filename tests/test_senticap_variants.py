"""C4 (adversarial) and C5 (encoder-decoder) SentiCap variants."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from icee_tpu.senticap import adversarial as ADV
from icee_tpu.senticap import encode_decode as ED

VOCAB = 25


@pytest.fixture
def conf():
    return ADV.adv_conf(emb_size=20, lstm_hidden_size=16, visual_size=10,
                        style_len=8, MAX_SENTENCE_LEN=5,
                        DROP_INPUT=False, DROP_OUTPUT=False)


def test_grad_reverse_negates_gradient(rng):
    x = jnp.asarray(rng.standard_normal((3,)).astype(np.float32))
    g = jax.grad(lambda a: jnp.sum(ADV.grad_reverse(a) * 2.0))(x)
    np.testing.assert_allclose(np.asarray(g), -2.0)


def test_adv_forward_styles_condition_output(rng, conf):
    params = ADV.init_params(jax.random.PRNGKey(0), VOCAB, conf)
    words = jnp.asarray(rng.integers(0, VOCAB, (2, 6)), jnp.int32)
    v = jnp.asarray(rng.standard_normal((2, 10)).astype(np.float32))
    s0 = ADV.forward(params, conf, words, v, jnp.asarray([0, 0]))
    s1 = ADV.forward(params, conf, words, v, jnp.asarray([1, 1]))
    assert s0.shape == (2, 6, VOCAB)
    np.testing.assert_allclose(np.asarray(s0.sum(-1)), 1.0, rtol=1e-5)
    assert not np.allclose(np.asarray(s0), np.asarray(s1))


def test_msq_adversarial_gradient_direction(rng, conf):
    """Gradient reversal: the style table's gradient from the MSQ loss must
    be the NEGATIVE of the direct (non-reversed) regression gradient."""
    params = ADV.init_params(jax.random.PRNGKey(0), VOCAB, conf)
    v = jnp.asarray(rng.standard_normal((4, 10)).astype(np.float32))
    idx = jnp.asarray([0, 1, 0, 1])

    def loss_rev(style):
        p = dict(params)
        p["style"] = style
        l, _ = ADV.adversarial_loss(p, conf, v, idx)
        return l

    def loss_direct(style):
        p = dict(params)
        sty = jnp.take(style, idx, axis=0)
        v_guess = sty @ p["wsty_to_img"] + p["bsty_to_img"]
        v_real = v @ p["wvm"]
        return (jnp.sum((v_guess - v_real) ** 2) / v.shape[0]
                * conf["style_to_image_loss_factor"])

    g_rev = jax.grad(loss_rev)(params["style"])
    g_dir = jax.grad(loss_direct)(params["style"])
    np.testing.assert_allclose(np.asarray(g_rev), -np.asarray(g_dir),
                               rtol=1e-4, atol=1e-6)


def test_batch_image_loss_accuracy(rng, conf):
    conf2 = dict(conf)
    conf2["MSQ_LOSS"] = False
    conf2["BATCH_IMAGE_LOSS"] = True
    params = ADV.init_params(jax.random.PRNGKey(0), VOCAB, conf2)
    v = jnp.asarray(rng.standard_normal((4, 10)).astype(np.float32))
    loss, acc = ADV.adversarial_loss(params, conf2, v, jnp.asarray([0, 1, 0, 1]))
    assert np.isfinite(float(loss)) and 0.0 <= float(acc) <= 1.0


def test_adv_total_loss_trains(rng, conf):
    import optax

    params = ADV.init_params(jax.random.PRNGKey(0), VOCAB, conf)
    words = jnp.asarray(rng.integers(0, VOCAB, (4, 6)), jnp.int32)
    y = jnp.asarray(rng.integers(0, VOCAB, (4, 6)), jnp.int32)
    mask = jnp.ones((4, 6))
    v = jnp.asarray(rng.standard_normal((4, 10)).astype(np.float32))
    idx = jnp.asarray([0, 1, 0, 1])
    tx = optax.adam(1e-2)
    state = tx.init(params)
    losses = []
    for _ in range(10):
        loss, grads = jax.value_and_grad(ADV.total_loss)(
            params, conf, words, y, mask, v, idx)
        updates, state = tx.update(grads, state, params)
        params = optax.apply_updates(params, updates)
        losses.append(float(loss))
    assert losses[-1] < losses[0]


def test_encdec_conditions_on_encoder_words(rng):
    conf = ED.encdec_conf(emb_size=14, lstm_hidden_size=12, visual_size=8,
                          MAX_SENTENCE_LEN=5, DROP_INPUT=False,
                          DROP_OUTPUT=False)
    params = ED.init_params(jax.random.PRNGKey(0), VOCAB, conf)
    words = jnp.asarray(rng.integers(0, VOCAB, (2, 6)), jnp.int32)
    enc1 = jnp.asarray(rng.integers(0, VOCAB, (2, 5)), jnp.int32)
    enc2 = (enc1 + 3) % VOCAB
    v = jnp.asarray(rng.standard_normal((2, 8)).astype(np.float32))
    s1 = ED.forward(params, conf, words, enc1, v)
    s2 = ED.forward(params, conf, words, enc2, v)
    assert s1.shape == (2, 6, VOCAB)
    np.testing.assert_allclose(np.asarray(s1.sum(-1)), 1.0, rtol=1e-5)
    # different encoder sentences -> different decoder distributions
    assert not np.allclose(np.asarray(s1), np.asarray(s2))
    l = ED.loss(params, conf, words, words, jnp.ones((2, 6)), enc1, v)
    assert np.isfinite(float(l))
