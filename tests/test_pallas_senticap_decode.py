"""SentiCap mega decode kernel vs the XLA device beam and the host oracle.

The kernel (``ops/pallas_senticap_decode.py``) must be token- AND
score-exact against ``senticap/beam.make_device_beam`` (itself proved
token-equivalent to the host ``beam_decode`` reimplementation of
``mrnn_algorithms.py:114-209``).  Interpret mode on CPU; hardware timing
lives in ``bench.py`` / ``scripts/check_senticap_mega.py``.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from icee_tpu.ops.pallas_senticap_decode import mega_senticap_beam_decode
from icee_tpu.senticap import model as sc_model
from icee_tpu.senticap.beam import beam_decode, make_device_beam
from icee_tpu.senticap.config import senticap_conf
from icee_tpu.senticap.train import make_beam_step


def _setup(vocab=96, emb=16, hidden=16, visual=24, seed=0):
    conf = senticap_conf(emb_size=emb, lstm_hidden_size=hidden,
                         visual_size=visual)
    params = sc_model.init_params(jax.random.PRNGKey(seed), vocab, conf)
    return conf, params


@pytest.mark.parametrize("beam,batch,max_len,n_img_block,n_streams",
                         [(5, 5, 6, 2, 1),   # padding: 5 imgs in 2-blocks
                          (20, 3, 8, 3, 1),  # the reference beam width
                          (5, 4, 4, 4, 2),   # two interleaved streams
                          (5, 4, 4, 4, 1)])
def test_mega_matches_device_beam(beam, batch, max_len, n_img_block,
                                  n_streams):
    conf, params = _setup()
    rng = np.random.default_rng(7)
    v = jnp.asarray(rng.standard_normal((batch, conf["visual_size"])),
                    jnp.float32)

    make = make_beam_step(params, conf, switched=False)
    dec = make_device_beam(make(0.0), conf["lstm_hidden_size"],
                           beam_size=beam, max_len=max_len)
    want_sc, want_seq, want_len, _ = jax.jit(jax.vmap(dec.run))(v)

    got_sc, got_seq, got_len = mega_senticap_beam_decode(
        params, v, batch, beam_size=beam, max_len=max_len,
        n_img_block=n_img_block, n_streams=n_streams, interpret=True)

    for i in range(batch):
        n = int(want_len[i])
        assert int(got_len[i]) == n, f"img {i} length"
        assert (np.asarray(got_seq[i][:n]).tolist()
                == np.asarray(want_seq[i][:n]).tolist()), f"img {i} tokens"
        np.testing.assert_allclose(float(got_sc[i]), float(want_sc[i]),
                                   rtol=1e-6)


def test_mega_matches_host_oracle():
    """Directly against the host loop (the reference's compiled-one_step
    protocol re-implementation) — one image, reference beam width."""
    conf, params = _setup(seed=3)
    rng = np.random.default_rng(11)
    v = rng.standard_normal((conf["visual_size"],)).astype(np.float32)

    make = make_beam_step(params, conf, switched=False)

    def host_step(words, use_v, h, c):
        b = np.asarray(words).shape[0]
        hh = jnp.zeros((b, conf["lstm_hidden_size"])) if h is None else h
        cc = jnp.zeros((b, conf["lstm_hidden_size"])) if c is None else c
        return make(0.0)(jnp.asarray(words), jnp.asarray(bool(use_v)),
                         jnp.asarray(hh), jnp.asarray(cc), jnp.asarray(v))

    want_sc, want_words = beam_decode(host_step, v, beam_size=20, max_len=10)

    got_sc, got_seq, got_len = mega_senticap_beam_decode(
        params, jnp.asarray(v)[None, :], 1, beam_size=20, max_len=10,
        n_img_block=1, interpret=True)
    n = int(got_len[0])
    assert np.asarray(got_seq[0][:n]).tolist() == want_words
    np.testing.assert_allclose(float(got_sc[0]), want_sc, rtol=1e-6)


def test_mega_multi_tile_vocab():
    """Vocab spanning several v_tiles exercises the streaming (max, sumexp)
    rescale and the cross-tile top-k merge."""
    conf, params = _setup(vocab=200, seed=5)
    rng = np.random.default_rng(13)
    batch = 3
    v = jnp.asarray(rng.standard_normal((batch, conf["visual_size"])),
                    jnp.float32)

    make = make_beam_step(params, conf, switched=False)
    dec = make_device_beam(make(0.0), conf["lstm_hidden_size"],
                           beam_size=6, max_len=7)
    _, want_seq, want_len, _ = jax.jit(jax.vmap(dec.run))(v)

    _, got_seq, got_len = mega_senticap_beam_decode(
        params, v, batch, beam_size=6, max_len=7, n_img_block=3,
        v_tile=128, interpret=True)
    for i in range(batch):
        n = int(want_len[i])
        assert int(got_len[i]) == n
        assert (np.asarray(got_seq[i][:n]).tolist()
                == np.asarray(want_seq[i][:n]).tolist())


def test_mega_saturated_tail_ties():
    """A peaked head drives most tokens' probability below 1e-37, where the
    host's nll plateaus at -log2(1e-37) and ties break by token INDEX.
    Selecting top-k by raw logits would misorder these; the kernel's
    two-pass nll top-k must match."""
    conf, params = _setup(seed=9)
    params = dict(params)
    # huge bias on a handful of tokens -> everything else saturates
    b = np.full((96,), -200.0, np.float32)
    b[:4] = np.asarray([50.0, 49.0, 48.0, 47.0])
    params["b"] = jnp.asarray(b)

    rng = np.random.default_rng(17)
    batch = 2
    v = jnp.asarray(rng.standard_normal((batch, conf["visual_size"])),
                    jnp.float32)
    make = make_beam_step(params, conf, switched=False)
    dec = make_device_beam(make(0.0), conf["lstm_hidden_size"],
                           beam_size=8, max_len=5)
    want_sc, want_seq, want_len, _ = jax.jit(jax.vmap(dec.run))(v)

    got_sc, got_seq, got_len = mega_senticap_beam_decode(
        params, v, batch, beam_size=8, max_len=5, n_img_block=2,
        interpret=True)
    for i in range(batch):
        n = int(want_len[i])
        assert int(got_len[i]) == n
        assert (np.asarray(got_seq[i][:n]).tolist()
                == np.asarray(want_seq[i][:n]).tolist())
        np.testing.assert_allclose(float(got_sc[i]), float(want_sc[i]),
                                   rtol=1e-6)


# --- switched two-LSTM mega kernel (VERDICT r4 #1) --------------------------

from icee_tpu.ops.pallas_senticap_switched_decode import (  # noqa: E402
    mega_senticap_switched_decode,
)
from icee_tpu.senticap import switched as sw_model  # noqa: E402


def _setup_switched(vocab=96, emb=16, hidden=16, visual=24, seed=0):
    conf = senticap_conf(emb_size=emb, lstm_hidden_size=hidden,
                         visual_size=visual)
    base = sc_model.init_params(jax.random.PRNGKey(seed), vocab, conf)
    params = sw_model.init_params(jax.random.PRNGKey(seed + 1), vocab, conf,
                                  base=base)
    # perturb the sentiment path so the mixture actually matters (init
    # copies the base weights into the duplicates)
    k = jax.random.PRNGKey(seed + 2)
    for name in ("w_lstm_sw", "w_sw", "wemb_sw", "wvm_sw"):
        k, k2 = jax.random.split(k)
        params[name] = params[name] + 0.3 * jax.random.normal(
            k2, params[name].shape)
    params["att_w"] = params["att_w"] * 4.0   # spread the gate off 0.5
    return conf, params


def _switched_want(conf, params, v, beam, max_len):
    make = make_beam_step(params, conf, switched=True)
    dec = make_device_beam(make(1.0), 2 * conf["lstm_hidden_size"],
                           beam_size=beam, max_len=max_len,
                           with_attention=True)
    return jax.jit(jax.vmap(dec.run))(v)


@pytest.mark.parametrize("beam,batch,max_len,n_img_block,n_streams",
                         [(5, 5, 6, 2, 1),   # padding: 5 imgs in 2-blocks
                          (20, 3, 8, 3, 1),  # the reference beam width
                          (5, 4, 4, 4, 2),   # two interleaved streams
                          (5, 4, 4, 4, 1)])
def test_switched_mega_matches_device_beam(beam, batch, max_len,
                                           n_img_block, n_streams):
    conf, params = _setup_switched()
    rng = np.random.default_rng(7)
    v = jnp.asarray(rng.standard_normal((batch, conf["visual_size"])),
                    jnp.float32)
    want_sc, want_seq, want_len, want_att = _switched_want(
        conf, params, v, beam, max_len)

    got_sc, got_seq, got_len, got_att = mega_senticap_switched_decode(
        params, v, batch, beam_size=beam, max_len=max_len,
        n_img_block=n_img_block, n_streams=n_streams, interpret=True)

    for i in range(batch):
        n = int(want_len[i])
        assert int(got_len[i]) == n, f"img {i} length"
        assert (np.asarray(got_seq[i][:n]).tolist()
                == np.asarray(want_seq[i][:n]).tolist()), f"img {i} tokens"
        np.testing.assert_allclose(float(got_sc[i]), float(want_sc[i]),
                                   rtol=1e-6)
        # trace: the XLA beam emits exp(log(att)) (a 1-ulp roundtrip of the
        # gate the kernel computes directly) -> allclose, not exact
        np.testing.assert_allclose(np.asarray(got_att[i][:n]),
                                   np.asarray(want_att[i][:n]),
                                   rtol=2e-6, atol=2e-7,
                                   err_msg=f"img {i} att trace")


def test_switched_mega_matches_host_oracle():
    """Against the host loop with attention recording
    (``decoder_beamsearch_with_attention``'s protocol)."""
    conf, params = _setup_switched(seed=3)
    rng = np.random.default_rng(11)
    v = rng.standard_normal((conf["visual_size"],)).astype(np.float32)

    make = make_beam_step(params, conf, switched=True)
    width = 2 * conf["lstm_hidden_size"]

    def host_step(words, use_v, h, c):
        b = np.asarray(words).shape[0]
        hh = jnp.zeros((b, width)) if h is None else h
        cc = jnp.zeros((b, width)) if c is None else c
        return make(1.0)(jnp.asarray(words), jnp.asarray(bool(use_v)),
                         jnp.asarray(hh), jnp.asarray(cc), jnp.asarray(v))

    want_sc, want_words, want_att = beam_decode(
        host_step, v, beam_size=20, max_len=10, with_attention=True)

    got_sc, got_seq, got_len, got_att = mega_senticap_switched_decode(
        params, jnp.asarray(v)[None, :], 1, beam_size=20, max_len=10,
        n_img_block=1, interpret=True)
    n = int(got_len[0])
    assert np.asarray(got_seq[0][:n]).tolist() == want_words
    np.testing.assert_allclose(float(got_sc[0]), want_sc, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(got_att[0][:n]),
                               np.asarray(want_att), rtol=2e-6, atol=2e-7)


def test_switched_mega_multi_tile_vocab():
    conf, params = _setup_switched(vocab=200, seed=5)
    rng = np.random.default_rng(13)
    batch = 3
    v = jnp.asarray(rng.standard_normal((batch, conf["visual_size"])),
                    jnp.float32)
    _, want_seq, want_len, want_att = _switched_want(conf, params, v, 6, 7)

    _, got_seq, got_len, got_att = mega_senticap_switched_decode(
        params, v, batch, beam_size=6, max_len=7, n_img_block=3,
        v_tile=128, interpret=True)
    for i in range(batch):
        n = int(want_len[i])
        assert int(got_len[i]) == n
        assert (np.asarray(got_seq[i][:n]).tolist()
                == np.asarray(want_seq[i][:n]).tolist())
        np.testing.assert_allclose(np.asarray(got_att[i][:n]),
                                   np.asarray(want_att[i][:n]),
                                   rtol=2e-6, atol=2e-7)


def test_switched_descriptive_equals_base_kernel():
    """senti = -1 decodes are EXACTLY the base model on the original weight
    view (mrnn_switched.py:860-884) — the base mega kernel covers the
    descriptive half of decode_split with no switched kernel run."""
    conf, params = _setup_switched(seed=9)
    rng = np.random.default_rng(17)
    batch = 3
    v = jnp.asarray(rng.standard_normal((batch, conf["visual_size"])),
                    jnp.float32)

    make = make_beam_step(params, conf, switched=True)
    dec = make_device_beam(make(-1.0), 2 * conf["lstm_hidden_size"],
                           beam_size=5, max_len=6)
    want_sc, want_seq, want_len, _ = jax.jit(jax.vmap(dec.run))(v)

    orig = {k: params[k] for k in ("wemb", "w_lstm", "w", "b", "wvm", "bmv")}
    got_sc, got_seq, got_len = mega_senticap_beam_decode(
        orig, v, batch, beam_size=5, max_len=6, n_img_block=3,
        interpret=True)
    for i in range(batch):
        n = int(want_len[i])
        assert int(got_len[i]) == n
        assert (np.asarray(got_seq[i][:n]).tolist()
                == np.asarray(want_seq[i][:n]).tolist())
        np.testing.assert_allclose(float(got_sc[i]), float(want_sc[i]),
                                   rtol=1e-6)
