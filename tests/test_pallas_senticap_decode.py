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
