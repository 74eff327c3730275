"""SentiCap encoder-decoder variant (reference ``mrnn_encode_decode.py``,
SURVEY C5; unused by the reference drivers but part of the family).

An encoder mRNN runs over a conditioning word sequence; its final hidden
state concatenates with the image feature to form the decoder's step-0
"visual" input (``mrnn_encode_decode.py:1017-1031``:
``v_i = concat([encoder_hh, v])``).  The decoder is the base mRNN with
``wvm`` widened to ``(H_enc + visual, E)``.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from icee_tpu.senticap.config import senticap_conf
from icee_tpu.senticap.model import (
    cell,
    forward as base_forward,
    init_params as init_base,
)


def encdec_conf(**overrides):
    conf = senticap_conf(DECODER=True)
    conf.update(overrides)
    return conf


def init_params(key: jax.Array, vocab_size: int, conf, dtype=jnp.float32
                ) -> dict:
    k_enc, k_dec = jax.random.split(key)
    enc = init_base(k_enc, vocab_size, conf, dtype=dtype)
    dec = init_base(k_dec, vocab_size, conf, dtype=dtype)
    h, vis, e = conf["lstm_hidden_size"], conf["visual_size"], conf["emb_size"]
    # decoder's pseudo-word projection consumes [encoder_h ; v]
    a = np.sqrt(6.0 / (h + vis + e))
    dec["wvm"] = jax.random.uniform(jax.random.fold_in(k_dec, 1),
                                    (h + vis, e), dtype, -a, a)
    return {"encoder": enc, "decoder": dec}


def encode(params: dict, conf: dict, encoder_words: jax.Array,
           v: jax.Array) -> jax.Array:
    """Run the encoder mRNN over the conditioning words -> final hidden
    (the reference's ``encoder.start_step``)."""
    enc = params["encoder"]
    b, t = encoder_words.shape
    emb = jnp.take(enc["wemb"], encoder_words, axis=0)
    vis = v @ enc["wvm"] + enc["bmv"]
    use_v = jnp.arange(t) == 0

    def body(carry, xs):
        h, c = carry
        emb_t, uv = xs
        x_t = jnp.where(uv, vis, emb_t)
        h, c = cell(enc, x_t, h, c, conf["GRAD_CLIP_SIZE"])
        return (h, c), None

    h0 = jnp.zeros((b, conf["lstm_hidden_size"]))
    (h, _), _ = jax.lax.scan(body, (h0, h0),
                             (jnp.swapaxes(emb, 0, 1), use_v))
    return h


def forward(params: dict, conf: dict, words: jax.Array,
            encoder_words: jax.Array, v: jax.Array) -> jax.Array:
    """Decoder teacher-forced scan conditioned on [encoder_h ; v]."""
    enc_h = encode(params, conf, encoder_words, v)
    cond = jnp.concatenate([enc_h, v], axis=-1)
    return base_forward(params["decoder"], conf, words, cond, use_visual=True,
                        x_drop=None, y_drop=None)


def loss(params: dict, conf: dict, words: jax.Array, y: jax.Array,
         mask: jax.Array, encoder_words: jax.Array, v: jax.Array
         ) -> jax.Array:
    from icee_tpu.senticap.model import loss_fn

    return loss_fn(forward(params, conf, words, encoder_words, v), y, mask)
