"""SentiCap adversarial style variant (reference ``mrnn_adv.py``, SURVEY C4;
unused by the reference drivers but part of the family).

Differences from the base mRNN:

- a learned style embedding table ``style (n_styles, style_len)``; the step-0
  visual pseudo-word becomes ``concat([v @ wvm, style[idx]]) + bmv``
  (``mrnn_adv.py:387-396``) with ``wvm`` mapping into ``emb - style_len``,
- adversarial losses (``:506-578``):
  * ``MSQ_LOSS``: a style->image regressor fed through GRADIENT REVERSAL
    (the generator is pushed to make style embeddings UNinformative of the
    image): ``msq = mean_B sum((grad_reverse(style) @ wsty_to_img + b
    - v @ stop_grad(wvm))^2)``, added with ``style_to_image_loss_factor``,
  * ``BATCH_IMAGE_LOSS``: an image->style classifier
    ``softmax(v @ wv_to_sty + b)`` with summed CE against the style index.

``grad_reverse`` / ``grad_ignore`` reproduce the custom Theano ops
(``mrnn_util.py:99-123``) as ``jax.custom_vjp`` / ``stop_gradient``.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from icee_tpu.senticap.config import senticap_conf
from icee_tpu.senticap.model import cell, init_params as init_base


@jax.custom_vjp
def grad_reverse(x: jax.Array) -> jax.Array:
    return x


def _gr_fwd(x):
    return x, None


def _gr_bwd(_, g):
    return (-g,)


grad_reverse.defvjp(_gr_fwd, _gr_bwd)

grad_ignore = jax.lax.stop_gradient  # mrnn_util.GradIgnore


def adv_conf(**overrides):
    conf = senticap_conf(
        style_len=64,
        n_styles=2,
        MSQ_LOSS=True,
        BATCH_IMAGE_LOSS=False,
        style_to_image_loss_factor=0.01,
    )
    conf.update(overrides)
    return conf


def init_params(key: jax.Array, vocab_size: int, conf, dtype=jnp.float32
                ) -> dict:
    sl, e, vis = conf["style_len"], conf["emb_size"], conf["visual_size"]
    params = init_base(key, vocab_size, conf, dtype=dtype)
    ks = jax.random.split(jax.random.fold_in(key, 1), 4)

    def xav(k, shape):
        a = np.sqrt(6.0 / sum(shape))
        return jax.random.uniform(k, shape, dtype, -a, a)

    # wvm now maps into the non-style slice of the embedding
    params["wvm"] = xav(ks[0], (vis, e - sl))
    params["style"] = xav(ks[1], (conf["n_styles"], sl))
    params["wsty_to_img"] = xav(ks[2], (sl, e - sl))
    params["bsty_to_img"] = jnp.zeros((e - sl,), dtype)
    params["wv_to_sty"] = xav(ks[3], (vis, conf["n_styles"]))
    params["bv_to_sty"] = jnp.zeros((conf["n_styles"],), dtype)
    return params


def visual_style_embedding(params: dict, v: jax.Array, style_idx: jax.Array
                           ) -> jax.Array:
    """Step-0 input: [v @ wvm ; style[idx]] + bmv (``mrnn_adv.py:393-396``)."""
    sty = jnp.take(params["style"], style_idx, axis=0)
    return jnp.concatenate([v @ params["wvm"], sty], axis=-1) + params["bmv"]


def forward(params: dict, conf: dict, words: jax.Array, v: jax.Array,
            style_idx: jax.Array) -> jax.Array:
    """Teacher-forced scan -> word distributions (B, T, V)."""
    b, t = words.shape
    emb = jnp.take(params["wemb"], words, axis=0)
    vis = visual_style_embedding(params, v, style_idx)
    use_v = jnp.arange(t) == 0

    def body(carry, xs):
        h, c = carry
        emb_t, uv = xs
        x_t = jnp.where(uv, vis, emb_t)
        h, c = cell(params, x_t, h, c, conf["GRAD_CLIP_SIZE"])
        s_t = jax.nn.softmax(h @ params["w"] + params["b"], axis=-1)
        return (h, c), s_t

    h0 = jnp.zeros((b, conf["lstm_hidden_size"]))
    (_, _), s = jax.lax.scan(body, (h0, h0),
                             (jnp.swapaxes(emb, 0, 1), use_v))
    return jnp.swapaxes(s, 0, 1)


def adversarial_loss(params: dict, conf: dict, v: jax.Array,
                     style_idx: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """-> (extra loss term, style-guess accuracy [BATCH_IMAGE_LOSS only])."""
    if conf.get("MSQ_LOSS"):
        styin = grad_reverse(jnp.take(params["style"], style_idx, axis=0))
        v_guess = styin @ params["wsty_to_img"] + params["bsty_to_img"]
        v_real = v @ grad_ignore(params["wvm"])
        msq = jnp.sum((v_guess - v_real) ** 2) / v.shape[0]
        return msq * conf["style_to_image_loss_factor"], jnp.asarray(0.0)
    if conf.get("BATCH_IMAGE_LOSS"):
        logits = v @ params["wv_to_sty"] + params["bv_to_sty"]
        logp = jax.nn.log_softmax(logits, axis=-1)
        ce = -jnp.sum(jnp.take_along_axis(logp, style_idx[:, None], axis=1))
        acc = jnp.mean(jnp.argmax(logits, axis=-1) == style_idx)
        return ce, acc
    return jnp.asarray(0.0), jnp.asarray(0.0)


def total_loss(params: dict, conf: dict, words: jax.Array, y: jax.Array,
               mask: jax.Array, v: jax.Array, style_idx: jax.Array
               ) -> jax.Array:
    """Masked-sum CE + the adversarial term (``mrnn_adv.py:560-578``)."""
    from icee_tpu.senticap.model import loss_fn

    s = forward(params, conf, words, v, style_idx)
    extra, _ = adversarial_loss(params, conf, v, style_idx)
    return loss_fn(s, y, mask) + extra
