"""SentiCap SGD solvers as optax transforms with the reference's exact math.

Parity target: ``mrnn_solver.py:11-51`` — RMSProp and Adadelta with fudge
factor 1e-8, applied to gradients that are first divided by the batch size
and clipped to +/-GRAD_CLIP_SIZE (``mrnn_switched.py:1122-1128``).

RMSProp: ``cache = decay*cache + (1-decay)*g^2; p -= lr * g / sqrt(cache+ff)``
Adadelta: ``gsq = rho*gsq + (1-rho)*g^2;
           d = -(sqrt(dsq+ff)/sqrt(gsq+ff)) * g;
           dsq = rho*dsq + (1-rho)*d^2; p += d``
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax

from icee_tpu.senticap.config import ADADELTA, RMSPROP

FF = 1e-8


class RMSPropState(NamedTuple):
    cache: optax.Updates


def rmsprop(learning_rate: float, decay: float) -> optax.GradientTransformation:
    def init(params):
        return RMSPropState(jax.tree_util.tree_map(jnp.zeros_like, params))

    def update(grads, state, params=None):
        cache = jax.tree_util.tree_map(
            lambda h, g: h * decay + (1.0 - decay) * g * g, state.cache, grads)
        updates = jax.tree_util.tree_map(
            lambda g, c: -(learning_rate * g) / jnp.sqrt(c + FF), grads, cache)
        return updates, RMSPropState(cache)

    return optax.GradientTransformation(init, update)


class AdadeltaState(NamedTuple):
    grad_sq: optax.Updates
    delta_sq: optax.Updates


def adadelta(rho: float) -> optax.GradientTransformation:
    def init(params):
        z = jax.tree_util.tree_map(jnp.zeros_like, params)
        return AdadeltaState(z, z)

    def update(grads, state, params=None):
        gsq = jax.tree_util.tree_map(
            lambda s, g: rho * s + (1 - rho) * g * g, state.grad_sq, grads)
        deltas = jax.tree_util.tree_map(
            lambda dsq, gs, g: -(jnp.sqrt(dsq + FF) / jnp.sqrt(gs + FF)) * g,
            state.delta_sq, gsq, grads)
        dsq = jax.tree_util.tree_map(
            lambda s, d: rho * s + (1 - rho) * d * d, state.delta_sq, deltas)
        return deltas, AdadeltaState(gsq, dsq)

    return optax.GradientTransformation(init, update)


def _scale_and_clip(batch_size: float, clip: float) -> optax.GradientTransformation:
    def init(params):
        return optax.EmptyState()

    def update(grads, state, params=None):
        g = jax.tree_util.tree_map(
            lambda x: jnp.clip(x / batch_size, -clip, clip), grads)
        return g, state

    return optax.GradientTransformation(init, update)


def make_solver(conf: dict, trainable_mask: Optional[dict] = None
                ) -> optax.GradientTransformation:
    """Full update pipeline: g/batch -> clip -> RMSProp/Adadelta, optionally
    restricted to a trainable subset (switch params for train_joint)."""
    pre = _scale_and_clip(float(conf["batch_size_val"]),
                          float(conf["GRAD_CLIP_SIZE"]))
    if conf["GRAD_METHOD"] == RMSPROP:
        inner = rmsprop(conf["learning_rate"], conf["decay"])
    elif conf["GRAD_METHOD"] == ADADELTA:
        inner = adadelta(conf["rho"])
    else:
        raise ValueError(f"unknown GRAD_METHOD {conf['GRAD_METHOD']}")
    tx = optax.chain(pre, inner)
    if trainable_mask is not None:
        labels = {k: ("train" if v else "freeze")
                  for k, v in trainable_mask.items()}
        tx = optax.multi_transform(
            {"train": tx, "freeze": optax.set_to_zero()}, labels)
    return tx
