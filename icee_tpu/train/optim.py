"""Optimizers with the reference's update semantics, as optax transforms.

Reference recipe (SURVEY.md T1-T6): Adam(lr, betas=(0.9, 0.999), eps=1e-8)
with an elementwise gradient clamp applied *before* the step
(``utils.py:51-60`` clamps ``param.grad`` in place), plus plateau-driven LR
decay x0.8 (``utils.py:114-124``, driven by ``train_multitask.py:183-190``).

Parameter groups become masked transforms:

- factual optimizer: decoder + encoder head (``train_multitask.py:163-166``),
- language optimizer: decoder only (``:165-167``),
- transfer fine-tune: style-S tensors + output head only
  (``train_transfer.py:94-115``) -> ``optax.masked`` over leaves,
- paper regime (T1): one Adam per emotion over that emotion's S slice only
  (``train.py:135-150``) -> a slice-mask transform zeroing other styles'
  rows of the stacked ``(num_styles, ...)`` tensors before Adam, so each
  per-style optimizer's moments exactly track its own S set.

LR decay-on-plateau mutates ``opt_state.hyperparams['learning_rate']``
host-side between jitted steps (``optax.inject_hyperparams``) — no recompile.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import optax

from icee_tpu.core.config import TrainConfig


def make_adam(
    learning_rate: float,
    tcfg: Optional[TrainConfig] = None,
    grad_clip: Optional[float] = None,
    param_mask=None,
) -> optax.GradientTransformation:
    """clip(grad_clip) -> Adam, optionally masked to a parameter subset.

    Returned transform is wrapped in ``inject_hyperparams`` so
    ``opt_state.hyperparams['learning_rate']`` is host-mutable (plateau decay).
    """
    tcfg = tcfg or TrainConfig()
    clip = tcfg.grad_clip if grad_clip is None else grad_clip

    def build(learning_rate):
        tx = optax.chain(
            optax.clip(clip),
            optax.adam(learning_rate, b1=tcfg.adam_b1, b2=tcfg.adam_b2,
                       eps=tcfg.adam_eps),
        )
        if param_mask is not None:
            # NOTE: optax.masked passes non-selected leaves' raw gradients
            # through unchanged — frozen params must get zero updates, so use
            # an explicit train/freeze split.
            labels = jax.tree_util.tree_map(
                lambda m: "train" if m else "freeze", param_mask
            )
            tx = optax.multi_transform(
                {"train": tx, "freeze": optax.set_to_zero()}, labels
            )
        return tx

    return optax.inject_hyperparams(build)(learning_rate=learning_rate)


def get_lr(opt_state) -> float:
    return float(opt_state.hyperparams["learning_rate"])


def decay_lr(opt_state, factor: float):
    """x``factor`` LR decay (``utils.py:114-124``); mutates the injected
    hyperparam in place and returns the new value."""
    new = opt_state.hyperparams["learning_rate"] * factor
    opt_state.hyperparams["learning_rate"] = new
    return float(new)


def style_slice_zero(style_id: int, style_leaf_names=("S_w", "S_b")):
    """Gradient pre-transform zeroing every style slice except ``style_id`` on
    the stacked ``(num_styles, ...)`` leaves — the paper regime's per-emotion
    optimizers (``train.py:135-150``) on the stacked layout.

    Apply inside a chain BEFORE Adam so the other styles' moments stay
    exactly zero (separate-optimizer parity).
    """

    def init_fn(params):
        return optax.EmptyState()

    def update_fn(updates, state, params=None):
        def mask_leaf(path, u):
            name = path[-1].key if hasattr(path[-1], "key") else str(path[-1])
            if name in style_leaf_names:
                onehot = jnp.zeros((u.shape[0],) + (1,) * (u.ndim - 1),
                                   u.dtype).at[style_id].set(1.0)
                return u * onehot
            return u

        new_updates = jax.tree_util.tree_map_with_path(mask_leaf, updates)
        return new_updates, state

    return optax.GradientTransformation(init_fn, update_fn)


def make_style_adam(
    learning_rate: float,
    style_id: int,
    tcfg: Optional[TrainConfig] = None,
    param_mask=None,
) -> optax.GradientTransformation:
    """Per-emotion Adam over one style's S slice (T1 regime)."""
    tcfg = tcfg or TrainConfig()

    def build(learning_rate):
        tx = optax.chain(
            style_slice_zero(style_id),
            optax.clip(tcfg.grad_clip),
            optax.adam(learning_rate, b1=tcfg.adam_b1, b2=tcfg.adam_b2,
                       eps=tcfg.adam_eps),
        )

        # the per-emotion optimizer covers ONLY that emotion's S matrices:
        # freeze every leaf that is not a style tensor
        def label(path, _):
            name = path[-1].key if hasattr(path[-1], "key") else str(path[-1])
            return "train" if name in ("S_w", "S_b") else "freeze"

        return optax.multi_transform(
            {"train": tx, "freeze": optax.set_to_zero()},
            lambda params: jax.tree_util.tree_map_with_path(label, params),
        )

    return optax.inject_hyperparams(build)(learning_rate=learning_rate)
