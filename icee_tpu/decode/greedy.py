"""Greedy decoding as a fixed-length ``lax.scan``.

Used by the standalone validator's sampling path (``stylenet/validate.py``)
and as the fast batched serving path; the reference's greedy loops live in
``seq2seq/model.py:100-122,193-217``.
"""

from __future__ import annotations

from typing import Callable, Tuple

import jax
import jax.numpy as jnp


def greedy_decode(
    embed_fn: Callable[[jax.Array], jax.Array],
    step_fn: Callable,
    init_state,
    first_input: jax.Array,
    max_steps: int,
) -> jax.Array:
    """Roll out argmax tokens.

    ``step_fn(x, state) -> (logits, state)``; ``first_input`` is the step-0
    input (image feature or start-token embedding).  Returns (B, max_steps)
    token ids.
    """

    def body(carry, _):
        state, x = carry
        logits, state = step_fn(x, state)
        tok = jnp.argmax(logits, axis=-1)
        return (state, embed_fn(tok)), tok

    (_, _), toks = jax.lax.scan(body, (init_state, first_input), None,
                                length=max_steps)
    return jnp.swapaxes(toks, 0, 1)
